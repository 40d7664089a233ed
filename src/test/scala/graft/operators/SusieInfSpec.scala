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
