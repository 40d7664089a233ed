package graft.operators

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

/** Validation against the reference fixtures with the reference's own
  * criteria (tests/gentropy/method/test_carma.py): PIPs correlate ≈ 1 with
  * the stored golden PIPs and variant 5 is recovered as the outlier.
  */
class CarmaSpec extends AnyFunSuite {

  private val fixtureDir = new java.io.File("/root/reference/tests/gentropy/data_samples")

  private def loadLd(): DenseMatrix[Double] = {
    val rows = scala.io.Source.fromFile(new java.io.File(fixtureDir, "01_test_ld.csv"))
      .getLines().map(_.split(",").map(_.toDouble)).toArray
    DenseMatrix.tabulate(rows.length, rows.head.length)((i, j) => rows(i)(j))
  }
  private def loadZ(): DenseVector[Double] =
    DenseVector(
      scala.io.Source.fromFile(new java.io.File(fixtureDir, "01_test_z.csv"))
        .getLines().drop(1).map(_.split(",")(1).toDouble).toArray)
  private def loadPips(): DenseVector[Double] =
    DenseVector(
      scala.io.Source.fromFile(new java.io.File(fixtureDir, "01_test_PIPs.txt"))
        .getLines().drop(1).map(_.trim.toDouble).toArray)

  private def corr(a: DenseVector[Double], b: DenseVector[Double]): Double = {
    val ma = breeze.stats.mean(a); val mb = breeze.stats.mean(b)
    val ca = a - ma; val cb = b - mb
    (ca.t * cb) / math.sqrt((ca.t * ca) * (cb.t * cb))
  }

  test("PIPs correlate with the reference fixture; outlier 5 recovered") {
    assume(fixtureDir.isDirectory, "reference fixtures not available")
    val res = Carma.spikeSlabNoEm(loadZ(), loadLd())
    assert(res.outliers === List(5), s"outliers were ${res.outliers}")
    val c = corr(res.pips, loadPips())
    assert(c > 0.98, s"PIP correlation $c")
  }

  test("prior and marginal-likelihood kernels match the reference doctests") {
    assert(math.abs(Carma.priorDist("1,2,3", 1.0, 4) - (-3.17805)) < 1e-5)
    val sigma = DenseMatrix((1.0, 0.5, 0.2), (0.5, 1.0, 0.3), (0.2, 0.3, 1.0))
    val z = DenseVector(10.0, 11.0, 10.0)
    // _ind_Normal_fixed_sigma_marginal_external doctest: indices (1,2) 1-based
    val got = Carma.marginalLikelihood(Array(0, 1), sigma, z, tau = 1.0)
    assert(math.abs(got - 43.60579) < 1e-5)
    val z2 = DenseVector(0.1, 0.2, 0.3)
    val got2 = Carma.outlierLikelihood(Array(0, 1, 2), sigma, z2, tau = 1.0 / 0.0025)
    assert(math.abs(got2 - (-8.8497)) < 1e-4)
  }
}
