package graft.operators

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

class RaissSpec extends AnyFunSuite {

  test("perfectly linked missing variant recovers the known z-score") {
    // one known variant, one unknown in perfect LD (r = 1)
    val z = DenseVector(5.0)
    val ldKnown = DenseMatrix((1.0))
    val ldUnknownKnown = DenseMatrix((1.0))
    val imp = Raiss.raissModel(z, ldKnown, ldUnknownKnown)
    // mu = r * z / (1+lamb) scaled by sqrt(R2); with r=1 the imputed z tracks
    // the known one closely
    assert(math.abs(imp.mu(0) - 5.0) < 0.15)
    assert(imp.variance(0) < 0.02)
    assert(imp.imputationR2(0) > 0.98)
  }

  test("unlinked missing variant gets ~zero with full variance") {
    val z = DenseVector(5.0, -3.0)
    val ldKnown = DenseMatrix((1.0, 0.1), (0.1, 1.0))
    val ldUnknownKnown = DenseMatrix((0.0, 0.0))
    val imp = Raiss.raissModel(z, ldKnown, ldUnknownKnown)
    assert(math.abs(imp.mu(0)) < 1e-9)
    assert(imp.variance(0) > 0.99)
    assert(imp.ldScore(0) === 0.0)
  }

  test("invertSigT is a valid pseudo-inverse on well-conditioned input") {
    val m = DenseMatrix((1.0, 0.3), (0.3, 1.0))
    val inv = Raiss.invertSigT(m, lamb = 0.01, rtol = 0.01)
    val reg = m.copy
    reg(0, 0) = 1.01; reg(1, 1) = 1.01
    val prod = reg * inv * reg
    (0 until 2).foreach(i => (0 until 2).foreach { j =>
      assert(math.abs(prod(i, j) - reg(i, j)) < 1e-9)
    })
  }
}
