package graft.operators

import breeze.linalg.{DenseMatrix, DenseVector, eigSym}

/** RAISS summary-statistics imputation: estimate missing z-scores from LD
  * neighbours, µ = Σ_it Σ_tt⁻¹ z_t
  * (reference: method/sumstat_imputation.py:15-170).
  *
  * The pseudo-inverse uses a symmetric eigendecomposition with relative
  * eigenvalue cutoff `rtol` (the same semantics as scipy.linalg.pinv on a
  * symmetric matrix).
  */
object Raiss {

  final case class Imputation(
      mu: DenseVector[Double],
      variance: DenseVector[Double],
      ldScore: DenseVector[Double],
      imputationR2: DenseVector[Double]
  )

  /** Eigen-truncated pseudo-inverse of a symmetric matrix with the diagonal
    * forced to 1 + lamb (sumstat_imputation.py:151-170).
    */
  def invertSigT(sigT: DenseMatrix[Double], lamb: Double, rtol: Double): DenseMatrix[Double] = {
    val m = sigT.copy
    (0 until m.rows).foreach(i => m(i, i) = 1.0 + lamb)
    val es = eigSym(m)
    val maxEv = breeze.linalg.max(breeze.numerics.abs(es.eigenvalues))
    val inv = DenseMatrix.zeros[Double](m.rows, m.cols)
    var k = 0
    while (k < es.eigenvalues.length) {
      val ev = es.eigenvalues(k)
      if (math.abs(ev) > rtol * maxEv) {
        val v = es.eigenvectors(::, k)
        val w = 1.0 / ev
        var i = 0
        while (i < m.rows) {
          var j = 0
          while (j < m.cols) { inv(i, j) += w * v(i) * v(j); j += 1 }
          i += 1
        }
      }
      k += 1
    }
    inv
  }

  /** Impute z-scores for unknown variants.
    *
    * @param zKnown          z-scores of known variants (length t)
    * @param ldKnown         t×t LD among known variants
    * @param ldUnknownKnown  i×t LD of each unknown variant vs the knowns
    */
  def raissModel(
      zKnown: DenseVector[Double],
      ldKnown: DenseMatrix[Double],
      ldUnknownKnown: DenseMatrix[Double],
      lamb: Double = 0.01,
      rtol: Double = 0.01
  ): Imputation = {
    val sigTInv = invertSigT(ldKnown, lamb, rtol)
    val nUnknown = ldUnknownKnown.rows

    // var_i = (1 + lamb) - Σ_jk S_ij Sinv_jk S_ik  (the einsum i,jk,ki → i)
    val proj = ldUnknownKnown * sigTInv // i × t
    val variance = DenseVector.tabulate(nUnknown) { i =>
      var acc = 0.0
      var j = 0
      while (j < ldUnknownKnown.cols) { acc += proj(i, j) * ldUnknownKnown(i, j); j += 1 }
      (1.0 + lamb) - acc
    }
    val ldScore = DenseVector.tabulate(nUnknown) { i =>
      var acc = 0.0
      var j = 0
      while (j < ldUnknownKnown.cols) { acc += ldUnknownKnown(i, j) * ldUnknownKnown(i, j); j += 1 }
      acc
    }
    val muRaw = proj * zKnown

    // clamp variance to [0, 1+lamb] band before the R2 normalisation
    val varNorm = variance.map { v =>
      if (v < 0) 0.0 else if (v > 0.99999 + lamb) 1.0 else v
    }
    val r2 = varNorm.map(v => (1.0 + lamb) - v)
    val mu = DenseVector.tabulate(nUnknown)(i => muRaw(i) / math.sqrt(r2(i)))
    Imputation(mu, variance, ldScore, variance.map(v => 1.0 - v))
  }
}
