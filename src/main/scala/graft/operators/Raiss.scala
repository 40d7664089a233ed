package graft.operators

import breeze.linalg.{DenseMatrix, DenseVector, eigSym}

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Distributed RAISS orchestration (FineMapper.finemapLoci pattern):
    * known z-scores, the unknown-variant list, and long-form LD co-shuffle
    * once on studyLocusId; each group assembles its local Σ_tt / Σ_it
    * blocks and runs the Breeze kernel inside `flatMapGroups`. The
    * reference imputes one chromosome batch per job submission
    * (sumstat_imputation.py driver loop); here loci are the unit of
    * parallelism and per-task memory is bounded by the locus-size cap.
    *
    * @param knowns   rows (studyLocusId, variantId, z) — typed variants
    * @param unknowns rows (studyLocusId, variantId) — variants to impute
    * @param ldLong   long-form LD (studyLocusId, vi, vj, r), either or
    *                 both triangle orders (mirrored; known-known and
    *                 unknown-known pairs both ride this table)
    * @return one row per unknown variant: (studyLocusId, variantId, mu,
    *         variance, ldScore, imputationR2)
    */
  def imputeLoci(
      spark: SparkSession,
      knowns: DataFrame,
      unknowns: DataFrame,
      ldLong: DataFrame,
      maxVariants: Int = 1000,
      lamb: Double = 0.01,
      rtol: Double = 0.01
  ): DataFrame = {
    import spark.implicits._
    val zRows = knowns
      .select(col("studyLocusId"), col("variantId"), col("z").cast("double"))
      .as[(String, String, Double)]
      .map { case (locus, v, z) => (locus, ("z", v, v, z)) }
    val uRows = unknowns
      .select(col("studyLocusId"), col("variantId"))
      .as[(String, String)]
      .map { case (locus, v) => (locus, ("u", v, v, 0.0)) }
    val ldRows = ldLong
      .select(col("studyLocusId"), col("vi"), col("vj"), col("r").cast("double"))
      .as[(String, String, String, Double)]
      .map { case (locus, vi, vj, r) => (locus, ("ld", vi, vj, r)) }
    zRows
      .union(uRows)
      .union(ldRows)
      .groupByKey(_._1)
      .flatMapGroups { (locus, rows) =>
        val zs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
        val us = scala.collection.mutable.LinkedHashSet.empty[String]
        val lds = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
        rows.foreach {
          case (_, ("z", v, _, z)) => zs(v) = z
          case (_, ("u", v, _, _)) => us += v
          case (_, (_, vi, vj, r)) => lds += ((vi, vj, r))
        }
        val unknownArr = us.diff(zs.keySet).toArray.sorted
        if (zs.isEmpty || unknownArr.isEmpty || zs.size + unknownArr.length > maxVariants)
          Iterator.empty
        else {
          val knownArr = zs.keys.toArray.sorted
          val kIdx = knownArr.zipWithIndex.toMap
          val uIdx = unknownArr.zipWithIndex.toMap
          val t = knownArr.length
          val zKnown = DenseVector(knownArr.map(zs))
          val ldKnown = DenseMatrix.eye[Double](t)
          val ldUK = DenseMatrix.zeros[Double](unknownArr.length, t)
          lds.foreach { case (vi, vj, r) =>
            for (a <- kIdx.get(vi); b <- kIdx.get(vj)) {
              ldKnown(a, b) = r; ldKnown(b, a) = r
            }
            for (a <- uIdx.get(vi); b <- kIdx.get(vj)) ldUK(a, b) = r
            for (a <- uIdx.get(vj); b <- kIdx.get(vi)) ldUK(a, b) = r
          }
          val imp = raissModel(zKnown, ldKnown, ldUK, lamb, rtol)
          unknownArr.iterator.zipWithIndex.map { case (v, i) =>
            (locus, v, imp.mu(i), imp.variance(i), imp.ldScore(i), imp.imputationR2(i))
          }
        }
      }
      .toDF("studyLocusId", "variantId", "mu", "variance", "ldScore", "imputationR2")
  }
}
