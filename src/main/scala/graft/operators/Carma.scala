package graft.operators

import breeze.linalg.{det, inv, DenseMatrix, DenseVector}
import breeze.numerics.lgamma

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CARMA spike-and-slab fine-mapping with outlier detection
  * (reference: method/carma.py:17-919, itself a port of the published CARMA
  * method). Shotgun stochastic search over causal configurations with
  * Bayes-factor-guided outlier removal.
  *
  * The search is stochastic; a fixed seed makes runs reproducible. Validated
  * against the reference fixtures by PIP correlation and recovered outliers
  * (the reference's own test criterion, tests/gentropy/method/test_carma.py).
  */
object Carma {

  final case class Model(margin: Double, config: String)
  final case class Result(pips: DenseVector[Double], models: Vector[Model], outliers: List[Int])

  /** log marginal likelihood of a configuration (carma.py:150-218). */
  def marginalLikelihood(
      indices: Array[Int], sigma: DenseMatrix[Double], z: DenseVector[Double], tau: Double
  ): Double = {
    val pS = indices.length
    val sigmaS = DenseMatrix.tabulate(pS, pS)((i, j) => sigma(indices(i), indices(j)))
    (0 until pS).foreach(i => sigmaS(i, i) += tau)
    val detS = det(sigmaS)
    val sigmaSInv = inv(sigmaS)
    val subZ = DenseVector(indices.map(z(_)))
    val zSz = subZ.t * (sigmaSInv * subZ)
    pS / 2.0 * math.log(tau) - 0.5 * math.log(detS) + zSz / 2.0
  }

  /** Eigen-truncated pseudo-inverse (symmetric), scipy pinv(rtol) semantics. */
  private def pinvSym(m: DenseMatrix[Double], rtol: Double): DenseMatrix[Double] = {
    val es = breeze.linalg.eigSym(m)
    val maxEv = breeze.linalg.max(breeze.numerics.abs(es.eigenvalues))
    val out = DenseMatrix.zeros[Double](m.rows, m.cols)
    var k = 0
    while (k < es.eigenvalues.length) {
      val ev = es.eigenvalues(k)
      if (math.abs(ev) > rtol * maxEv) {
        val v = es.eigenvectors(::, k)
        val w = 1.0 / ev
        var i = 0
        while (i < m.rows) {
          var j = 0
          while (j < m.cols) { out(i, j) += w * v(i) * v(j); j += 1 }
          i += 1
        }
      }
      k += 1
    }
    out
  }

  /** log likelihood of the outlier model (carma.py:220-267). */
  def outlierLikelihood(
      indices: Array[Int], sigma: DenseMatrix[Double], z: DenseVector[Double], tau: Double
  ): Double = {
    val pS = indices.length
    val sigmaS = DenseMatrix.tabulate(pS, pS)((i, j) => sigma(indices(i), indices(j)))
    val sigmaSI = sigmaS.copy
    (0 until pS).foreach(i => sigmaSI(i, i) += tau)
    val sigmaSIInv = pinvSym(sigmaSI, 1e-5)
    val sigmaSInv = pinvSym(sigmaS, 1e-5)
    val detS = math.abs(det(sigmaSInv))
    val detIS = math.abs(det(sigmaSIInv))
    val subZ = DenseVector(indices.map(z(_)))
    val zSz = subZ.t * (sigmaSInv * subZ)
    val zSzI = subZ.t * (sigmaSIInv * subZ)
    0.5 * (math.log(detS) + math.log(detIS)) - 0.5 * (zSz - zSzI)
  }

  /** log prior of a configuration string (carma.py:505-529). */
  def priorDist(config: String, lambdaVal: Double, p: Int): Double = {
    val dim = if (config.isEmpty) 0 else config.split(",").length
    dim * math.log(lambdaVal) + lgamma((p - dim + 1).toDouble) - lgamma((p + 1).toDouble)
  }

  private def configOf(indices: Array[Int]): String = indices.sorted.mkString(",")

  /** Neighbourhood model sets: remove-one / add-one / swap-one
    * (carma.py:269-421). Entry 0/2 are None (empty) in degenerate cases.
    */
  def setGamma(
      inputS: Array[Int], p: Int, conditionIndex: Array[Int]
  ): Array[Option[Array[Array[Int]]]] = {
    val s = inputS.diff(conditionIndex).sorted
    val base = (0 until p).toArray
    s.length match {
      case 0 =>
        val sSub = base.diff(if (conditionIndex.nonEmpty) conditionIndex else inputS)
        Array(None, Some(sSub.map(Array(_))), None)
      case 1 =>
        val sSub = base.diff(if (conditionIndex.nonEmpty) inputS else inputS)
        Array(
          None,
          Some(sSub.map(x => (s :+ x).sorted)),
          Some(sSub.map(Array(_)))
        )
      case _ =>
        val sSub = base.diff(inputS)
        val removeOne = s.combinations(s.length - 1).map(_.toArray).toArray
        val addOne = sSub.map(x => (s :+ x).sorted)
        val swap = removeOne.flatMap(row => sSub.map(x => (row :+ x).sorted))
        Array(Some(removeOne), Some(addOne), Some(swap))
    }
  }

  /** Posterior inclusion probabilities from the visited model space
    * (carma.py:532-589).
    */
  def pipFunc(models: Seq[Model], p: Int, numCausal: Int): DenseVector[Double] = {
    val usable = models.filter { m =>
      !m.margin.isInfinite && !m.margin.isNaN &&
        (m.config.isEmpty || m.config.split(",").length <= numCausal)
    }
    if (usable.isEmpty) return DenseVector.zeros[Double](p)
    val mx = usable.map(_.margin).max
    val weights = usable.map(m => math.exp(m.margin - mx))
    val total = weights.sum
    val result = DenseVector.zeros[Double](p)
    usable.zip(weights).foreach { case (m, w) =>
      if (m.config.nonEmpty) m.config.split(",").foreach(i => result(i.toInt) += w)
    }
    result / total
  }

  private def weightedChoice(rng: Random, weights: Array[Double]): Int = {
    val total = weights.sum
    var r = rng.nextDouble() * total
    var i = 0
    while (i < weights.length - 1 && r > weights(i)) { r -= weights(i); i += 1 }
    i
  }

  // scalastyle:off method.length cyclomatic.complexity
  /** Modified Monte-Carlo shotgun search (carma.py:591-919). */
  def mcsModified(
      z: DenseVector[Double],
      ld: DenseMatrix[Double],
      maxModelDim: Int = 10000,
      lambdaVal: Double = 1.0,
      numCausal: Int = 10,
      outlierSwitch: Boolean = true,
      inputConditionalS: List[Int] = Nil,
      tau: Double = 1.0 / 0.0025,
      epsilon: Double = 1e-3,
      innerAllIter: Int = 10,
      outlierBfIndex: Double = 1 / 3.2,
      rng: Random = new Random(2024)
  ): (Vector[Model], List[Int]) = {
    val p = z.length
    val nullMargin = priorDist("", lambdaVal, p)
    // config -> margin, kept sorted on demand
    val bMap = mutable.LinkedHashMap[String, Double]("" -> nullMargin)
    var conditionalS: List[Int] = inputConditionalS
    var s: List[Int] = inputConditionalS
    var storedBf = 0.0
    var resultModels: Vector[Model] = Vector(Model(nullMargin, ""))
    var outerDone = false

    def scoreSet(sets: Array[Option[Array[Array[Int]]]])
        : (Array[Array[Double]], Array[Array[String]]) = {
      val margins = Array.fill(3)(Array(nullMargin))
      val configs = Array.fill(3)(Array(""))
      for (i <- 0 until 3) sets(i).foreach { rows =>
        configs(i) = rows.map(configOf)
        margins(i) = rows.zip(configs(i)).map { case (row, cfg) =>
          marginalLikelihood(row, ld, z, tau) + priorDist(cfg, lambdaVal, p)
        }
      }
      (margins, configs)
    }

    var iter = 0
    while (iter < innerAllIter && !outerDone) {
      var j = 0
      while (j < 10) {
        var sets = setGamma(s.toArray, p, conditionalS.toArray)
        val workingS = s.toArray.diff(conditionalS).sorted
        var (margins, configs) = scoreSet(sets)

        // record visited models
        for (i <- 0 until 3; k <- margins(i).indices) {
          val cfg = configs(i)(k)
          if (!bMap.contains(cfg)) bMap(cfg) = margins(i)(k)
        }

        if (workingS.isEmpty) {
          val aa = margins(1)
          val mx = aa.max
          val shifted = aa.map(v => math.exp(v - mx))
          val minHalf = math.min(aa.length, p / 2)
          val ordered = shifted.zipWithIndex.sortBy(-_._1).take(minHalf)
          val chosenPos = weightedChoice(rng, ordered.map(_._1))
          val chosen = ordered(chosenPos)._2
          s = sets(1).get(chosen).toList
        } else {
          val starIndex = Array.fill(3)(0)
          val starMargin = Array.fill(3)(nullMargin)
          for (i <- 0 until 3) {
            val aa = margins(i)
            if (aa.length > 1) {
              val mx = aa.max
              val weights = aa.map(v => math.exp(v - mx))
              val chosen = weightedChoice(rng, weights)
              starIndex(i) = chosen
              starMargin(i) = aa(chosen)
            } else starMargin(i) = aa(0)
          }
          if (outlierSwitch) {
            for (i <- 1 until 3 if sets(i).isDefined) {
              var done = false
              while (!done) {
                val aa = margins(i)
                val mx = aa.max
                val weights = aa.map(v => math.exp(v - mx))
                val chosen = weightedChoice(rng, weights)
                starIndex(i) = chosen
                starMargin(i) = aa(chosen)
                val testS = sets(i).get(chosen)
                var testLogBf = 100.0
                if (testS.length > 1) {
                  val modiLdS0 = DenseMatrix.tabulate(testS.length, testS.length)(
                    (a, b) => ld(testS(a), testS(b)))
                  val xOpt = SusieInf.fminbound(
                    x => {
                      val temp = ld.copy
                      for (a <- testS.indices; b <- testS.indices) {
                        val v = x * modiLdS0(a, b) + (if (a == b) 1 - x else 0.0)
                        temp(testS(a), testS(b)) = v
                      }
                      -outlierLikelihood(testS, temp, z, tau)
                    },
                    0.0, 1.0
                  )
                  val modiSigma = ld.copy
                  for (a <- testS.indices; b <- testS.indices) {
                    val v = xOpt * modiLdS0(a, b) + (if (a == b) 1 - xOpt else 0.0)
                    modiSigma(testS(a), testS(b)) = v
                  }
                  testLogBf = -math.abs(
                    outlierLikelihood(testS, ld, z, tau) -
                      outlierLikelihood(testS, modiSigma, z, tau))
                }
                if (math.exp(testLogBf) < outlierBfIndex) {
                  // drop the offending model and record the outlier variant
                  val newRows = sets(i).get.patch(chosen, Nil, 1)
                  sets = sets.updated(i, if (newRows.isEmpty) None else Some(newRows))
                  margins = margins.updated(i, margins(i).patch(chosen, Nil, 1))
                  configs = configs.updated(i, configs(i).patch(chosen, Nil, 1))
                  conditionalS =
                    (conditionalS ++ testS.diff(workingS)).distinct.sorted
                  if (margins(i).isEmpty || sets(i).isEmpty) done = true
                } else done = true
              }
            }
          }
          if (workingS.length == numCausal) {
            // only remove-one or swap moves
            val cand = Array(0, 2)
            val mx = cand.map(starMargin(_)).max
            val weights = cand.map(i => math.exp(starMargin(i) - mx))
            val pick = cand(weightedChoice(rng, weights))
            s = sets(pick).map(_(starIndex(pick)).toList).getOrElse(s)
          } else {
            val mx = starMargin.max
            val weights = starMargin.map(v => math.exp(v - mx))
            val pick = weightedChoice(rng, weights)
            if (sets(pick).isDefined) s = sets(pick).get(starIndex(pick)).toList
            else {
              val cand = Array(1, 2).filter(sets(_).isDefined)
              if (cand.nonEmpty) {
                val w2 = cand.map(i => math.exp(starMargin(i) - mx))
                val pick2 = cand(weightedChoice(rng, w2))
                s = sets(pick2).get(starIndex(pick2)).toList
              }
            }
          }
        }
        s = (s ++ conditionalS.filterNot(s.contains)).distinct
        j += 1
      }

      // drop models containing conditional (outlier) variants from the result
      val outlierSet = conditionalS.map(_.toString).toSet
      val filtered = bMap.toVector
        .filterNot { case (cfg, _) =>
          cfg.nonEmpty && cfg.split(",").exists(outlierSet.contains)
        }
        .map { case (cfg, m) => Model(m, cfg) }
        .sortBy(-_.margin)
      resultModels = filtered.take(math.min(maxModelDim, filtered.length))

      val quarter = resultModels.take(math.max(1, resultModels.length / 4)).map(_.margin)
      val bfMean = quarter.sum / quarter.length
      if (math.abs(bfMean - storedBf) < epsilon) outerDone = true
      else storedBf = bfMean
      iter += 1
    }
    (resultModels, conditionalS)
  }
  // scalastyle:on method.length cyclomatic.complexity

  /** Full CARMA spike-and-slab analysis without EM (carma.py:57-148). */
  def spikeSlabNoEm(
      z: DenseVector[Double],
      ld: DenseMatrix[Double],
      lambdaVal: Double = 1.0,
      maxModelDim: Int = 200000,
      allIter: Int = 1,
      allInnerIter: Int = 10,
      epsilonThreshold: Double = 1e-5,
      numCausal: Int = 10,
      tau: Double = 0.04,
      outlierSwitch: Boolean = true,
      outlierBfIndex: Double = 1 / 3.2,
      seed: Long = 2024
  ): Result = {
    val p = z.length
    val epsilonList = epsilonThreshold * p
    val rng = new Random(seed)
    var (models, conditional) = mcsModified(
      z, ld, maxModelDim, lambdaVal, numCausal, outlierSwitch,
      Nil, tau, epsilonList, allInnerIter, outlierBfIndex, rng)
    var i = 0
    var done = false
    while (i < allIter && !done) {
      val quarter = models.take(math.max(1, models.length / 4)).map(_.margin)
      val prev = quarter.sum / quarter.length
      val (m2, c2) = mcsModified(
        z, ld, maxModelDim, lambdaVal, numCausal, outlierSwitch,
        conditional, tau, epsilonList, allInnerIter, outlierBfIndex, rng)
      models = m2
      conditional = c2
      val q2 = models.take(math.max(1, models.length / 4)).map(_.margin)
      if (math.abs(prev - q2.sum / q2.length) < epsilonList) done = true
      i += 1
    }
    Result(pipFunc(models, p, numCausal), models, conditional)
  }

  /** Distributed CARMA orchestration: loci fan out across the cluster on
    * the FineMapper.finemapLoci pattern — sumstats and long-form LD
    * co-shuffle once on studyLocusId, each group builds its local z vector
    * + LD matrix and runs the seeded shotgun search inside
    * `flatMapGroups`. Per-task memory is bounded by the locus-size cap
    * (the reference caps CARMA loci well below SuSiE's 500 — the swap
    * neighbourhood is O(|S|·p) configs per step, each a small-matrix
    * det/inv). The search is seeded per call, so output is a pure function
    * of the inputs — the property the pinned-golden oracle relies on.
    *
    * @param sumstats rows (studyLocusId, variantId, z)
    * @param ldLong   long-form LD (studyLocusId, vi, vj, r), either or
    *                 both triangle orders (mirrored here)
    * @return one row per variant: (studyLocusId, variantId, pip,
    *         isOutlier) — isOutlier marks variants CARMA's Bayes-factor
    *         test removed from the model space
    */
  def carmaLoci(
      spark: SparkSession,
      sumstats: DataFrame,
      ldLong: DataFrame,
      maxVariants: Int = 200,
      tau: Double = 0.04,
      numCausal: Int = 10,
      outlierSwitch: Boolean = true,
      seed: Long = 2024
  ): DataFrame = {
    import spark.implicits._
    val zRows = sumstats
      .select(col("studyLocusId"), col("variantId"), col("z").cast("double"))
      .as[(String, String, Double)]
      .map { case (locus, v, z) => (locus, ("z", v, v, z)) }
    val ldRows = ldLong
      .select(col("studyLocusId"), col("vi"), col("vj"), col("r").cast("double"))
      .as[(String, String, String, Double)]
      .map { case (locus, vi, vj, r) => (locus, ("ld", vi, vj, r)) }
    zRows
      .union(ldRows)
      .groupByKey(_._1)
      .flatMapGroups { (locus, rows) =>
        val zs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
        val lds = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
        rows.foreach {
          case (_, ("z", v, _, z)) => zs(v) = z
          case (_, (_, vi, vj, r)) => lds += ((vi, vj, r))
        }
        if (zs.isEmpty || zs.size > maxVariants) Iterator.empty
        else {
          val variants = zs.keys.toArray.sorted
          val index = variants.zipWithIndex.toMap
          val p = variants.length
          val z = DenseVector(variants.map(zs))
          val ld = DenseMatrix.eye[Double](p)
          lds.foreach { case (vi, vj, r) =>
            for (a <- index.get(vi); b <- index.get(vj)) { ld(a, b) = r; ld(b, a) = r }
          }
          val res = spikeSlabNoEm(
            z, ld, tau = tau, numCausal = numCausal,
            outlierSwitch = outlierSwitch, seed = seed)
          val outliers = res.outliers.toSet
          variants.iterator.zipWithIndex.map { case (v, j) =>
            (locus, v, res.pips(j), outliers.contains(j))
          }
        }
      }
      .toDF("studyLocusId", "variantId", "pip", "isOutlier")
  }
}
