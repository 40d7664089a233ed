package graft.operators

import breeze.linalg.{DenseMatrix, DenseVector}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Distributed fine-mapping orchestration.
  *
  * The reference processes ONE locus per job submission
  * (susie_finemapper.py:38-165: manifest row → toPandas → numpy). Here loci
  * fan out across the cluster: sumstats and long-form LD co-shuffle on
  * studyLocusId, each group builds its local z vector + LD matrix and runs
  * the Breeze kernel inside `flatMapGroups`. Memory per task is bounded by
  * the locus size cap (reference default 500 variants → ~2 MB LD).
  */
object FineMapper {

  /** Fine-map every locus:
    *
    * @param sumstats rows (studyLocusId, variantId, z)
    * @param ldLong   long-form LD (studyLocusId, vi, vj, r) — PairwiseLD
    *                 shape, both triangle orders or one (mirrored here)
    * @return one row per credible variant: (studyLocusId, variantId, pip, lbf)
    */
  /** Fine-map every locus, with the reference's credible-set post-QC
    * (susie_finemapper.py:193-470) applied locus-locally inside the same
    * group task — no extra shuffles, no driver round trips:
    *
    *   - effects ordered by descending credible-set logBF; the first is
    *     always kept, later ones must clear `csLbfThr` (nat log)
    *   - within-set purity (mean / min r² over the set's LD block), with
    *     optional thresholds
    *   - duplicate-lead dedup (first credible set wins)
    *   - greedy removal of sets whose leads sit in high LD (r² ≥ ldMinR2)
    *     with an already-accepted lead, walked in set order (the reference
    *     walks by lead p-value; documented deterministic deviation — lbf
    *     order is available locus-locally without the p-value join)
    */
  def finemapLoci(
      spark: SparkSession,
      sumstats: DataFrame,
      ldLong: DataFrame,
      maxVariants: Int = 500,
      n: Int = 100000,
      L: Int = 10,
      csLbfThr: Double = 2.0,
      purityMinR2Thr: Double = 0.0,
      purityMeanR2Thr: Double = 0.0,
      ldMinR2: Double = 0.9
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
          val res = SusieInf.susieInf(z, ld, n = n, L = L, estTausq = true)
          val credE = SusieInf.credInfWithEffects(res.pip, ld)
          // reference order_creds: by descending credible-set lbf; first is
          // always kept, later ones must clear the threshold
          val ordered = credE.sortBy { case (e, _) => -res.lbf(e) }
          val thresholded = ordered.zipWithIndex.collect {
            case ((e, set), idx) if idx == 0 || res.lbf(e) >= csLbfThr => (e, set)
          }
          // purity over the set's LD block
          val withPurity = thresholded.map { case (e, set) =>
            val r2s = for (a <- set; b <- set) yield ld(a, b) * ld(a, b)
            (e, set, r2s.sum / r2s.size, r2s.min)
          }.filter { case (_, _, mean, min) =>
            min >= purityMinR2Thr && mean >= purityMeanR2Thr
          }
          // lead per set: max PIP in the set's own effect column
          val withLead = withPurity.map { case (e, set, mean, min) =>
            val lead = set.maxBy(j => (res.pip(j, e), variants(j)))
            (e, set, mean, min, lead)
          }
          // duplicate-lead dedup, then greedy high-LD lead removal
          val seenLeads = scala.collection.mutable.Set.empty[Int]
          val deduped = withLead.filter { case (_, _, _, _, lead) => seenLeads.add(lead) }
          val accepted = scala.collection.mutable.ArrayBuffer.empty[Int]
          val kept = deduped.filter { case (_, _, _, _, lead) =>
            val clash = accepted.exists(a => ld(a, lead) * ld(a, lead) >= ldMinR2)
            if (!clash) accepted += lead
            !clash
          }
          kept.iterator.zipWithIndex.flatMap { case ((e, set, mean, min, lead), csIdx) =>
            set.iterator.map { j =>
              (locus, variants(j), csIdx + 1, res.pip(j, e),
                res.lbf(e) * 0.4342944819, mean, min, j == lead)
            }
          }
        }
      }
      .toDF(
        "studyLocusId", "variantId", "credibleSetIndex", "pip",
        "credibleSetlog10BF", "purityMeanR2", "purityMinR2", "isLead")
  }
}
