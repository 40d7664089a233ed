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
  def finemapLoci(
      spark: SparkSession,
      sumstats: DataFrame,
      ldLong: DataFrame,
      maxVariants: Int = 500,
      n: Int = 100000,
      L: Int = 10
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
          val cred = SusieInf.credInf(res.pip, ld)
          cred.iterator.zipWithIndex.flatMap { case (set, csIdx) =>
            set.iterator.map { j =>
              // PIP of the variant within its credible set's effect column
              val effectCol = (0 until res.pip.cols).maxBy(l => res.pip(j, l))
              (locus, variants(j), csIdx + 1, res.pip(j, effectCol), res.lbf(effectCol))
            }
          }
        }
      }
      .toDF("studyLocusId", "variantId", "credibleSetIndex", "pip", "credibleSetlog10BF")
  }
}
