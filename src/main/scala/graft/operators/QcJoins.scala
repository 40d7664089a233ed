package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.core.GDataset
import graft.functions.{ArrayOps, DfOps, Stats}

/** QC / annotation joins over credible sets: trans-QTL flagging, SuSiE
  * redundancy, credible-set quality filtering, index merging, per-gene
  * colocalisation maxima, L2G distance features
  * (reference: dataset/study_locus.py:710-801, :1242-1319;
  * method/susie_inf.py:471-533; dataset/variant_index.py:127-206;
  * dataset/colocalisation.py:37-129; dataset/l2g_features/distance.py:21-81).
  */
object QcJoins {

  /** Flag QTL credible sets whose tags lie on a different chromosome than the
    * measured gene or beyond `transThreshold` of its TSS; GWAS sets stay
    * null (dataset/study_locus.py:710-801). Three-way join: credset tags ×
    * QTL studies × gene locations, rolled up per credible set with bool_or.
    */
  def flagTransQtls(
      credset: DataFrame,
      studyIndex: DataFrame,
      targetIndex: DataFrame,
      transThreshold: Long = 5000000
  ): DataFrame = {
    val qtlStudies = studyIndex
      .filter(col("studyType") =!= "gwas")
      .select("studyId", "geneId")
    val tags = credset
      .select(col("studyLocusId"), col("studyId"), explode(col("locus")).as("tag"))
      .select(
        col("studyLocusId"), col("studyId"),
        split(col("tag.variantId"), "_").getItem(0).as("tagChromosome"),
        split(col("tag.variantId"), "_").getItem(1).cast("long").as("tagPosition")
      )
    val targets = targetIndex.select(
      col("id").as("geneId"), col("tss"), col("geneChromosome"))
    val flags = tags
      .join(qtlStudies, Seq("studyId"), "inner")
      .join(broadcast(targets), Seq("geneId"), "inner")
      .withColumn(
        "isTagTrans",
        col("tagChromosome") =!= col("geneChromosome") ||
          abs(col("tss") - col("tagPosition")) > transThreshold
      )
      .groupBy("studyLocusId")
      .agg(max(col("isTagTrans")).as("isTransQtl"))
    credset.drop("isTransQtl").join(flags, Seq("studyLocusId"), "left")
  }

  /** Flag non-SuSiE credible sets overlapping a SuSiE locus region in any tag
    * (interval join on study + chromosome with a range residual;
    * dataset/study_locus.py:1242-1319).
    */
  def qcExplainedBySusie(studyLocus: DataFrame): DataFrame = {
    val susieMethods = Seq("SuSie", "SuSiE-inf")
    val susieRegions = studyLocus
      .filter(col("finemappingMethod").isin(susieMethods: _*))
      .select("studyId", "chromosome", "locusStart", "locusEnd")
      .distinct()
    val redundant = studyLocus
      .filter(!col("finemappingMethod").isin(susieMethods: _*))
      .select(
        col("studyLocusId"), col("studyId"), col("chromosome"),
        explode(col("locus")).as("l"))
      .select(
        col("studyLocusId"), col("studyId"), col("chromosome"),
        split(col("l.variantId"), "_").getItem(1).cast("long").as("tagPosition"))
      .alias("sl")
      .join(
        susieRegions.alias("r"),
        col("sl.studyId") === col("r.studyId") &&
          col("sl.chromosome") === col("r.chromosome") &&
          col("sl.tagPosition") >= col("r.locusStart") &&
          col("sl.tagPosition") <= col("r.locusEnd"),
        "inner"
      )
      .select(col("studyLocusId"))
      .distinct()
      .withColumn("_redundant", lit(true))
    val qc = if (studyLocus.columns.contains("qualityControls"))
      col("qualityControls") else lit(null).cast("array<string>")
    studyLocus
      .join(redundant, Seq("studyLocusId"), "left")
      .withColumn(
        "qualityControls",
        GDataset.updateQualityFlag(
          qc, col("_redundant").isNotNull, "Explained by a SuSiE credible set")
      )
      .drop("_redundant")
  }

  /** Credible-set quality filter: keep sufficiently significant, pure,
    * deduplicated sets (method/susie_inf.py:471-533). Dedup keeps the top
    * credibleSetlog10BF per (studyId, variantId) with a deterministic id
    * tiebreak.
    */
  def credibleSetQcFilter(
      credset: DataFrame,
      pValueCutoff: Double = 1e-5,
      purityMinR2: Double = 0.25
  ): DataFrame = {
    val w = Window
      .partitionBy("studyId", "variantId")
      .orderBy(col("credibleSetlog10BF").desc, col("studyLocusId").asc)
    credset
      .filter(
        Stats.pvalueFilterCondition(col("pValueMantissa"), col("pValueExponent"), pValueCutoff))
      .filter(col("purityMinR2") >= purityMinR2)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Schema-aware full-outer index merge: scalar columns coalesce left-first,
    * array columns take the null-safe union
    * (dataset/variant_index.py:127-206, biosample_index.py:36).
    */
  def mergeIndices(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      arrayCols: Seq[String]
  ): DataFrame = {
    val shared = left.columns.toSet
      .intersect(right.columns.toSet)
      .diff(keyCols.toSet)
    val l = shared.foldLeft(left)((df, c) => df.withColumnRenamed(c, s"_l_$c"))
    val r = shared.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"_r_$c"))
    val merged = l.join(r, keyCols, "outer")
    shared.foldLeft(merged) { (df, c) =>
      val value =
        if (arrayCols.contains(c)) ArrayOps.safeArrayUnion(col(s"_l_$c"), col(s"_r_$c"))
        else coalesce(col(s"_l_$c"), col(s"_r_$c"))
      df.withColumn(c, value).drop(s"_l_$c", s"_r_$c")
    }
  }

  /** Keep the strongest colocalisation per (credible set, gene)
    * (dataset/colocalisation.py:37-129): top-1 by the method metric with a
    * deterministic tiebreak.
    */
  def colocMaxPerGene(colocWithGene: DataFrame, metric: String = "clpp"): DataFrame =
    DfOps.getTopRankedInWindow(
      colocWithGene,
      Window.partitionBy(col("leftStudyLocusId"), col("geneId"))
        .orderBy(col(metric).desc, col("rightStudyLocusId").asc)
    )

  /** L2G distance feature: posterior-weighted mean distance of credible-set
    * tags to each gene's TSS, normalised by the locus neighbourhood maximum
    * (dataset/l2g_features/distance.py:21-127).
    */
  def distanceFeatures(
      credsetTags: DataFrame,
      geneTss: DataFrame,
      maxDistance: Long = 500000
  ): DataFrame = {
    // ONE exchange serves the whole chain (guide-§2.4 shared-partitioning
    // shape): repartition the TAGS by studyLocusId before the broadcast
    // gene join — the join preserves the partitioning, the (studyLocusId,
    // geneId) aggregation is satisfied by the studyLocusId subset
    // clustering (requireAllClusterKeysForDistribution=false, the
    // default), and the neighbourhood window partitions by studyLocusId
    // exactly. The former shape shuffled the gene-expanded aggregation
    // partials AND re-shuffled the aggregate for the window — both wider
    // streams than the un-expanded tag table this ships once.
    val scored = credsetTags
      .repartition(col("studyLocusId"))
      .join(broadcast(geneTss), Seq("chromosome"), "inner")
      .withColumn("distance", abs(col("tss") - col("tagPosition")))
      .filter(col("distance") <= maxDistance)
      .withColumn("score", (lit(maxDistance) - col("distance")) / lit(maxDistance.toDouble))
      .groupBy("studyLocusId", "geneId")
      .agg(
        (sum(col("score") * col("pp")) / sum(col("pp"))).as("distanceTssMean")
      )
    scored.withColumn(
      "distanceTssMeanNeighbourhood",
      col("distanceTssMean") /
        DfOps.neighbourhoodMax(col("distanceTssMean"), Seq(col("studyLocusId")))
    )
  }
}
