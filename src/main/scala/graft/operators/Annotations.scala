package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.core.GDataset
import graft.functions.GenomicOps

/** Annotation joins: broadcast range joins, LD-clumping linkage, foreign-key
  * validation flags, study restriction, allele-orientation harmonisation
  * (reference: dataset/study_locus.py:1018-1084, method/clump.py:20-64,
  * dataset/study_locus.py:160-230, dataset/summary_statistics.py:178-207,
  * common/processing.py:365-476).
  */
object Annotations {

  /** Shared binned broadcast range-collect: join sumstats to broadcast
    * per-lead [lo, hi] windows and collect the in-range rows per lead.
    *
    * The leads are exploded to the position bins their window covers and
    * broadcast, and the join adds the bin to the (studyId, chromosome) hash
    * key — so each sumstats row is checked ONLY against the few leads
    * covering its own bin, not every lead on its chromosome. Without the
    * bin, the broadcast-hash residual scan is Θ(rows × leads-per-
    * chromosome): measured at 10× rows (round 12, q_locus_annotate) that
    * was 9.3e9 candidate checks for ~1e6 emitted tags, 26 s solo — ×12
    * super-linear; binned it is candidate≈output and linear. Each
    * (row, lead) pair meets in exactly one bin (the row's), so no dedup is
    * needed. The sumstats side (the 100 TB side) is still never shuffled.
    */
  private def collectTagsInWindows(
      clumped: DataFrame,
      sumstats: DataFrame,
      lo: Column,
      hi: Column,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val leads = broadcast(
      clumped.select(
        col("studyId").as("_l_studyId"),
        col("chromosome").as("_l_chromosome"),
        col("studyLocusId").as("_l_studyLocusId"),
        lo.as("_lo"),
        hi.as("_hi"))
        .withColumn(
          "_bin",
          explode(sequence(
            floor(col("_lo") / binWidth).cast("long"),
            floor(col("_hi") / binWidth).cast("long")))))
    val tagged = sumstats
      .join(
        leads,
        col("studyId") === col("_l_studyId") &&
          col("chromosome") === col("_l_chromosome") &&
          floor(col("position") / binWidth).cast("long") === col("_bin") &&
          col("position") >= col("_lo") && col("position") <= col("_hi"),
        "inner"
      )
      .select(
        col("_l_studyLocusId").as("studyLocusId"),
        struct(
          col("variantId"),
          col("beta"),
          col("pValueMantissa"),
          col("pValueExponent"),
          col("standardError")
        ).as("tag")
      )
    val locusDf = tagged.groupBy("studyLocusId").agg(collect_list(col("tag")).as("locus"))
    clumped.drop("locus").join(locusDf, Seq("studyLocusId"), "left")
  }

  /** Collect all summary-statistics rows within ±`distance` of each clumped
    * lead into a `locus` array (dataset/study_locus.py:1018-1084).
    *
    * The lead table is broadcast — the sumstats side (the 100 TB side) is
    * never shuffled; the bin key bounds the per-row residual scan (see
    * [[collectTagsInWindows]]). Bin width = the collect distance, so each
    * lead window covers ≤3 bins.
    */
  def annotateLocusStatistics(
      clumped: DataFrame,
      sumstats: DataFrame,
      collectLocusDistance: Long
  ): DataFrame =
    collectTagsInWindows(
      clumped,
      sumstats,
      lo = col("position") - collectLocusDistance,
      hi = col("position") + collectLocusDistance,
      binWidth = collectLocusDistance.max(1L))

  /** Boundaries variant of the locus-statistics annotation: collect sumstats
    * between each lead's locusStart and locusEnd instead of a fixed ±distance
    * (dataset/study_locus.py:1342-1405). Same binned broadcast design;
    * `binWidth` should be ≥ the typical locus span so the broadcast
    * explosion stays ≤2×.
    */
  def annotateLocusStatisticsBoundaries(
      clumped: DataFrame,
      sumstats: DataFrame,
      binWidth: Long = 100000L
  ): DataFrame =
    collectTagsInWindows(
      clumped,
      sumstats,
      lo = col("locusStart"),
      hi = col("locusEnd"),
      binWidth = binWidth)

  /** True when a lead variant is explained by a more significant lead in the
    * same (study, chromosome) whose variant appears among this lead's LD tags
    * (method/clump.py:20-64). Significance order is (exponent, mantissa)
    * with `variantId` appended so tie order is total (the reference is only
    * set-stable on ties).
    */
  def isLeadLinked(
      studyId: Column,
      chromosome: Column,
      variantId: Column,
      pValueExponent: Column,
      pValueMantissa: Column,
      ldSet: Column
  ): Column = {
    val windowspec = Window
      .partitionBy(studyId, chromosome)
      .orderBy(pValueExponent.asc, pValueMantissa.asc, variantId.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val moreSignificantLeads = collect_set(variantId).over(windowspec)
    val tagsInStudyLocus = array_distinct(
      array_union(array(variantId), transform(ldSet, x => x.getField("tagVariantId")))
    )
    when(
      variantId.isNotNull,
      size(array_intersect(moreSignificantLeads, tagsInStudyLocus)) > 1
    ).otherwise(lit(false))
  }

  /** Restrict to a set of studies with a left-semi join — never a driver-side
    * collect→isin round trip (scales to any study-list size; reference
    * collects, dataset/summary_statistics.py:178-207).
    */
  def limitToStudies(sumstats: DataFrame, studies: DataFrame, studyCol: String = "studyId"): DataFrame =
    sumstats.join(studies.select(studyCol).distinct(), Seq(studyCol), "semi")

  /** Flag rows whose foreign key has no match in the index: left join + QC
    * flag update (dataset/study_locus.py:160-230).
    */
  def flagMissingForeignKeys(
      df: DataFrame,
      fkCol: String,
      index: DataFrame,
      indexKeyCol: String,
      flagText: String,
      qcCol: String = "qualityControls"
  ): DataFrame = {
    val keys = broadcast(
      index.select(col(indexKeyCol).as(fkCol)).distinct().withColumn("_fk_present", lit(true)))
    val qc = if (df.columns.contains(qcCol)) col(qcCol) else lit(null).cast("array<string>")
    df.join(keys, Seq(fkCol), "left")
      .withColumn(qcCol, GDataset.updateQualityFlag(qc, col("_fk_present").isNull, flagText))
      .drop("_fk_present")
  }

  /** Expand a variant index into direct + flipped allele orientations so the
    * OR-condition harmonisation join becomes a single equi join
    * (common/processing.py:365-476). SNP flips use the reverse complement.
    */
  def expandAlleleOrientations(index: DataFrame): DataFrame = {
    val direct = index.withColumn("direction", lit("direct"))
    val flipped = index
      .withColumn("tmpRef", col("referenceAllele"))
      .withColumn("referenceAllele", GenomicOps.reverseComplement(col("alternateAllele")))
      .withColumn("alternateAllele", GenomicOps.reverseComplement(col("tmpRef")))
      .drop("tmpRef")
      .withColumn("direction", lit("flipped"))
    direct.unionByName(flipped)
  }

  /** Harmonise sumstats against a variant index in either orientation: equi
    * join on (chromosome, position, referenceAllele, alternateAllele) against
    * the pre-expanded LUT.
    */
  def harmoniseOrientation(sumstats: DataFrame, index: DataFrame): DataFrame =
    sumstats.join(
      expandAlleleOrientations(index),
      Seq("chromosome", "position", "referenceAllele", "alternateAllele"),
      "inner"
    )
}
