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

  /** Collect all summary-statistics rows within ±`distance` of each clumped
    * lead into a `locus` array (dataset/study_locus.py:1018-1084).
    *
    * The lead table is broadcast — the sumstats side (the 100 TB side) is
    * never shuffled; the range predicate runs as a residual on the
    * (studyId, chromosome) equi join.
    */
  def annotateLocusStatistics(
      clumped: DataFrame,
      sumstats: DataFrame,
      collectLocusDistance: Long
  ): DataFrame = {
    val leads = broadcast(
      clumped.select("position", "chromosome", "studyId", "studyLocusId").alias("clumped"))
    val tagged = sumstats.alias("sumstat")
      .join(
        leads,
        col("sumstat.studyId") === col("clumped.studyId") &&
          col("sumstat.chromosome") === col("clumped.chromosome") &&
          col("sumstat.position") >= (col("clumped.position") - collectLocusDistance) &&
          col("sumstat.position") <= (col("clumped.position") + collectLocusDistance),
        "inner"
      )
      .select(
        col("clumped.studyLocusId").as("studyLocusId"),
        struct(
          col("sumstat.variantId").as("variantId"),
          col("sumstat.beta").as("beta"),
          col("sumstat.pValueMantissa").as("pValueMantissa"),
          col("sumstat.pValueExponent").as("pValueExponent"),
          col("sumstat.standardError").as("standardError")
        ).as("tag")
      )
    val locusDf = tagged.groupBy("studyLocusId").agg(collect_list(col("tag")).as("locus"))
    clumped.drop("locus").join(locusDf, Seq("studyLocusId"), "left")
  }

  /** Boundaries variant of the locus-statistics annotation: collect sumstats
    * between each lead's locusStart and locusEnd instead of a fixed ±distance
    * (dataset/study_locus.py:1342-1405). Same broadcast-range-join design.
    */
  def annotateLocusStatisticsBoundaries(
      clumped: DataFrame,
      sumstats: DataFrame
  ): DataFrame = {
    val leads = broadcast(
      clumped.select("locusStart", "locusEnd", "chromosome", "studyId", "studyLocusId")
        .alias("clumped"))
    val tagged = sumstats.alias("sumstat")
      .join(
        leads,
        col("sumstat.studyId") === col("clumped.studyId") &&
          col("sumstat.chromosome") === col("clumped.chromosome") &&
          col("sumstat.position") >= col("clumped.locusStart") &&
          col("sumstat.position") <= col("clumped.locusEnd"),
        "inner"
      )
      .select(
        col("clumped.studyLocusId").as("studyLocusId"),
        struct(
          col("sumstat.variantId").as("variantId"),
          col("sumstat.beta").as("beta"),
          col("sumstat.pValueMantissa").as("pValueMantissa"),
          col("sumstat.pValueExponent").as("pValueExponent"),
          col("sumstat.standardError").as("standardError")
        ).as("tag")
      )
    val locusDf = tagged.groupBy("studyLocusId").agg(collect_list(col("tag")).as("locus"))
    clumped.drop("locus").join(locusDf, Seq("studyLocusId"), "left")
  }

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
