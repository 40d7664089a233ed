// (UKBiobank GWAS study index lives in UkBiobank.scala alongside this
// pQTL reader.)
package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.DataFrame

/** UKB-PPP (EUR) pQTL readers
  * (reference: datasource/ukb_ppp_eur/study_index.py:14-78,
  * summary_stats.py:19-60).
  */
object UkbPpp {

  /** Per-study sample sizes peeked from the summary stats (chromosome 22
    * slice — any complete chromosome carries every study once).
    */
  def sampleSizes(sumstats: DataFrame): DataFrame =
    sumstats
      .filter(col("chromosome") === "22")
      .groupBy("studyId")
      .agg(first(col("N")).cast(IntegerType).as("nSamples"))

  /** Study index from the raw TSV-shaped frame joined with the peeked sample
    * sizes: constant pqtl/project metadata, European single-population
    * discovery structure, LD population shares.
    */
  def studyIndex(rawStudies: DataFrame, nSamples: DataFrame): DataFrame =
    rawStudies
      .select(
        lit("pqtl").as("studyType"),
        lit("UKB_PPP_EUR").as("projectId"),
        col("_gentropy_study_id").as("studyId"),
        col("UKBPPP_ProteinID").as("traitFromSource"),
        lit("UBERON_0001969").as("biosampleFromSourceId"),
        col("ensembl_id").as("geneId"),
        lit(true).as("hasSumstats"),
        col("_gentropy_summary_stats_link").as("summarystatsLocation")
      )
      .join(nSamples, Seq("studyId"))
      .withColumn(
        "discoverySamples",
        array(
          struct(
            col("nSamples").cast(IntegerType).as("sampleSize"),
            lit("European").as("ancestry"))))
      .withColumn(
        "ldPopulationStructure",
        StudyIndexOps.aggregateAndMapAncestries(col("discoverySamples")))

  /** Harmonise raw UKB-PPP summary stats through the shared core with the
    * UKB-PPP column layout.
    */
  def harmoniseSummaryStats(raw: DataFrame, variantAnnotation: DataFrame): DataFrame =
    SumstatsHarmoniser.harmonise(raw, variantAnnotation, SumstatsHarmoniser.UkbPppCols)
}
