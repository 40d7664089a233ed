package graft.datasets

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{GDataset, GDataset => GD}
import graft.functions.{GenomicOps, Stats}
import graft.operators.WindowBasedClumping

/** Per-variant GWAS single-point statistics — flat schema
  * (reference: dataset/summary_statistics.py:22-207).
  */
final case class SummaryStatistics(df: DataFrame) extends GDataset[SummaryStatistics] {
  override def schemaName: String = "summary_statistics"
  override protected def withDf(newDf: DataFrame): SummaryStatistics = copy(df = newDf)

  /** Two-term mantissa/exponent significance filter
    * (dataset/summary_statistics.py:38-58).
    */
  def pvalueFilter(pValue: Double): SummaryStatistics =
    filter(Stats.pvalueFilterCondition(col("pValueMantissa"), col("pValueExponent"), pValue))

  /** Basic quality filter: drop rows with missing beta/SE/p-value, zero beta,
    * non-positive SE, p ≥ 1, or infinite beta/SE
    * (dataset/summary_statistics.py:147-176).
    */
  def sanityFilter(): SummaryStatistics = {
    val cleaned = df
      .na.drop(Seq("beta", "standardError", "pValueMantissa", "pValueExponent"))
      .filter(col("beta") =!= 0.0 && col("standardError") > 0.0)
      .filter(
        col("pValueExponent") < 0 ||
          (col("pValueExponent") === 0 && col("pValueMantissa") < 1.0)
      )
    copy(df = cleaned).dropInfinityValues("beta", "standardError")
  }

  /** Drop variants inside a genomic region, e.g. the MHC
    * (dataset/summary_statistics.py:121-145).
    */
  def excludeRegion(region: GenomicOps.Region): SummaryStatistics =
    filter(!GenomicOps.inRegion(col("chromosome"), col("position"), region))

  /** Distance-based clumping → [[StudyLocus]]
    * (dataset/summary_statistics.py:60-88).
    */
  /** Locus-breaker clumping (dataset/summary_statistics.py:90-119). */
  def locusBreakerClumping(
      baselinePvalueCutoff: Double = 1e-5,
      distanceCutoff: Long = 250000,
      pvalueCutoff: Double = 5e-8,
      flankingDistance: Long = 100000
  ): StudyLocus =
    StudyLocus(
      graft.operators.LocusBreaker.locusBreaker(
        df, baselinePvalueCutoff, distanceCutoff, pvalueCutoff, flankingDistance))

  /** Keep rows of the given studies — left-semi join, never collect→isin
    * (dataset/summary_statistics.py:178-207).
    */
  def limitToStudies(studies: DataFrame): SummaryStatistics =
    withDf(graft.operators.Annotations.limitToStudies(df, studies))

  def windowBasedClumping(distance: Long = 500000): StudyLocus =
    StudyLocus(WindowBasedClumping.clump(df, distance))
}

object SummaryStatistics {
  /** Schema-enforced parquet load (dataset/dataset.py:167-220). */
  def fromParquet(spark: SparkSession, path: String): SummaryStatistics =
    SummaryStatistics(GD.readParquet(spark, "summary_statistics", path))
}
