package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.GenomicOps

/** FinnGen + UKBB + MVP meta-analysis summary-statistics harmonisation
  * (reference: datasource/finngen_meta/summary_statistics.py:25-470).
  */
object FinnGenMeta {

  /** `.../​<phenotype>_meta_out.tsv.gz` → phenotype
    * (summary_statistics.py:32-63).
    */
  def extractStudyPhenotypeFromPath(filePath: Column): Column =
    regexp_replace(element_at(split(filePath, "/"), -1), "_meta_out.tsv.gz", "")

  /** Cohorts contributing to the meta-analysis for a row: a cohort is in
    * when its allele-frequency column is populated; MVP_HIS maps to the
    * admixed-American cohort label (summary_statistics.py:1108-1184).
    */
  def cohorts(): Column = {
    def entry(afCol: String, cohort: String, biobank: String) = struct(
      col(afCol).isNotNull.as("inCohort"),
      lit(cohort).as("cohort"),
      lit(biobank).as("biobank")
    )
    transform(
      filter(
        array(
          entry("MVP_EUR_af_alt", "MVP_EUR", "MVP"),
          entry("MVP_AFR_af_alt", "MVP_AFR", "MVP"),
          entry("MVP_HIS_af_alt", "MVP_AMR", "MVP"),
          entry("fg_af_alt", "FinnGen", "FinnGen"),
          entry("ukbb_af_alt", "UKBB", "UKBB")
        ),
        x => x.getField("inCohort")
      ),
      x => struct(x.getField("biobank").as("biobank"), x.getField("cohort").as("cohort"))
    )
  }

  /** Meta-analyzed = seen in at least two distinct biobanks
    * (summary_statistics.py:1186-1227).
    */
  def isMetaAnalyzedVariant(cohorts: Column): Column =
    size(array_distinct(transform(cohorts, x => x.getField("biobank")))) >= 2

  /** Sample-size-weighted allele frequency across cohorts; cohorts missing
    * either the frequency or the sample size are excluded, empty
    * intersection → null (summary_statistics.py:779-860).
    */
  def combinedAlleleFrequency(alleleFreq: Column, nSamplesPerCohort: Column): Column = {
    val afF = filter(alleleFreq, x => x.getField("alleleFrequency").isNotNull)
    val nF = filter(nSamplesPerCohort, x => x.getField("nSamples").isNotNull)
    val nMap = map_from_entries(
      transform(nF, x => struct(x.getField("cohort"), x.getField("nSamples"))))
    val common = filter(afF, x => element_at(nMap, x.getField("cohort")).isNotNull)
    val num = aggregate(
      common,
      lit(0.0),
      (acc, x) =>
        acc + x.getField("alleleFrequency") *
          coalesce(element_at(nMap, x.getField("cohort")).cast("double"), lit(0.0)))
    val den = aggregate(
      common,
      lit(0.0),
      (acc, x) => acc + coalesce(element_at(nMap, x.getField("cohort")).cast("double"), lit(0.0)))
    when(den > 0, num / den)
  }

  /** Core column harmonisation of the raw meta-analysis frame
    * (summary_statistics.py:404-470): chromosome normalisation, variant id
    * assembly, inverse-variance meta statistics, presence filters, and the
    * ≥2-biobank meta filter.
    */
  def harmoniseCore(raw: DataFrame, metaAnalysisFilter: Boolean = true): DataFrame = {
    var df = raw
      .withColumn("chromosome", GenomicOps.normalizeChromosome(col("#CHR").cast(StringType)))
      .withColumn("position", col("POS").cast(IntegerType))
      .withColumn("neglogpval", col("all_inv_var_meta_mlogp").cast("double"))
      .withColumn("beta", col("all_inv_var_meta_beta").cast("double"))
      .withColumn("standardError", col("all_inv_var_meta_sebeta").cast("double"))
      .withColumn(
        "variantId",
        concat_ws("_", col("chromosome"), col("position"), col("REF"), col("ALT")))
      .filter(col("neglogpval").isNotNull)
      .filter(col("beta").isNotNull)
      .filter(col("standardError").isNotNull)
    if (metaAnalysisFilter) {
      df = df
        .withColumn("cohorts", cohorts())
        .withColumn("isMetaAnalyzedVariant", isMetaAnalyzedVariant(col("cohorts")))
        .filter(col("isMetaAnalyzedVariant"))
        .drop("isMetaAnalyzedVariant", "cohorts")
    }
    df
  }
}
