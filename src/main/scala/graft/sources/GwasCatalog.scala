package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import org.apache.spark.sql.DataFrame

import graft.functions.{GenomicOps, Stats}

/** GWAS-Catalog association TSV harmonisation — the core column transforms of
  * the reference's 1.3k-LoC pipeline
  * (reference: datasource/gwas_catalog/associations.py:1094-1186):
  * chromosome normalisation, risk-allele parsing, p-value splitting,
  * OR/CI → beta/standardError, EFO URI parsing.
  */
object GwasCatalog {

  /** Harmonise a raw association frame with GWAS-Catalog column names:
    * `CHR_ID`, `CHR_POS`, `STRONGEST SNP-RISK ALLELE`, `P-VALUE`,
    * `OR or BETA`, `95% CI (TEXT)`, `MAPPED_TRAIT_URI`, `STUDY ACCESSION`.
    */
  def harmoniseAssociations(raw: DataFrame): DataFrame = {
    val (mantissa, exponent) = Stats.splitPvalueColumn(col("P-VALUE"))
    // "rs123-A" → risk allele "A"
    val riskAllele = upper(trim(element_at(split(col("STRONGEST SNP-RISK ALLELE"), "-"), -1)))
    // CI text like "[0.88-0.94]" → bounds
    val ciLower = regexp_extract(col("95% CI (TEXT)"), "\\[([\\d.]+)-", 1).cast(DoubleType)
    val ciUpper = regexp_extract(col("95% CI (TEXT)"), "-([\\d.]+)\\]", 1).cast(DoubleType)
    val orOrBeta = col("OR or BETA").cast(DoubleType)
    // GWAS Catalog reports odds ratios ≥ 1 by convention; treat the value as
    // an OR when a CI is bracket-formatted, else as beta.
    val isOr = col("95% CI (TEXT)").rlike("^\\[")
    val (beta, se) = Stats.normaliseGwasStatistics(
      beta0 = when(!isOr, orOrBeta),
      oddsRatio = when(isOr, orOrBeta),
      standardError = lit(null).cast(DoubleType),
      ciUpper = when(isOr, ciUpper),
      ciLower = when(isOr, ciLower),
      mantissa = mantissa,
      exponent = exponent
    )
    raw.select(
      col("STUDY ACCESSION").as("studyId"),
      GenomicOps.normalizeChromosome(col("CHR_ID")),
      col("CHR_POS").cast(IntegerType).as("position"),
      riskAllele.as("riskAllele"),
      mantissa,
      exponent,
      beta,
      se,
      GenomicOps.parseEfos(col("MAPPED_TRAIT_URI")).as("efos")
    )
  }
}
