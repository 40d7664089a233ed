package graft.harness

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.functions.Stats
import graft.sources.GwasCatalog

/** Oracle-checked queries for the source harmonisers: GWAS-Catalog strand /
  * palindromic-allele handling, effect-direction flipping and QC flagging
  * (reference: datasource/gwas_catalog/associations.py:393-924).
  */
object SourceQueries {
  import Tables._

  /** GWAS-Catalog-shaped synthetic associations from `part`: all 16 ref/alt
    * letter combinations (palindromes included), composite rows (k%17),
    * ambiguous "?" risk alleles (k%13), multi-value chromosomes (k%11),
    * missing locations (k%19, k%23), and a spread of CI texts and p-values.
    */
  private def synthAssociations(s: SparkSession, d: String): DataFrame = {
    val letters = array(lit("A"), lit("C"), lit("G"), lit("T"))
    val k = col("p_partkey")
    val ref = element_at(letters, (k % 4 + 1).cast(IntegerType))
    val alt = element_at(letters, ((k / 4) % 4 + 1).cast(IntegerType))
    val riskLetter = element_at(letters, ((k / 16) % 4 + 1).cast(IntegerType))
    val rsBase = concat(lit("rs"), k.cast(StringType), lit("-"))
    val risk = when(k % 17 === 0, concat(rsBase, riskLetter, lit("; rs9-A")))
      .when(k % 13 === 0, concat(rsBase, lit("?")))
      .otherwise(concat(rsBase, riskLetter))
    val ci = when(k % 3 === 0, lit("[0.08-0.12] unit increase"))
      .when(k % 3 === 1, lit("[0.88-0.94] unit decrease"))
      .otherwise(lit("[0.81-0.95]"))
    val chromosome = when(k % 19 === 0, lit(null).cast(StringType))
      .when(k % 11 === 0, lit("1;2"))
      .otherwise((k % 22 + 1).cast(StringType))
    val position = when(k % 23 === 0, lit(null).cast(IntegerType))
      .otherwise((k % 1000000).cast(IntegerType))
    part(s, d).select(
      k.as("assoc_id"),
      risk.as("STRONGEST SNP-RISK ALLELE"),
      ref.as("referenceAllele"),
      alt.as("alternateAllele"),
      (lit(0.1) + (k % 10) / lit(20.0)).as("OR or BETA"),
      ci.as("95% CI (TEXT)"),
      (lit(4.0) + (k % 30)).as("PVALUE_MLOG"),
      chromosome.as("chromosome"),
      position.as("position")
    )
  }

  /** Full harmonisation surface: direction-harmonised beta (strand-resolved,
    * palindromes nulled), orientation/concordance booleans, and the combined
    * QC flag rollup. standardError is excluded from the oracle (the chi²
    * inverse-survival SE path has no DuckDB equivalent; its exact values are
    * golden-tested in SourcesSpec from the reference doctests).
    */
  def gwasHarmonise(s: SparkSession, d: String): DataFrame = {
    val raw = synthAssociations(s, d)
    val h = GwasCatalog.harmoniseEffectToBeta(raw)
    val riskAllele = GwasCatalog.extractRiskAllele(col("STRONGEST SNP-RISK ALLELE"))
    val (mantissa, exponent) = Stats.pvalueFromNeglogpval(col("PVALUE_MLOG"))
    h.select(
      col("assoc_id"),
      round(col("beta"), 6).as("beta"),
      GwasCatalog.effectNeedsHarmonisation(riskAllele, col("referenceAllele")).as("needs_flip"),
      GwasCatalog.areAllelesPalindromic(col("referenceAllele"), col("alternateAllele"))
        .as("palindromic"),
      GwasCatalog.isConcordant(riskAllele, col("referenceAllele"), col("alternateAllele"))
        .as("concordant"),
      concat_ws(
        ";",
        GwasCatalog.qcAll(
          qc = array().cast("array<string>"),
          chromosome = col("chromosome"),
          position = col("position"),
          referenceAllele = col("referenceAllele"),
          alternateAllele = col("alternateAllele"),
          strongestSnpRiskAllele = col("STRONGEST SNP-RISK ALLELE"),
          pValueMantissa = mantissa,
          pValueExponent = exponent
        )
      ).as("qc_str")
    )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gwas_harmonise" -> (gwasHarmonise _)
  )

  // Shared SQL fragments mirroring the Spark-side generator and the
  // reference's harmonisation semantics.
  private val BaseSql =
    """base AS (SELECT p_partkey AS k,
      |    ['A','C','G','T'][CAST(p_partkey % 4 AS INTEGER) + 1] AS ref,
      |    ['A','C','G','T'][CAST((p_partkey // 4) % 4 AS INTEGER) + 1] AS alt,
      |    ['A','C','G','T'][CAST((p_partkey // 16) % 4 AS INTEGER) + 1] AS rl,
      |    0.1 + (p_partkey % 10) / 20.0 AS orbeta,
      |    CASE WHEN p_partkey % 3 = 0 THEN '[0.08-0.12] unit increase'
      |         WHEN p_partkey % 3 = 1 THEN '[0.88-0.94] unit decrease'
      |         ELSE '[0.81-0.95]' END AS ci,
      |    4.0 + (p_partkey % 30) AS mlog,
      |    CASE WHEN p_partkey % 19 = 0 THEN NULL
      |         WHEN p_partkey % 11 = 0 THEN '1;2'
      |         ELSE CAST(p_partkey % 22 + 1 AS VARCHAR) END AS chrom,
      |    CASE WHEN p_partkey % 23 = 0 THEN NULL
      |         ELSE CAST(p_partkey % 1000000 AS INTEGER) END AS pos
      |  FROM part),
      |assoc AS (SELECT *,
      |    CASE WHEN k % 17 = 0 THEN 'rs' || k || '-' || rl || '; rs9-A'
      |         WHEN k % 13 = 0 THEN 'rs' || k || '-?'
      |         ELSE 'rs' || k || '-' || rl END AS risk_raw
      |  FROM base),
      |flags AS (SELECT *,
      |    string_split(string_split(risk_raw, '; ')[1], '-')[2] AS risk,
      |    CASE WHEN regexp_matches(upper(ref), '[ACTG]+')
      |         THEN reverse(translate(upper(ref), 'ACTG', 'TGAC')) ELSE upper(ref) END AS ref_rc,
      |    CASE WHEN regexp_matches(upper(alt), '[ACTG]+')
      |         THEN reverse(translate(upper(alt), 'ACTG', 'TGAC')) ELSE upper(alt) END AS alt_rc
      |  FROM assoc),
      |harm AS (SELECT *,
      |    CASE WHEN regexp_matches(upper(risk), '[ACTG]+')
      |         THEN reverse(translate(upper(risk), 'ACTG', 'TGAC')) ELSE upper(risk) END AS risk_rc,
      |    (risk = ref OR risk = ref_rc) AS needs_flip,
      |    (ref = alt_rc) AS palindromic,
      |    (lower(ci) LIKE '%increase%' OR lower(ci) LIKE '%decrease%') AS is_beta
      |  FROM flags)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_gwas_harmonise" ->
      s"""WITH $BaseSql
         |SELECT k AS assoc_id,
         |  round(CASE
         |    WHEN palindromic THEN NULL
         |    WHEN is_beta THEN CASE
         |      WHEN (needs_flip AND ci LIKE '%increase%')
         |        OR (NOT needs_flip AND ci LIKE '%decrease%') THEN -orbeta
         |      ELSE orbeta END
         |    ELSE ln(CASE WHEN needs_flip THEN 1.0 / orbeta ELSE orbeta END)
         |  END, 6) AS beta,
         |  needs_flip,
         |  palindromic,
         |  (risk = ref OR risk = alt OR risk_rc = ref OR risk_rc = alt
         |    OR risk = '?' OR ref IS NULL) AS concordant,
         |  coalesce(array_to_string(list_sort(list_filter([
         |      CASE WHEN risk_raw LIKE '%;%' THEN 'Composite association' END,
         |      CASE WHEN -(log10(pow(10, ceil(mlog) - mlog)) - ceil(mlog)) < -log10(5e-8)
         |           THEN 'Subsignificant p-value' END,
         |      CASE WHEN pos IS NULL OR chrom IS NULL THEN 'Incomplete genomic mapping' END,
         |      CASE WHEN len(string_split(chrom, ';')) <> len(string_split(CAST(pos AS VARCHAR), ';'))
         |             OR len(string_split(chrom, ';')) <> len(string_split(risk_raw, ';'))
         |           THEN 'Variant inconsistency' END,
         |      CASE WHEN ref = alt_rc THEN 'Palindrome alleles - cannot harmonize' END
         |    ], f -> f IS NOT NULL)), ';'), '') AS qc_str
         |FROM harm""".stripMargin
  )
}
