package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.datasets.StudyLocus
import graft.functions.{DfOps, Stats}
import graft.operators.CredibleSets

/** FinnGen SuSiE fine-mapping ingestion: published per-variant SuSiE output
  * (`*.snp`) + credible-set summaries (`*.cred.summary.tsv`) → StudyLocus
  * credible sets (reference: datasource/finngen/finemapping.py:208-532
  * `from_finngen_susie_finemapping`).
  *
  * Key semantics (finemapping.py):
  *   - rows without an integer position or with `cs <= 0` are dropped
  *     (:297-301);
  *   - the per-credible-set posterior/logBF/beta are the `alpha{i}` /
  *     `lbf_variable{i}` / `mean{i}` column selected by `credibleSetIndex`
  *     (:336-410) — expressed here as one `try_element_at` over a column
  *     array instead of ten chained `when`s (same null-beyond-10 behaviour);
  *   - credible sets with `cs_log10bf <= log10(e^2)` are dropped unless they
  *     are the first set in the region (:433-448);
  *   - the lead variant is the maximum-posterior row per
  *     (studyId, region, credibleSetIndex) (:461-482);
  *   - `studyLocusId = md5(studyId, variantId, finemappingMethod)` (:522-527)
  *     and the locus gets 95%/99% credible-set flags (:532).
  *
  * Scale note: after the summary join, the lead pick and the locus collect
  * are ONE aggregate on the composite key (studyId, region,
  * credibleSetIndex) — min_by for the lead row, collect_list for the locus —
  * so the heavy per-variant parse is paid once and the only exchange is the
  * map-side-combinable aggregation shuffle.
  * Where the reference falls back to Hail for block-gzipped inputs
  * (finemapping.py:275-295), [[BgzfCodec]] lets this engine read `.bgz`
  * splittably in Spark directly.
  */
object FinnGenFinemapping {

  /** `np.log10(np.exp(2))` — the publication LBF threshold (finemapping.py:214). */
  val CredsetLbfThreshold: Double = 0.8685889638065036

  /** Raw `*.snp` schema (finemapping.py:33-102): everything a string except
    * the alpha/lbf doubles, exactly as published.
    */
  val rawSchema: StructType = {
    val head = Seq(
      "trait", "region", "v", "rsid", "chromosome", "position", "allele1",
      "allele2", "maf", "beta", "se", "p", "mean", "sd", "prob", "cs"
    ).map(StructField(_, StringType))
    val csSpecific = Seq(StructField("cs_specific_prob", DoubleType)) ++ Seq(
      "low_purity", "lead_r2", "mean_99", "sd_99", "prob_99", "cs_99",
      "cs_specific_prob_99", "low_purity_99", "lead_r2_99"
    ).map(StructField(_, StringType))
    val alphas = (1 to 10).map(i => StructField(s"alpha$i", DoubleType))
    val means = (1 to 10).map(i => StructField(s"mean$i", StringType))
    val sds = (1 to 10).map(i => StructField(s"sd$i", StringType))
    val lbfs = (1 to 10).map(i => StructField(s"lbf_variable$i", DoubleType))
    StructType(head ++ csSpecific ++ alphas ++ means ++ sds ++ lbfs)
  }

  /** `*.cred.summary.tsv` schema (finemapping.py:104-113). */
  val summarySchema: StructType = StructType(Seq(
    StructField("trait", StringType), StructField("region", StringType),
    StructField("cs", StringType), StructField("cs_log10bf", DoubleType),
    StructField("cs_avg_r2", DoubleType), StructField("cs_min_r2", DoubleType)
  ))

  /** Per-variant SuSiE rows → per-variant credible-set statistics
    * (finemapping.py:297-411): position/cs filters, study + variant ids,
    * p-value mantissa/exponent split, and the index-selected posterior,
    * logBF and posterior beta.
    */
  def processSnps(snps: DataFrame, releasePrefix: String): DataFrame = {
    // Published files carry 'NA'/malformed cells in the numeric columns; the
    // reference's non-ANSI casts null them out (finemapping.py:297-410).
    // Under Spark 4 ANSI a plain cast would instead fail the whole ingestion
    // on the first bad cell, so every data-column parse goes through
    // try_cast (the position/cs FILTERS above already do).
    // Two-stage projection (same JIT-limit fix as
    // GwasCatalog.fromHarmonizedSumstats): fused into one select, the
    // p-value split + 30 array-element casts + regex ids generated a
    // 12501-byte projection method — past the JVM's 8000-byte JIT limit,
    // so the parse ran as interpreted bytecode per row (round-18 codegen
    // sweep). Stage 1 parses the raw strings once into attributes (the
    // multi-referenced non-cheap `_p0` keeps CollapseProject from
    // re-merging the stages); stage 2 derives ids and the index-selected
    // statistics from those attributes.
    val parsed = snps
      .filter(expr("try_cast(position AS INT)").isNotNull)
      .filter(expr("try_cast(cs AS INT)") > 0)
      .select(
        col("trait"),
        col("region"),
        col("v"),
        col("cs").cast(IntegerType).as("credibleSetIndex"),
        col("chromosome").as("_rawChromosome"),
        col("position").cast(IntegerType).as("position"),
        col("allele1").cast(StringType).as("ref"),
        col("allele2").cast(StringType).as("alt"),
        when(expr("try_cast(p AS DOUBLE)").isNotNull, col("p")).as("_p0"),
        expr("try_cast(se AS DOUBLE)").as("standardError"),
        expr("try_cast(maf AS FLOAT)").as("effectAlleleFrequencyFromSource"),
        array((1 to 10).map(i => col(s"alpha$i").cast(DoubleType)): _*)
          .as("_alphas"),
        array((1 to 10).map(i => col(s"lbf_variable$i").cast(DoubleType)): _*)
          .as("_lbfs"),
        array((1 to 10).map(i => col(s"mean$i").cast(DoubleType)): _*)
          .as("_means")
      )
    val (mantissa, exponent) = Stats.splitPvalueColumn(col("_p0"))
    parsed
      .select(
        concat_ws("_", lit(releasePrefix), col("trait")).as("studyId"),
        col("region"),
        regexp_replace(col("v"), ":", "_").as("variantId"),
        col("credibleSetIndex"),
        regexp_replace(col("_rawChromosome"), "^chr", "").cast(StringType)
          .as("chromosome"),
        col("position"),
        col("ref"),
        col("alt"),
        mantissa,
        exponent,
        col("standardError"),
        col("effectAlleleFrequencyFromSource"),
        lit("SuSiE").as("finemappingMethod"),
        try_element_at(col("_alphas"), col("credibleSetIndex"))
          .as("posteriorProbability"),
        try_element_at(col("_lbfs"), col("credibleSetIndex")).as("logBF"),
        try_element_at(col("_means"), col("credibleSetIndex")).as("beta")
      )
  }

  /** Credible-set summaries → LBF-filtered per-set statistics
    * (finemapping.py:435-453): sets below the threshold are dropped unless
    * they are the region's first credible set.
    */
  def processSummaries(
      summaries: DataFrame,
      releasePrefix: String,
      credsetLbfThreshold: Double = CredsetLbfThreshold
  ): DataFrame =
    summaries
      .select(
        col("region"),
        col("trait"),
        col("cs").cast(IntegerType).as("credibleSetIndex"),
        col("cs_log10bf").cast(DoubleType).as("credibleSetlog10BF"),
        col("cs_avg_r2").cast(DoubleType).as("purityMeanR2"),
        col("cs_min_r2").cast(DoubleType).as("purityMinR2")
      )
      .filter(
        (col("credibleSetlog10BF") > credsetLbfThreshold) ||
          (col("credibleSetIndex") === 1))
      .withColumn(
        "studyId", concat_ws("_", lit(releasePrefix), col("trait")))

  /** Full transform: SNP rows × summary rows → StudyLocus credible sets with
    * lead-variant statistics, the collected locus, locus bounds from the
    * region string, studyLocusId, and 95/99% credible-set flags
    * (finemapping.py:455-532).
    */
  def credibleSets(
      snps: DataFrame,
      summaries: DataFrame,
      releasePrefix: String,
      credsetLbfThreshold: Double = CredsetLbfThreshold
  ): StudyLocus = {
    val key = Seq("studyId", "region", "credibleSetIndex")
    val joined = processSnps(snps, releasePrefix)
      .join(
        processSummaries(summaries, releasePrefix, credsetLbfThreshold)
          .drop("trait"),
        key,
        "inner")

    // One aggregate does both the lead pick (min_by under pip desc nulls-last,
    // variantId tiebreak) and the locus collect. The former two-branch plan —
    // a top-1 window and a collect groupBy, each recomputing processSnps +
    // the summary join, re-joined on the key afterwards — paid the heavy
    // p-value/typed parse TWICE plus a window sort plus a third join.
    // annotateCredibleSets re-sorts the locus internally, so collect order
    // is free.
    val leadCols = Seq(
      "variantId", "chromosome", "position", "beta",
      "pValueMantissa", "pValueExponent", "effectAlleleFrequencyFromSource",
      "standardError", "finemappingMethod",
      "credibleSetlog10BF", "purityMeanR2", "purityMinR2")
    // !isnan term: Spark orders NaN as the largest double (desc-window
    // semantics make a NaN pip the lead), but negate(NaN) = NaN would sort
    // LAST in this ascending min_by key — keep the two consistent.
    val leadKey = struct(
      col("posteriorProbability").isNull,
      !coalesce(isnan(col("posteriorProbability")), lit(false)),
      negate(col("posteriorProbability")),
      col("variantId"))
    val assembled = joined
      .groupBy(key.map(col): _*)
      .agg(
        min_by(struct(leadCols.map(col): _*), leadKey).as("_lead"),
        collect_list(
          struct(
            col("variantId").cast(StringType).as("variantId"),
            col("posteriorProbability").cast(DoubleType)
              .as("posteriorProbability"),
            col("logBF").cast(DoubleType).as("logBF"),
            col("pValueMantissa").cast(FloatType).as("pValueMantissa"),
            col("pValueExponent").cast(IntegerType).as("pValueExponent"),
            col("beta").cast(DoubleType).as("beta"),
            col("standardError").cast(DoubleType).as("standardError")
          )).as("locus"))
      .select(
        key.map(col) ++ leadCols.map(c => col(s"_lead.$c").as(c))
          :+ col("locus"): _*)
      .withColumn(
        "locusStart",
        split(split(col("region"), ":").getItem(1), "-").getItem(0).cast(IntegerType))
      .withColumn(
        "locusEnd",
        split(split(col("region"), ":").getItem(1), "-").getItem(1).cast(IntegerType))
      .withColumn(
        "studyLocusId",
        StudyLocus.assignStudyLocusId(
          Seq("studyId", "variantId", "finemappingMethod")))

    StudyLocus(CredibleSets.annotateCredibleSets(assembled))
  }

  /** IO wrapper: schema-declared tab-separated reads (plain or gzip — and,
    * unlike the reference's Hail fallback, `.bgz` via [[BgzfCodec]]) then
    * [[credibleSets]] (finemapping.py:275-295, 417-431).
    */
  def fromSusieFinemapping(
      spark: SparkSession,
      snpFiles: Seq[String],
      csSummaryFiles: Seq[String],
      releasePrefix: String,
      credsetLbfThreshold: Double = CredsetLbfThreshold
  ): StudyLocus = {
    def readTsv(schema: StructType, paths: Seq[String]): DataFrame =
      spark.read
        .schema(schema)
        .option("delimiter", "\t")
        .option("header", "true")
        .csv(paths: _*)
    credibleSets(
      readTsv(rawSchema, snpFiles),
      readTsv(summarySchema, csSummaryFiles),
      releasePrefix,
      credsetLbfThreshold)
  }
}
