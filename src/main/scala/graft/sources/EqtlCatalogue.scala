package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** eQTL Catalogue SuSiE fine-mapping results reader
  * (reference: datasource/eqtl_catalogue/finemapping.py:60-327).
  */
object EqtlCatalogue {

  val rawCredibleSetSchema: StructType = StructType(Seq(
    StructField("molecular_trait_id", StringType), StructField("gene_id", StringType),
    StructField("cs_id", StringType), StructField("variant", StringType),
    StructField("rsid", StringType), StructField("cs_size", IntegerType),
    StructField("pip", DoubleType), StructField("pvalue", DoubleType),
    StructField("beta", DoubleType), StructField("se", DoubleType),
    StructField("z", DoubleType), StructField("cs_min_r2", DoubleType),
    StructField("region", StringType)
  ))

  /** Dataset id from the credible-set file path, e.g. `.../QTD000584.credible_sets.tsv`. */
  def extractDatasetId(fileName: Column): Column =
    regexp_extract(fileName, "([^/]+)\\.credible_sets\\.tsv", 1)

  /** Credible-set index from `cs_id` like `..._L1`. */
  def extractCredibleSetIndex(csId: Column): Column =
    regexp_extract(csId, "_L(\\d+)$", 1).cast(IntegerType)

  /** Read raw credible sets: declared schema, dataset id from the file name,
    * rsid-explosion duplicates collapsed.
    */
  def readCredibleSets(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(rawCredibleSetSchema)
      .option("sep", "\t")
      .option("header", "true")
      .csv(path)
      .withColumn("dataset_id", extractDatasetId(input_file_name()))
      .withColumn("credibleSetIndex", extractCredibleSetIndex(col("cs_id")))
      .drop("rsid")
      .distinct()

  /** Raw summary-statistics TSV schema — the eQTL Catalogue "all
    * variants" export format (datasource/eqtl_catalogue/summary_stats.py
    * reads these columns; full column list per the public eQTL Catalogue
    * data spec). Declared so malformed numerics become nulls under the
    * PERMISSIVE csv reader instead of ANSI cast failures.
    */
  val rawSummaryStatsSchema: StructType = StructType(Seq(
    StructField("molecular_trait_id", StringType),
    StructField("chromosome", StringType),
    StructField("position", IntegerType),
    StructField("ref", StringType),
    StructField("alt", StringType),
    StructField("variant", StringType),
    StructField("ma_samples", IntegerType),
    StructField("maf", DoubleType),
    StructField("pvalue", StringType),
    StructField("beta", DoubleType),
    StructField("se", DoubleType),
    StructField("type", StringType),
    StructField("ac", IntegerType),
    StructField("an", IntegerType),
    StructField("r2", DoubleType),
    StructField("molecular_trait_object_id", StringType),
    StructField("gene_id", StringType),
    StructField("median_tpm", DoubleType),
    StructField("rsid", StringType)
  ))

  /** Schema-enforced read of raw eQTL Catalogue summary-stats TSVs
    * (summary_stats.py:52-60 ingestion entry; gzip handled by codec
    * inference, splittable variants via the BGZF codec where used).
    */
  def readSummaryStats(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(rawSummaryStatsSchema)
      .option("sep", "\t")
      .option("header", "true")
      .csv(path)

  /** Full study ID from the source URI + gene: project id from the
    * `imported/<project>/...` path segment, QTL group from the
    * `<group>.tsv.gz` file name, suffixed with the gene
    * (summary_stats.py:24-47 `_full_study_id_regexp`), e.g.
    * `GTEx_V8_Adipose_Subcutaneous_ENSG00000225630`. Also accepts the
    * engine's splittable `.tsv.bgz` twin ([[BgzfCodec]]) so catalogues
    * recompressed block-gzip keep identical study ids.
    */
  def fullStudyId(uri: Column, geneId: Column): Column =
    concat(
      regexp_extract(uri, "imported/([^/]+)/.*", 1),
      lit("_"),
      regexp_extract(uri, "([^/]+)\\.tsv\\.b?gz", 1),
      lit("_"),
      geneId)

  /** Harmonise raw summary stats into the SummaryStatistics shape
    * (summary_stats.py:49-93 `from_source`): study id from the URI,
    * underscore-joined variant id, p-value split into mantissa/exponent,
    * typed effect columns; rows without a parseable position or with a
    * zero beta are dropped.
    *
    * `uri` defaults to `input_file_name()` so the projection rides the
    * scan with zero extra passes; tests may inject a literal.
    */
  def summaryStatsFromSource(raw: DataFrame, uri: Column = input_file_name()): DataFrame = {
    import graft.functions.Stats
    val (mantissa, exponent) = Stats.splitPvalueColumn(col("pvalue"))
    raw
      .select(
        fullStudyId(uri, col("gene_id")).as("studyId"),
        concat_ws("_", col("chromosome"), col("position"), col("ref"), col("alt"))
          .as("variantId"),
        col("chromosome"),
        col("position").cast(IntegerType).as("position"),
        mantissa,
        exponent,
        col("beta").cast(DoubleType).as("beta"),
        col("se").cast(DoubleType).as("standardError"),
        col("maf").cast(FloatType).as("effectAlleleFrequencyFromSource"))
      .filter(col("position").isNotNull && col("beta") =!= 0)
  }

  /** Raw studies-metadata TSV schema (study_index.py:33-47). */
  val rawStudiesMetadataSchema: StructType = StructType(Seq(
    StructField("study_id", StringType),
    StructField("dataset_id", StringType),
    StructField("study_label", StringType),
    StructField("sample_group", StringType),
    StructField("tissue_id", StringType),
    StructField("tissue_label", StringType),
    StructField("condition_label", StringType),
    StructField("sample_size", IntegerType),
    StructField("quant_method", StringType),
    StructField("pmid", StringType),
    StructField("study_type", StringType)
  ))

  /** Quantification methods the catalogue publishes; a blacklist entry
    * outside this set is a caller error (study_index.py:48-57 mapping keys,
    * validated in read_studies_from_source).
    */
  val quantificationMethods: Set[String] =
    Set("ge", "exon", "tx", "microarray", "leafcutter", "aptamer", "txrev", "majiq")

  /** Read raw studies metadata, dropping blacklisted quantification
    * methods (study_index.py:132-162 `read_studies_from_source`).
    */
  def readStudiesMetadata(
      spark: SparkSession,
      path: String,
      quantMethodsBlacklist: Seq[String] = Seq.empty): DataFrame = {
    val invalid = quantMethodsBlacklist.filterNot(quantificationMethods.contains)
    require(
      invalid.isEmpty,
      s"Quantification methods not supported: ${invalid.mkString(", ")}. " +
        s"Available options are: ${quantificationMethods.mkString(", ")}")
    val raw = spark.read
      .schema(rawStudiesMetadataSchema)
      .option("sep", "\t")
      .option("header", "true")
      .csv(path)
    if (quantMethodsBlacklist.isEmpty) raw
    else raw.filter(!col("quant_method").isin(quantMethodsBlacklist: _*))
  }

  /** Study index from processed SuSiE fine-mapping results
    * (study_index.py:109-131 `from_susie_results`): keep the StudyIndex
    * schema fields present in the processed frame — in schema order — and
    * collapse to distinct study rows.
    */
  def studyIndexFromSusieResults(processed: DataFrame): DataFrame = {
    val present = processed.columns.toSet
    val cols = graft.core.SchemaRegistry("study_index").fieldNames.filter(present.contains)
    processed.select(cols.map(col).toSeq: _*).distinct()
  }

  /** quant_method → QTL study type, `sc` prefix for single-cell studies
    * (eqtl_catalogue/study_index.py:47-87).
    */
  def identifyStudyType(quantMethod: Column, studyType: Column): Column = {
    val mapping = typedlit(Map(
      "ge" -> "eqtl", "exon" -> "eqtl", "tx" -> "eqtl", "microarray" -> "eqtl",
      "leafcutter" -> "sqtl", "aptamer" -> "pqtl", "txrev" -> "tuqtl",
      "majiq" -> "sqtl"))
    val qtl = element_at(mapping, quantMethod)
    when(studyType === "single-cell", concat(lit("sc"), qtl)).otherwise(qtl)
  }

  /** Join lbf rows with credible sets + broadcast study metadata, pick the
    * lbf column for the credible-set index, shape the study/statistics
    * columns (eqtl_catalogue/finemapping.py:123-203).
    */
  def parseSusieResults(
      credibleSets: DataFrame,
      lbf: DataFrame,
      studiesMetadata: DataFrame,
      ssFtpPathTemplate: String = "https://ftp.ebi.ac.uk/pub/databases/spot/eQTL/sumstats"
  ): DataFrame = {
    import graft.functions.{ArrayOps, GenomicOps, Stats}
    val logBf = (1 to 10).foldLeft(lit(null).cast("double")) { (acc, i) =>
      when(col("credibleSetIndex") === i, col(s"lbf_variable$i")).otherwise(acc)
    }
    val (mantissa, exponent) = Stats.splitPvalueColumn(col("pvalue"))
    lbf
      .join(
        credibleSets.join(broadcast(studiesMetadata), Seq("dataset_id")),
        Seq("molecular_trait_id", "region", "variant", "dataset_id"),
        "inner")
      .withColumn("logBF", logBf)
      .select(
        regexp_replace(col("variant"), "chr", "").as("variantId"),
        col("region"),
        GenomicOps.normalizeChromosome(col("chromosome")).as("chromosome"),
        col("position"),
        col("pip").as("posteriorProbability"),
        mantissa,
        exponent,
        col("sample_size").as("nSamples"),
        col("beta"),
        col("se").as("standardError"),
        col("credibleSetIndex"),
        col("logBF"),
        lit("SuSie").as("finemappingMethod"),
        col("molecular_trait_id").as("traitFromSource"),
        col("gene_id").as("geneId"),
        col("dataset_id"),
        ArrayOps.cleanStringsFromSymbols(
          concat_ws(
            "_",
            col("study_label"), col("quant_method"),
            col("sample_group"), col("molecular_trait_id"))).as("studyId"),
        col("tissue_id").as("biosampleFromSourceId"),
        identifyStudyType(col("quant_method"), col("study_type")).as("studyType"),
        col("study_label").as("projectId"),
        concat_ws("/", lit(ssFtpPathTemplate), col("study_id"), col("dataset_id"))
          .as("summarystatsLocation"),
        lit(true).as("hasSumstats"),
        col("molecular_trait_id"),
        col("pmid").as("pubmedId"),
        col("condition_label").as("condition"))
  }

  /** Collapse per-variant SuSiE rows into one StudyLocus row per credible
    * set: lead by posterior probability, full locus collected over the
    * credible-set window, hashed id and credible-set log10BF
    * (eqtl_catalogue/finemapping.py:204-263).
    */
  def fromSusieResults(processed: DataFrame): DataFrame = {
    val keys = Seq("dataset_id", "molecular_trait_id", "region", "credibleSetIndex")
    val rest = processed.columns.filterNot(keys.contains)
    // Lead = first row under (posteriorProbability desc nulls-last,
    // variantId asc): min_by over a composite struct key (struct ordering is
    // lexicographic; the leading isNull boolean reproduces desc's nulls-last).
    // The !isnan term keeps NaN pips consistent with both desc-window
    // semantics and the locus comparator below (Spark orders NaN as the
    // LARGEST double, so a NaN pip is the lead): negate(NaN) = NaN would
    // otherwise sort LAST in this ascending key, breaking the
    // "locus[0] is the lead" invariant consumers pin.
    val leadKey = struct(
      col("posteriorProbability").isNull,
      !coalesce(isnan(col("posteriorProbability")), lit(false)),
      negate(col("posteriorProbability")),
      col("variantId"))
    val locusEntry = struct(
      col("variantId"), col("posteriorProbability"),
      col("pValueMantissa"), col("pValueExponent"),
      col("logBF"), col("beta"), col("standardError"))
    // One partial-aggregable groupBy replaces the former two-pass window
    // (row_number + when(isLead, collect_list().over(w))): WindowExec
    // materialises array-valued window columns into EVERY frame row before
    // the when() guard — O(credibleSet²) copies (same trap as the q_clump
    // round-12 fix). The locus array is sorted to the window form's
    // (pip desc, variantId asc) scan order, which consumers pin (locus[0]
    // is the lead).
    val cmp = (l: Column, r: Column) => {
      val lk = l.getField("posteriorProbability")
      val rk = r.getField("posteriorProbability")
      when(lk.isNull && rk.isNotNull, 1)
        .when(lk.isNotNull && rk.isNull, -1)
        .when(lk > rk, -1).when(lk < rk, 1)
        .when(l.getField("variantId") < r.getField("variantId"), -1)
        .when(l.getField("variantId") > r.getField("variantId"), 1)
        .otherwise(0)
    }
    processed
      .groupBy(keys.map(col): _*)
      .agg(
        min_by(struct(rest.map(col).toSeq: _*), leadKey).as("_lead"),
        array_sort(collect_list(locusEntry), cmp).as("locus"))
      .select(
        processed.columns.map(c =>
          if (keys.contains(c)) col(c) else col(s"_lead.$c").as(c)).toSeq
          :+ col("locus"): _*)
      .withColumn(
        "studyLocusId",
        graft.datasets.StudyLocus.assignStudyLocusId(
          Seq("studyId", "variantId", "finemappingMethod")))
      .withColumn(
        "credibleSetlog10BF",
        graft.operators.StudyLocusQc.calculateCredibleSetLog10Bf(col("locus.logBF")))
  }
}
