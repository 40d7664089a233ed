package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.datasets.SummaryStatistics
import graft.functions.Stats

/** FinnGen summary-statistics reader: schema-declared TSV → harmonised
  * [[SummaryStatistics]] (reference: datasource/finngen/summary_stats.py:22-95).
  */
object FinnGen {

  val rawSchema: StructType = StructType(Seq(
    StructField("#chrom", StringType), StructField("pos", StringType),
    StructField("ref", StringType), StructField("alt", StringType),
    StructField("rsids", StringType), StructField("nearest_genes", StringType),
    StructField("pval", StringType), StructField("mlogp", StringType),
    StructField("beta", StringType), StructField("sebeta", StringType),
    StructField("af_alt", StringType), StructField("af_alt_cases", StringType),
    StructField("af_alt_controls", StringType)
  ))

  /** Ingest raw FinnGen TSVs: studyId from the file name, variantId from the
    * coordinates, p-value split into mantissa/exponent. Output is
    * range-partitioned and sorted within partitions by (chromosome, position)
    * like the reference, giving ~clustered parquet for downstream pruning.
    */
  def fromSource(spark: SparkSession, rawFile: String, outputPartitions: Int = 30): SummaryStatistics = {
    val (mantissa, exponent) = Stats.splitPvalueColumn(col("pval"))
    val df = spark.read
      .schema(rawSchema)
      .option("delimiter", "\t")
      .option("header", "true")
      .csv(rawFile)
      .filter(expr("try_cast(pos AS INT)").isNotNull)
      .select(
        upper(
          regexp_extract(input_file_name(), "([^/]+?)(\\.tsv\\.gz|\\.gz|\\.tsv)", 1)
        ).as("studyId"),
        concat_ws("_", col("#chrom"), col("pos"), col("ref"), col("alt")).as("variantId"),
        col("#chrom").as("chromosome"),
        expr("try_cast(pos AS INT)").as("position"),
        mantissa,
        exponent,
        col("beta").cast(DoubleType).as("beta"),
        col("sebeta").cast(DoubleType).as("standardError"),
        col("af_alt").cast(FloatType).as("effectAlleleFrequencyFromSource")
      )
      .filter(col("beta") =!= 0)
      .repartitionByRange(outputPartitions, col("chromosome"), col("position"))
      .sortWithinPartitions("chromosome", "position")
    SummaryStatistics(df)
  }

  // Constant study-level annotations for FinnGen releases
  // (reference: datasource/finngen/study_index.py:36-41).
  val StudyType = "gwas"
  val HasSumstats = true
  val InitialSampleSize = "500,348 (282,064 females and 218,284 males)"
  val PubmedId = "36653562"

  /** Validate a `FINNGEN_R*` release prefix and return (prefix-without-
    * trailing-underscore, release) (study_index.py:44-67
    * validate_release_prefix).
    */
  def validateReleasePrefix(releasePrefix: String): (String, String) = {
    val pattern = "FINNGEN_(R\\d+)_?".r
    pattern.findPrefixMatchOf(releasePrefix) match {
      case Some(m) =>
        val prefix =
          if (releasePrefix.endsWith("_")) releasePrefix.dropRight(1)
          else releasePrefix
        (prefix, m.group(1).toUpperCase)
      case None =>
        throw new IllegalArgumentException(
          s"Invalid FinnGen release prefix: $releasePrefix, use the format FINNGEN_R*")
    }
  }

  /** FinnGen phenotype table (parsed REST JSON: `phenocode`, `phenostring`,
    * `num_cases`, `num_controls`) → StudyIndex rows with the release
    * constants, summary-statistics location and the Finnish LD population
    * structure (study_index.py:69-127 from_source). Pure projection — no
    * shuffle; the phenotype table is a few thousand rows.
    */
  def studyIndexFromPhenotypes(
      phenotypes: DataFrame,
      releasePrefix: String,
      sumstatsUrlPrefix: String,
      sumstatsUrlSuffix: String,
      sampleSize: Int
  ): DataFrame = {
    val discoverySamples = array(
      struct(
        lit(sampleSize).cast(IntegerType).as("sampleSize"),
        lit("Finnish").as("ancestry")))
    phenotypes
      .select(
        concat_ws("_", lit(releasePrefix), col("phenocode")).as("studyId"),
        col("phenostring").as("traitFromSource"),
        col("num_cases").cast(IntegerType).as("nCases"),
        col("num_controls").cast(IntegerType).as("nControls"),
        (col("num_cases") + col("num_controls")).cast(IntegerType).as("nSamples"),
        discoverySamples.as("discoverySamples"),
        // Cohort label is consistent with GWAS Catalog curation.
        array(lit("FinnGen")).as("cohorts"),
        concat(
          lit(sumstatsUrlPrefix), col("phenocode"), lit(sumstatsUrlSuffix))
          .as("summarystatsLocation"),
        lit(releasePrefix).as("projectId"),
        lit(StudyType).as("studyType"),
        lit(HasSumstats).as("hasSumstats"),
        lit(InitialSampleSize).as("initialSampleSize"),
        lit(PubmedId).as("pubmedId"))
      .withColumn(
        "ldPopulationStructure",
        StudyIndexOps.aggregateAndMapAncestries(col("discoverySamples")))
  }

  /** Phenotype JSON document (one array of objects, as served by the FinnGen
    * REST endpoint) → StudyIndex (study_index.py:94-99: the reference
    * parallelizes the body and `spark.read.json`s it).
    */
  def studyIndexFromJson(
      spark: SparkSession,
      jsonBody: String,
      releasePrefix: String,
      sumstatsUrlPrefix: String,
      sumstatsUrlSuffix: String,
      sampleSize: Int
  ): DataFrame = {
    import spark.implicits._
    studyIndexFromPhenotypes(
      spark.read.json(Seq(jsonBody).toDS()),
      releasePrefix, sumstatsUrlPrefix, sumstatsUrlSuffix, sampleSize)
  }

  /** Validate and slim a curated EFO mapping table
    * (datasource/finngen/efo_mapping.py:14-72 EFOMapping.from_path): the
    * required STUDY / PROPERTY_VALUE / SEMANTIC_TAG columns, cast to string.
    */
  def loadEfoMapping(raw: DataFrame): DataFrame = {
    val required = Seq("STUDY", "PROPERTY_VALUE", "SEMANTIC_TAG")
    val missing = required.filterNot(raw.columns.contains)
    require(
      missing.isEmpty,
      s"EFO curation file must contain the following columns: ${missing.mkString(", ")}")
    raw.select(required.map(c => col(c).cast(StringType).as(c)): _*)
  }

  /** Join curated EFO mappings onto a FinnGen study index by trait name
    * (efo_mapping.py:74-127 annotate_study_index): release-filtered
    * mappings, EFO short ids from the semantic-tag URI, aggregated to a
    * list per study. All studies survive (left join + group) so the study
    * and credible-set tables stay consistent; unmapped studies carry an
    * empty list for the downstream validation step to flag. The mapping
    * table is curated (bounded) and broadcasts.
    */
  def annotateStudyIndexWithEfo(
      studyIndex: DataFrame,
      efoMapping: DataFrame,
      finngenRelease: String = "R12"
  ): DataFrame = {
    val mappings = efoMapping
      .withColumn("STUDY", upper(col("STUDY")))
      .filter(col("STUDY").contains("FINNGEN"))
      .filter(upper(col("STUDY")).contains(finngenRelease))
      .select(
        regexp_replace(col("SEMANTIC_TAG"), "^.*/", "")
          .as("traitFromSourceMappedId"),
        col("PROPERTY_VALUE").as("traitFromSource"))
    val joined = studyIndex.join(
      broadcast(mappings), Seq("traitFromSource"), "left_outer")
    val commonCols =
      joined.columns.filter(_ != "traitFromSourceMappedId").map(col)
    joined
      .groupBy(commonCols: _*)
      .agg(
        collect_list(col("traitFromSourceMappedId"))
          .as("traitFromSourceMappedIds"))
  }
}
