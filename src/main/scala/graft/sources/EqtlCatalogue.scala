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
    import org.apache.spark.sql.expressions.Window
    val leadW = Window.partitionBy(
      col("dataset_id"), col("molecular_trait_id"), col("region"), col("credibleSetIndex"))
    processed
      .withColumn(
        "isLead",
        row_number().over(
          leadW.orderBy(col("posteriorProbability").desc, col("variantId").asc)) === 1)
      .withColumn(
        "locus",
        when(
          col("isLead"),
          collect_list(
            struct(
              col("variantId"), col("posteriorProbability"),
              col("pValueMantissa"), col("pValueExponent"),
              col("logBF"), col("beta"), col("standardError")))
            .over(leadW)))
      .filter(col("isLead"))
      .drop("isLead")
      .withColumn(
        "studyLocusId",
        graft.datasets.StudyLocus.assignStudyLocusId(
          Seq("studyId", "variantId", "finemappingMethod")))
      .withColumn(
        "credibleSetlog10BF",
        graft.operators.StudyLocusQc.calculateCredibleSetLog10Bf(col("locus.logBF")))
  }
}
