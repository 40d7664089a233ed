package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Enhancer→gene interval sources: BED-style delimited reads
  * (reference: datasource/intervals/e2g.py:35, epiraction.py:35).
  */
object Intervals {

  val bedSchema: StructType = StructType(Seq(
    StructField("chrom", StringType), StructField("chromStart", IntegerType),
    StructField("chromEnd", IntegerType), StructField("name", StringType),
    StructField("score", DoubleType)
  ))

  /** Read a headerless BED(-ish) file into the intervals shape: normalised
    * chromosome, half-open → closed coordinates, gene id parsed from the
    * name field (`<gene>|<rest>` or plain gene id).
    */
  def readBed(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(bedSchema)
      .option("sep", "\t")
      .csv(path)
      .select(
        regexp_replace(col("chrom"), "^chr", "").as("chromosome"),
        (col("chromStart") + 1).as("start"), // BED is 0-based half-open
        col("chromEnd").as("end"),
        element_at(split(col("name"), "\\|"), 1).as("geneId"),
        col("score").as("resourceScore")
      )

  /** Distance from an interval to a gene's TSS: promoters and TSS-containing
    * intervals are 0; null TSS propagates
    * (reference: dataset/intervals.py:120-160).
    */
  def distanceToTss(istart: Column, iend: Column, itype: Column, tss: Column): Column =
    when((itype === "promoter") || (tss >= istart && tss <= iend), lit(0))
      .when(tss.isNull, lit(null).cast(IntegerType))
      .otherwise(least(abs(tss - istart), abs(tss - iend)))

  /** Read the EPIraction TSV export (header, `#chr` or `chr` first column)
    * (reference: datasource/intervals/epiraction.py:24-39).
    */
  def readEpiraction(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("delimiter", "\t")
      .option("mode", "DROPMALFORMED")
      .option("header", "true")
      .csv(path)

  /** Parse raw EPIraction rows into the intervals shape: per-assay
    * resourceScore structs, TSS distance against a (geneId, tss) LUT,
    * lower-cased interval types, study id from the source file name
    * (reference: datasource/intervals/epiraction.py:41-140).
    */
  def parseEpiraction(raw: DataFrame, geneTss: DataFrame): DataFrame = {
    val chrCol = if (raw.columns.contains("#chr")) "#chr" else "chr"
    def assay(name: String) =
      struct(lit(name).as("name"), col(name).cast(FloatType).as("value"))
    val base = raw
      .withColumn("studyId", regexp_extract(input_file_name(), "([^/]+)\\.bed\\.gz$", 1))
      .withColumn("chromosome", graft.functions.GenomicOps.normalizeChromosome(col(chrCol)))
      .withColumn("start", col("start").cast(LongType))
      .withColumn("end", col("end").cast(LongType))
      .withColumnRenamed("TargetGeneEnsemblID", "geneId")
      .withColumnRenamed("CellType", "biosampleName")
      .withColumnRenamed("Score", "score")
      .withColumn("score", col("score").cast(DoubleType))
      .withColumnRenamed("class", "intervalType")
      .withColumn("intervalType", lower(trim(col("intervalType"))))
      .withColumn(
        "resourceScore",
        array(
          assay("H3K27ac"), assay("Open"), assay("Cofactor"),
          assay("CTCF"), assay("HiC_contacts"), assay("abc_tissue")))
    base
      .join(geneTss.select(col("geneId"), col("tss")), Seq("geneId"), "left")
      .withColumn(
        "distanceToTss",
        distanceToTss(col("start"), col("end"), col("intervalType"), col("tss")))
      .select(
        col("chromosome"), col("start"), col("end"), col("geneId"), col("score"),
        col("distanceToTss"), col("resourceScore"),
        lit("epiraction").as("datasourceId"), col("intervalType"),
        lit("40027634").as("pmid"), col("biosampleName"), col("studyId"))
  }
}
