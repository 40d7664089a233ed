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

  // IntervalQualityCheck flag texts (dataset/intervals.py:31-44)
  val UnresolvedTargetFlag = "Target/gene identifier could not match to reference"
  val UnknownBiosampleFlag = "Biosample identifier was not found in the reference"
  val ScoreOutsideBoundsFlag = "Score was above or below specified thresholds"
  val UnknownIntervalTypeFlag = "Interval type is not supported"
  val UnknownProjectIdFlag = "Project id could not be resolved to any known dataset"
  val InvalidChromosomeFlag = "Interval chromosome was not found in contig index"
  val InvalidRangeFlag = "Interval range exceeded chromosome bounds"
  val AmbiguousIntervalTypeFlag =
    "Multiple interval types for the same (region, geneId) pair"
  val AmbiguousScoreFlag = "Interval has a duplicate with different score"

  val KnownDataSources: Seq[String] = Seq("E2G", "epiraction")
  val KnownIntervalTypes: Seq[String] =
    Seq("promoter", "enhancer", "intragenic", "intergenic", "genic")

  private def qcCol(df: DataFrame): Column =
    if (df.columns.contains("qualityControls")) col("qualityControls")
    else array().cast("array<string>")

  /** Flag unknown datasource ids (dataset/intervals.py:165-207). */
  def validateDatasourceId(df: DataFrame): DataFrame =
    df.withColumn(
      "qualityControls",
      graft.core.GDataset.updateQualityFlag(
        qcCol(df),
        !col("datasourceId").isin(KnownDataSources: _*),
        UnknownProjectIdFlag))

  /** Flag non-canonical chromosomes and out-of-bounds ranges against the
    * broadcast contig index (dataset/intervals.py:207-283).
    */
  def validateIntervalRange(df: DataFrame, contigIndex: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val contigs = broadcast(
      contigIndex.select(
        col("start").as("contigStart"),
        col("end").as("contigEnd"),
        col("id").as("chromosome")))
    df.join(contigs, Seq("chromosome"), "left")
      .withColumn(
        "qualityControls",
        graft.core.GDataset.updateQualityFlag(
          qcCol(df),
          col("contigStart").isNull || col("contigEnd").isNull,
          InvalidChromosomeFlag))
      .withColumn(
        "qualityControls",
        graft.core.GDataset.updateQualityFlag(
          col("qualityControls"),
          col("start") < col("contigStart") || col("end") > col("contigEnd"),
          InvalidRangeFlag))
      .drop("contigStart", "contigEnd")
  }

  /** Flag intervals whose gene is absent from the target index
    * (dataset/intervals.py:284-337).
    */
  def validateTarget(df: DataFrame, targetIndex: DataFrame): DataFrame =
    df.join(
      targetIndex.select(col("id").as("geneId"), lit(true).as("isIdFound")),
      Seq("geneId"),
      "left")
      .withColumn(
        "qualityControls",
        graft.core.GDataset.updateQualityFlag(
          qcCol(df), col("isIdFound").isNull, UnresolvedTargetFlag))
      .drop("isIdFound")

  /** Flag intervals whose biosample is absent from the biosample index
    * (dataset/intervals.py:338-391).
    */
  def validateBiosample(df: DataFrame, biosampleIndex: DataFrame): DataFrame =
    df.join(
      biosampleIndex.select(
        col("biosampleId").as("biosampleFromSourceId"), lit(true).as("isIdFound")),
      Seq("biosampleFromSourceId"),
      "left")
      .withColumn(
        "qualityControls",
        graft.core.GDataset.updateQualityFlag(
          qcCol(df), col("isIdFound").isNull, UnknownBiosampleFlag))
      .drop("isIdFound")

  /** Flag unsupported interval types and (region, gene) pairs carrying
    * multiple types (dataset/intervals.py:392-450).
    */
  def validateIntervalType(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("chromosome"), col("start"), col("end"), col("geneId"))
    df.withColumn(
      "qualityControls",
      graft.core.GDataset.updateQualityFlag(
        qcCol(df),
        !col("intervalType").isin(KnownIntervalTypes: _*),
        UnknownIntervalTypeFlag))
      .withColumn(
        "qualityControls",
        graft.core.GDataset.updateQualityFlag(
          col("qualityControls"),
          // >1 distinct non-null type ⇔ min ≠ max: constant window state per
          // row instead of a whole-partition set array copied into each row.
          coalesce(
            min(col("intervalType")).over(w) =!= max(col("intervalType")).over(w),
            lit(false)),
          AmbiguousIntervalTypeFlag))
  }

  /** Flag intervals whose (chromosome, start, end, biosampleId, geneId,
    * studyId, intervalType) group carries more than one distinct score
    * (dataset/intervals.py:500-549; doctest: interval1/interval2 share a
    * region with scores 0.5/0.7 → both flagged, interval3 clean).
    */
  def validateIdHasUniqueScore(
      df: DataFrame,
      keys: Seq[String] = Seq(
        "chromosome", "start", "end", "biosampleId", "geneId", "studyId",
        "intervalType")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn(
      "qualityControls",
      graft.core.GDataset.updateQualityFlag(
        qcCol(df),
        // >1 distinct non-null score ⇔ min ≠ max (Spark orders NaN = NaN):
        // no per-row array materialisation over the group.
        coalesce(min(col("score")).over(w) =!= max(col("score")).over(w), lit(false)),
        AmbiguousScoreFlag))
  }

  /** Flag scores outside [minScore, maxScore] or null
    * (dataset/intervals.py:452-496).
    */
  def validateScore(df: DataFrame, minScore: Double, maxScore: Double): DataFrame =
    df.withColumn(
      "qualityControls",
      graft.core.GDataset.updateQualityFlag(
        qcCol(df),
        !col("score").between(minScore, maxScore) || col("score").isNull,
        ScoreOutsideBoundsFlag))

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
