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
}
