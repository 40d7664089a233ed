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
}
