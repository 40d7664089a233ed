package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
