package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.SchemaRegistry

/** Ensembl VEP JSON-output reader: schema-declared nested JSON → flat variant
  * annotation (reference: datasource/ensembl/vep_parser.py:63-700; the full
  * parser builds the complete VariantIndex — this extracts the core identity
  * + consequence surface).
  */
object VepParser {

  /** Read raw VEP output with the declared schema (never inferred). */
  def readVepJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(SchemaRegistry("vep_json_output")).json(path)

  /** Flatten to one row per variant: identity from the VCF-style `input`
    * line, rs ids from colocated variants, most severe consequence, and the
    * per-gene consequence terms exploded from transcript consequences.
    */
  def extractVariants(vep: DataFrame): DataFrame = {
    val inputParts = split(col("input"), "\t")
    vep
      .select(
        concat_ws(
          "_",
          regexp_replace(inputParts.getItem(0), "^chr", ""),
          inputParts.getItem(1),
          inputParts.getItem(3),
          inputParts.getItem(4)
        ).as("variantId"),
        regexp_replace(col("seq_region_name"), "^chr", "").as("chromosome"),
        col("start").cast("int").as("position"),
        inputParts.getItem(3).as("referenceAllele"),
        inputParts.getItem(4).as("alternateAllele"),
        col("most_severe_consequence").as("mostSevereConsequence"),
        transform(col("colocated_variants"), v => v.getField("id")).as("rsIds"),
        col("transcript_consequences")
      )
  }

  /** One row per (variant, gene): consequence terms per affected gene. */
  def geneConsequences(variants: DataFrame): DataFrame =
    variants
      .select(
        col("variantId"),
        explode(col("transcript_consequences")).as("tc")
      )
      .select(
        col("variantId"),
        col("tc.gene_id").as("geneId"),
        col("tc.consequence_terms").as("consequenceTerms"),
        col("tc.impact").as("impact")
      )
}
