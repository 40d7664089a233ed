package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Long-form pairwise-LD operations — the Hail BlockMatrix replacement
  * (reference: datasource/gnomad/ld.py:223-309, dataset/pairwise_ld.py:55-91).
  * LD matrices live as `(variantIdI, variantIdJ, r)` rows; slicing is
  * relational, not linear-algebraic.
  */
object PairwiseLdOps {

  /** Slice the square LD matrix to a region: both endpoints inside
    * [start, end] on the chromosome. Equi on chromosome + range residuals —
    * partition-prunable when the table is written partitioned by chromosome.
    */
  def sliceRegion(
      ldLong: DataFrame,
      chromosome: String,
      start: Long,
      end: Long
  ): DataFrame =
    ldLong.filter(
      col("chromosome") === chromosome &&
        col("positionI").between(start, end) &&
        col("positionJ").between(start, end)
    )

  /** Symmetrise a triangular long-form matrix: add the mirrored half and the
    * unit diagonal (dataset/pairwise_ld.py:55-91).
    */
  def symmetrise(ldLong: DataFrame): DataFrame = {
    val mirrored = ldLong
      .filter(col("variantIdI") =!= col("variantIdJ"))
      .select(
        col("chromosome"),
        col("variantIdJ").as("variantIdI"),
        col("variantIdI").as("variantIdJ"),
        col("positionJ").as("positionI"),
        col("positionI").as("positionJ"),
        col("r")
      )
    ldLong.unionByName(mirrored)
  }

  /** Two-level aggregation of per-population LD rows into the nested LDIndex
    * shape: (variant, tag) pairs collect their per-population r values, then
    * variants collect their tag sets (datasource/gnomad/ld.py:55-99).
    */
  def aggregateAcrossPopulations(unaggregated: DataFrame): DataFrame =
    unaggregated
      .withColumn("r_pop_struct", struct(col("population"), col("r")))
      .groupBy("chromosome", "variantId", "tagVariantId")
      .agg(collect_set(col("r_pop_struct")).as("rValues"))
      .withColumn("r_pop_tag_struct", struct(col("tagVariantId"), col("rValues")))
      .groupBy("variantId", "chromosome")
      .agg(collect_set(col("r_pop_tag_struct")).as("ldSet"))

  /** Per-variant LD neighbourhood above a threshold: the LDIndex `ldSet`
    * shape (datasource/gnomad/ld.py:263-309) via groupBy + collect_list of
    * (tag, r) structs, r²-thresholded.
    */
  def toLdIndex(ldLongSymmetric: DataFrame, minR2: Double = 0.5): DataFrame =
    ldLongSymmetric
      .filter(col("r") * col("r") >= minR2)
      .groupBy(col("chromosome"), col("variantIdI").as("variantId"))
      .agg(
        collect_list(
          struct(col("variantIdJ").as("tagVariantId"), col("r").as("rOverall"))
        ).as("ldSet")
      )
}
