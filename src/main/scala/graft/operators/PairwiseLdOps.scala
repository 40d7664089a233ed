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

  // --- LDAnnotator column kernels (reference: method/ld.py:20-115) ---

  /** Major LD population from the relativeSampleSize-ordered structure;
    * nfe wins ties (method/ld.py:23-44).
    */
  def getMajorPopulation(orderedPopulations: Column): Column = {
    val majorSize = orderedPopulations.getItem(0).getField("relativeSampleSize")
    val majors = filter(
      orderedPopulations,
      x => x.getField("relativeSampleSize") === majorSize)
    val hasNfe = filter(majors, x => x.getField("ldPopulation") === "nfe")
    when(size(majors) > 1 && size(hasNfe) === 1, lit("nfe"))
      .otherwise(orderedPopulations.getItem(0).getField("ldPopulation"))
  }

  /** Per-tag r² from the major population's r in the nested per-population
    * rValues (method/ld.py:47-75); missing population → 0.0.
    */
  def calculateR2Major(ldSet: Column, majorPopulation: Column): Column =
    transform(
      ldSet,
      x =>
        struct(
          x.getField("tagVariantId").as("tagVariantId"),
          coalesce(
            pow(
              get(
                filter(
                  x.getField("rValues"),
                  y => y.getField("population") === majorPopulation)
                  .getField("r"),
                lit(0)),
              2),
            lit(0.0)).as("r2Overall")))

  /** Flag associations with no LD information (method/ld.py:77-92). */
  def qcUnresolvedLd(ldSet: Column, qualityControls: Column): Column =
    graft.core.GDataset.updateQualityFlag(
      qualityControls,
      ldSet.isNull,
      "Variant not found in LD reference")

  /** When no LD info exists but the lead is known, the lead becomes its own
    * single-tag LD set with r² = 1 (method/ld.py:94-115).
    */
  def rescueLeadVariant(ldSet: Column, variantId: Column): Column =
    when(
      (ldSet.isNull || size(ldSet) === 0) && variantId.isNotNull,
      array(
        struct(
          variantId.as("tagVariantId"),
          lit(1.0).as("r2Overall"))))
      .otherwise(ldSet)
}
