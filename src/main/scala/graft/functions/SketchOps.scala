package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable-sketch aggregation — the two-level pattern that makes
  * 100 TB rollups cheap: compute per-slice sketches ONCE (per day, per
  * partition, per source), persist the few-KB binaries, and answer any
  * coarser rollup by merging sketches instead of re-scanning raw data.
  *
  * Uses Spark's built-in Datasketches HLL aggregates (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`, codegen'd, map-side
  * combinable) and the `count_min_sketch` aggregate for frequency
  * estimates. Estimates are deterministic for a given input multiset and
  * lgK, so results are pinnable.
  */
object SketchOps {

  /** Per-group HLL distinct sketches over `key`. Persist this frame; each
    * sketch is ≤ (2^lgK)·bytes regardless of group cardinality.
    */
  def distinctSketches(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      lgK: Int = 12
  ): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol), lgK).as("sketch"))

  /** Roll existing sketches up to a coarser grouping: union + estimate —
    * no raw-data access. Identical to sketching the raw data directly at
    * the coarse level (HLL union is lossless at equal lgK; spec-pinned).
    */
  def rollupEstimate(
      sketches: DataFrame,
      rollupCols: Seq[String]
  ): DataFrame =
    sketches
      .groupBy(rollupCols.map(col): _*)
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sketch"), allowDifferentLgConfigK = false))
          .as("distinct_approx"))

  /** One-pass grouped distinct estimate (sketch + estimate fused). */
  def approxDistinct(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      lgK: Int = 12
  ): DataFrame =
    distinctSketches(df, keyCol, groupCols, lgK)
      .select(
        (groupCols.map(col) :+
          hll_sketch_estimate(col("sketch")).as("distinct_approx")): _*)

  /** Distributed count-min frequency sketch of `key` (mergeable aggregate;
    * the binary is (depth × width) counters, independent of data size).
    */
  def frequencySketch(
      df: DataFrame,
      keyCol: String,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42
  ): Array[Byte] =
    df.agg(
      count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed))
        .as("cms"))
      .head()
      .getAs[Array[Byte]]("cms")

  /** Probe a serialized count-min sketch for a bounded list of candidates
    * (driver-side: the sketch is a few KB, the candidate list is yours to
    * bound). Estimates never undercount.
    */
  def estimateCounts(sketch: Array[Byte], items: Seq[Any]): Map[Any, Long] = {
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketch))
    items.map(i => i -> cms.estimateCount(i)).toMap
  }
}
