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

  /** Per-group equal-width histogram in LONG form — `(groups..., bin, cnt)`
    * rows over declared `[lo, hi)` bounds. The mergeable quantile sketch:
    * persist per-slice histograms once, roll up to any coarser grouping
    * with a plain `sum`, and answer quantiles with error ≤ one bin width.
    * Values outside the bounds clamp into the edge bins.
    */
  def histogram(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      lo: Double,
      hi: Double,
      bins: Int
  ): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins>0 and hi>lo, got bins=$bins [$lo,$hi)")
    val w = (hi - lo) / bins
    val bin = least(
      greatest(floor((col(valueCol).cast("double") - lo) / w), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols.map(col) :+ bin.as("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge long-form histograms to a coarser grouping: one `sum`. */
  def histogramRollup(hist: DataFrame, rollupCols: Seq[String]): DataFrame =
    hist
      .groupBy((rollupCols.map(col) :+ col("bin")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Linear-interpolated quantile estimates from a long-form histogram:
    * for each requested q, the first bin whose cumulative count reaches
    * q·total, positioned proportionally inside that bin. Deterministic —
    * exactly reproducible in SQL.
    */
  def histogramQuantiles(
      hist: DataFrame,
      groupCols: Seq[String],
      qs: Seq[Double],
      lo: Double,
      hi: Double,
      bins: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty, "qs must be non-empty")
    val w = (hi - lo) / bins
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val cumW = byGroup.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("_cum", sum(col("cnt")).over(cumW))
      .withColumn("_total", sum(col("cnt")).over(byGroup))
    val qDf = cum.sparkSession
      .createDataFrame(qs.map(Tuple1.apply)).toDF("q")
    val at = col("_at")
    val cumBefore = at.getField("_cum") - at.getField("cnt")
    val frac = least(
      greatest(
        (col("q") * at.getField("_total") - cumBefore) / at.getField("cnt"),
        lit(0.0)),
      lit(1.0))
    cum
      .crossJoin(broadcast(qDf))
      .filter(col("_cum") >= col("q") * col("_total"))
      .groupBy((groupCols.map(col) :+ col("q")): _*)
      .agg(
        min(col("bin")).as("_qbin"),
        min_by(struct(col("_cum"), col("cnt"), col("_total")), col("bin")).as("_at"))
      .select(
        (groupCols.map(col) :+ col("q") :+
          round(lit(lo) + lit(w) * (col("_qbin") + frac), 6).as("value")): _*)
  }

  /** Probe a serialized count-min sketch for a bounded list of candidates
    * (driver-side: the sketch is a few KB, the candidate list is yours to
    * bound). Estimates never undercount.
    */
  def estimateCounts(sketch: Array[Byte], items: Seq[Any]): Map[Any, Long] = {
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketch))
    items.map(i => i -> cms.estimateCount(i)).toMap
  }
}
