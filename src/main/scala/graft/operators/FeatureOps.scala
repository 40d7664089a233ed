package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** ML feature-engineering primitives for tabular/event training data: the
  * hashing trick for unbounded categoricals, rank-based normalisation, and
  * rolling time-window statistics. All pure column expressions / windows —
  * codegen end-to-end, one key shuffle where a window is involved, nothing
  * driver-bounded.
  */
object FeatureOps {

  /** Feature hashing: deterministic bucket in `[0, numBuckets)` from the
    * md5 of the feature value — unbounded categorical vocabulary → fixed
    * model dimension with no fitted dictionary to ship (and identical
    * buckets on any engine with md5, unlike JVM `hashCode`).
    */
  def hashBucket(feature: Column, numBuckets: Int): Column = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    conv(substring(md5(feature.cast("string")), 1, 8), 16, 10).cast("long") % numBuckets
  }

  /** Rank-based normalisation per group: `percent_rank` (uniform on [0,1],
    * the quantile transform) and an `ntile` decile. `tieCol` makes the
    * order total so both are deterministic.
    */
  def withRankFeatures(
      df: DataFrame,
      partitionCols: Seq[String],
      valueCol: String,
      tieCol: String,
      buckets: Int = 10
  ): DataFrame = {
    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col(valueCol).asc, col(tieCol).asc)
    df.withColumn("pct_rank", percent_rank().over(w))
      .withColumn("bucket_rank", ntile(buckets).over(w))
  }

  /** Rolling statistics over a trailing time window per key
    * (`range (-windowSize, 0]` on `tCol`): count, sum, mean, min, max —
    * the lag-feature block of an event-level training table. One key
    * shuffle; the range frame is evaluated incrementally in sort order.
    */
  def rollingStats(
      df: DataFrame,
      keyCols: Seq[String],
      tCol: String,
      valueCol: String,
      windowSize: Long
  ): DataFrame = {
    require(windowSize > 0, s"windowSize must be positive: $windowSize")
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tCol).asc)
      .rangeBetween(-windowSize, 0)
    val v = col(valueCol)
    df.withColumn("roll_n", count(v).over(w))
      .withColumn("roll_sum", sum(v).over(w))
      .withColumn("roll_mean", avg(v).over(w))
      .withColumn("roll_min", min(v).over(w))
      .withColumn("roll_max", max(v).over(w))
  }
}
