package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Gap-based sessionization over an event stream — the LLM-training-pipeline
  * flavour of the reference's lag-gap peak clustering
  * (method/window_based_clumping.py:94-112: identical window machinery,
  * different constants).
  *
  * Scale design: one shuffle on the user key; the session assignment is two
  * window passes over the same partitioning (lag + running sum), then the
  * per-session aggregation reuses the (user, session) grouping that is
  * already co-partitioned by user — AQE coalesces the second exchange.
  */
object Sessionize {

  /** Append a `session_idx` column (1-based per user): a new session starts
    * when the gap since the previous event exceeds `gapSeconds`.
    *
    * @param tsSeconds event time as epoch seconds (integral column)
    */
  def withSessionIndex(
      events: DataFrame,
      userCol: Column,
      tsSeconds: Column,
      gapSeconds: Long
  ): DataFrame = {
    val byTime = Window.partitionBy(userCol).orderBy(tsSeconds)
    val gap = tsSeconds - lag(tsSeconds, 1).over(byTime)
    val isNewSession = when(gap.isNull || (gap > gapSeconds), 1).otherwise(0)
    events.withColumn(
      "session_idx",
      sum(isNewSession).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
  }

  /** Sessionize and aggregate: event counts, value sums, duration and
    * json-prop sums per (user, session).
    */
  def sessionStats(
      events: DataFrame,
      gapSeconds: Long = 1800
  ): DataFrame = {
    // events.ts has shipped as both TIMESTAMP(NANOS)-read-as-long (under
    // nanosAsLong) and timestamp[us]; dispatch on the actual type. Integer
    // division keeps full precision on the long path; a timestamp cast to
    // long is epoch seconds already.
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val sec = events.schema("ts").dataType match {
      case LongType         => expr("ts div 1000000000")
      case TimestampType    => unix_seconds(col("ts"))
      // NTZ: interpret the naive timestamp as UTC (sessions pin UTC), matching
      // DuckDB's epoch_ns on the same naive value. ANSI forbids a direct
      // timestamp→long cast, hence unix_seconds.
      case TimestampNTZType => unix_seconds(col("ts").cast(TimestampType))
      case other =>
        throw new IllegalArgumentException(s"unsupported events.ts type: $other")
    }
    withSessionIndex(events.withColumn("ts_sec", sec), col("user_id"), col("ts_sec"), gapSeconds)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("value_sum"),
        (max(col("ts_sec")) - min(col("ts_sec"))).as("duration_sec"),
        sum(get_json_object(col("props"), "$.k").cast("int")).as("k_sum"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchases")
      )
  }
}
