package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Time-series repair for feature pipelines: fill missing measurements per
  * key by linear interpolation between the nearest observed neighbours
  * (forward/backward fill at the edges) — the standard resampling step
  * before windowed feature extraction.
  *
  * Scale shape: everything is TWO window passes over ONE key-shuffle (the
  * backward pass reuses the forward pass's partitioning with a reversed
  * sort — no second exchange), all in whole-stage codegen; no self-join,
  * no explode. Per-key state is O(1).
  */
object TimeSeries {

  /** Append `<valueCol>_filled`: observed values pass through; nulls get
    * the linear interpolation `prev + (next-prev) * (t-pt)/(nt-pt)`;
    * leading/trailing gaps fall back to backward/forward fill; keys with
    * no observations stay null.
    */
  def interpolateLinear(
      df: DataFrame,
      keyCols: Seq[String],
      tCol: String,
      valueCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val t = col(tCol)
    val v = col(valueCol)
    val fwd = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(t.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(t.desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val prevV = last(v, ignoreNulls = true).over(fwd)
    val prevT = last(when(v.isNotNull, t), ignoreNulls = true).over(fwd)
    val nextV = last(v, ignoreNulls = true).over(bwd)
    val nextT = last(when(v.isNotNull, t), ignoreNulls = true).over(bwd)

    val interp = when(v.isNotNull, v)
      .when(prevV.isNotNull && nextV.isNotNull && nextT =!= prevT,
        prevV + (nextV - prevV) * (t - prevT).cast("double") / (nextT - prevT).cast("double"))
      .when(prevV.isNotNull && nextV.isNotNull, prevV) // same-timestamp neighbours
      .when(prevV.isNotNull, prevV)                    // trailing gap → ffill
      .otherwise(nextV)                                // leading gap → bfill (or null)
    df.withColumn(s"${valueCol}_filled", interp)
  }
}
