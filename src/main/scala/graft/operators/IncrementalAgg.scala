package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Incremental maintenance of materialized count/sum aggregates: fold a CDC
  * change set (removed rows + added rows, e.g. derived from
  * [[SnapshotDiff]]) into a persisted per-key aggregate WITHOUT rescanning
  * the base table — at 100 TB the difference between touching the delta
  * (plus one state-sized join) and re-aggregating everything.
  *
  * Only distributive/algebraic measures are maintainable this way (count,
  * sum, and anything derived from them like mean); min/max are NOT — a
  * removed extremum needs the base rows to re-derive, so they are
  * deliberately absent from this API.
  */
object IncrementalAgg {

  /** Build the per-key delta from a change set: removed rows contribute
    * `(-1, -value)`, added rows `(+1, +value)`; a changed row is one
    * removal (old version) plus one addition (new version). One map-side
    * combinable aggregation over delta-sized input.
    */
  def deltaFromRowSets(
      removed: DataFrame,
      added: DataFrame,
      keyCols: Seq[String],
      valueCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val rem = removed.select(
      keyCols.map(col) ++ Seq(lit(-1L).as("_dc"), (-col(valueCol)).as("_dv")): _*)
    val add = added.select(
      keyCols.map(col) ++ Seq(lit(1L).as("_dc"), col(valueCol).as("_dv")): _*)
    rem.unionByName(add)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_dc")).as("cnt_delta"), sum(col("_dv")).as("sum_delta"))
  }

  /** Merge a delta into the aggregate state `(keys..., cnt, sum)`: one
    * full-outer key join, coalesced addition, keys whose count reaches
    * zero disappear (matching what a fresh aggregation would produce).
    */
  def merge(state: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame =
    state
      .join(delta, keyCols, "full_outer")
      .select(
        keyCols.map(col) ++ Seq(
          (coalesce(col("cnt"), lit(0L)) + coalesce(col("cnt_delta"), lit(0L))).as("cnt"),
          (coalesce(col("sum"), lit(0.0)) + coalesce(col("sum_delta"), lit(0.0))).as("sum")): _*)
      .filter(col("cnt") =!= 0L)

  /** Bootstrap the aggregate state from a full snapshot. */
  def initState(snapshot: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    snapshot
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum"))
}
