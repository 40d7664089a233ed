package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Snapshot-to-snapshot change capture for versioned datasets: classify
  * every key as added / removed / changed / unchanged between two full
  * snapshots (the release-diff a pipeline publishes next to each refresh,
  * and the input to incremental downstream recomputation).
  *
  * One full-outer join on the key columns; change detection hashes the
  * non-key payload with a single `xxhash64` per side (codegen, no
  * column-by-column comparison explosion — at 100 TB comparing k columns
  * as one hash is the difference between one cheap expression and k
  * null-safe equality trees).
  */
object SnapshotDiff {

  /** @param keyCols identity columns present in both snapshots
    * @param compareCols payload columns to diff (default: every shared
    *                    non-key column, in name order)
    * @return one row per key present in either side:
    *         `(keys..., change)` with change ∈ added|removed|changed|unchanged
    */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String] = Seq.empty
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val payload =
      if (compareCols.nonEmpty) compareCols
      else (oldSnap.columns.toSet intersect newSnap.columns.toSet)
        .diff(keyCols.toSet).toSeq.sorted
    // is-null flag hashed next to each value: SQL NULL must not collide
    // with any in-band string sentinel (a null<->"NULL" transition is a
    // real change)
    def hashed(df: DataFrame, name: String): DataFrame =
      df.select(
        (keyCols.map(col) :+
          xxhash64(payload.flatMap(c =>
            Seq(col(c).isNull, coalesce(col(c).cast("string"), lit("")))): _*)
            .as(name)): _*)
    val o = hashed(oldSnap, "_old_hash")
    val n = hashed(newSnap, "_new_hash")
    o.join(n, keyCols, "full_outer")
      .select(
        (keyCols.map(col) :+
          when(col("_old_hash").isNull, "added")
            .when(col("_new_hash").isNull, "removed")
            .when(col("_old_hash") =!= col("_new_hash"), "changed")
            .otherwise("unchanged")
            .as("change")): _*)
  }

  /** Counts per change kind — the four-row summary a release pipeline
    * logs and alerts on.
    */
  def diffSummary(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String] = Seq.empty
  ): DataFrame =
    diff(oldSnap, newSnap, keyCols, compareCols)
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n"))
}
