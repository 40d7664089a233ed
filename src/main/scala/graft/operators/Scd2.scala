package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Slowly-changing-dimension type-2 history maintenance: fold a stream of
  * full snapshots into a versioned table with `(valid_from, valid_to,
  * is_current)` columns — the standard way a pipeline keeps point-in-time
  * reproducibility for dimension-like inputs (study indices, target LUTs,
  * document metadata) without re-publishing the full history each release.
  *
  * Companion to [[SnapshotDiff]] (which only classifies): this operator
  * APPLIES the classification.
  *
  * Scale design: the closed-history partition (`is_current = false`) is a
  * pure pass-through — a `filter` that pushes down to the parquet scan, so
  * a 100 TB history with a small current slice reads only the current
  * slice plus the snapshot. The current-vs-snapshot reconciliation is ONE
  * full-outer key join; change detection is one `xxhash64` per side (the
  * [[SnapshotDiff]] argument); and the 1-or-2 output rows per joined key
  * are produced in the SAME pass via an array-explode, so the join is
  * never recomputed per output class.
  */
object Scd2 {

  /** Seed a history table from the first snapshot: every row current from
    * `ts`, open-ended.
    */
  def init(snapshot: DataFrame, ts: Column): DataFrame =
    snapshot
      .withColumn("valid_from", ts.cast("long"))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))

  /** Apply a full snapshot taken at `batchTs` to an existing SCD2 history.
    *
    * Per key in the current slice ∪ snapshot:
    *  - unchanged: the open row is carried as-is;
    *  - changed:   the open row is closed (`valid_to = batchTs`) AND a new
    *               open row with the snapshot payload starts at `batchTs`;
    *  - removed:   the open row is closed, nothing re-opens;
    *  - added:     a new open row starts at `batchTs`.
    * Rows already closed (`is_current = false`) pass through untouched.
    *
    * Keys must be unique within the current slice and within the snapshot
    * (the usual dimension contract); payload columns are `keyCols`'s
    * complement in the snapshot schema.
    */
  def applySnapshot(
      history: DataFrame,
      snapshot: DataFrame,
      keyCols: Seq[String],
      batchTs: Column
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val metaCols = Seq("valid_from", "valid_to", "is_current")
    val payload = snapshot.columns.filterNot(keyCols.contains).toSeq
    require(
      history.columns.toSet == (snapshot.columns ++ metaCols).toSet,
      s"history schema must be snapshot schema + $metaCols")

    // each payload value hashes alongside an explicit is-null flag, so SQL
    // NULL and a value whose string form is any in-band sentinel (e.g. the
    // literal string "NULL") can never collide as "unchanged"
    def rowHash(prefix: String): Column =
      xxhash64(payload.flatMap(c =>
        Seq(col(s"$prefix$c").isNull, coalesce(col(s"$prefix$c").cast("string"), lit("")))): _*)

    val cur = history
      .filter(col("is_current"))
      .select(keyCols.map(col) ++ payload.map(c => col(c).as(s"_o_$c")) :+
        col("valid_from").as("_o_from"): _*)
    val snap = snapshot
      .select(keyCols.map(col) ++ payload.map(c => col(c).as(s"_n_$c")): _*)

    // Presence flags: the old side carries _o_from (non-null by
    // construction); for the new side we must distinguish "key absent from
    // snapshot" from "payload all null", so snap gets an explicit marker.
    val snapMarked = snap.withColumn("_n_present", lit(true))
    val j = cur
      .join(snapMarked, keyCols, "full_outer")
      .withColumn("_o_present", col("_o_from").isNotNull)
      .withColumn("_n_present", coalesce(col("_n_present"), lit(false)))
      .withColumn("_oh", rowHash("_o_"))
      .withColumn("_nh", rowHash("_n_"))
    val changed = col("_o_present") && col("_n_present") && col("_oh") =!= col("_nh")
    val unchanged = col("_o_present") && col("_n_present") && col("_oh") === col("_nh")

    val ts = batchTs.cast("long")
    def outRow(pfx: String, from: Column, to: Column, current: Column): Column =
      struct(
        payload.map(c => col(s"$pfx$c").as(c)) ++
          Seq(from.as("valid_from"), to.as("valid_to"), current.as("is_current")): _*)

    val nullLong = lit(null).cast("long")
    val emitted = j.select(
      keyCols.map(col) :+
        filter(
          array(
            // carried: unchanged current row
            when(unchanged, outRow("_o_", col("_o_from"), nullLong, lit(true))),
            // closed: changed or removed current row
            when(changed || (col("_o_present") && !col("_n_present")),
              outRow("_o_", col("_o_from"), ts, lit(false))),
            // opened: added or changed snapshot row
            when(changed || (col("_n_present") && !col("_o_present")),
              outRow("_n_", ts, nullLong, lit(true)))
          ),
          x => x.isNotNull
        ).as("_rows"): _*)
      .select(keyCols.map(col) :+ explode(col("_rows")).as("_r"): _*)
      .select(keyCols.map(col) ++
        (payload ++ metaCols).map(c => col(s"_r.$c").as(c)): _*)

    history
      .filter(!col("is_current"))
      .select((keyCols ++ payload ++ metaCols).map(col): _*)
      .unionByName(emitted)
  }

  /** Point-in-time slice of an SCD2 history: the payload as of `ts`. */
  def asOf(history: DataFrame, ts: Column): DataFrame = {
    val t = ts.cast("long")
    history.filter(
      col("valid_from") <= t && (col("valid_to").isNull || col("valid_to") > t))
  }

  /** Point-in-time join: each fact row picks the dimension version that was
    * valid at ITS OWN timestamp (`tCol`) — the read path that makes an SCD2
    * history useful (training examples see the features as they were, not
    * as they are).
    *
    * Scale shape: an equi-join on the key with the validity range as a
    * post-join filter — NOT a range join. Version count per key is bounded
    * (it is a dimension history), so the equi-join fan-out is a small
    * constant and Catalyst keeps the whole thing a hash join; facts with no
    * valid version at their timestamp are dropped (inner semantics).
    */
  def joinAsOf(
      facts: DataFrame,
      history: DataFrame,
      keyCols: Seq[String],
      tCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val t = col(tCol).cast("long")
    facts
      .join(history, keyCols)
      .filter(col("valid_from") <= t && (col("valid_to").isNull || col("valid_to") > t))
      .drop("valid_from", "valid_to", "is_current")
  }
}
