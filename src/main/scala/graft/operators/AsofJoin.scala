package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of (nearest-event) joins — an operator Spark's relational surface
  * lacks. For every left row `(keys, t)` find the single right row with the
  * greatest right time ≤ t (backward; ties inclusive), or the smallest
  * right time ≥ t (forward), optionally bounded by a tolerance.
  *
  * Built as a UNION + single per-key window pass instead of a range join:
  * tag both sides, sort `(t, side)` within each key partition, and let
  * `last(rightPayload, ignoreNulls)` carry the most recent right row onto
  * each left row. One shuffle on the key columns, no join, no row
  * amplification — the naive alternative (`l JOIN r ON l.t >= r.t` +
  * max-per-group) is O(|L|·|R|) per key and collapses at scale.
  *
  * For skewed/hot keys [[asofBucketed]] splits every key's timeline into
  * fixed-width time buckets: a bucket-local window pass (shuffle on
  * `(keys, bucket)` — finer than the key, so a hot key spreads over
  * executors) plus a bucket-summary carry join (one row per non-empty
  * `(keys, bucket)`) that forwards the last right row across bucket
  * boundaries. Output is identical to [[asof]] (spec-pinned).
  *
  * Right rows are deduplicated on `(keys, t)` (keeping the max payload
  * struct) so results are deterministic under equal timestamps.
  *
  * Time must be an integral column (epoch seconds/micros); convert
  * timestamps with `unix_micros` first (TIMESTAMP_NTZ needs a cast to
  * TimestampType, session tz UTC).
  */
object AsofJoin {

  private val SideCol = "_asof_side"
  private val TimeCol = "_asof_time"
  private val MatchCol = "_asof_match"

  /** Windowed as-of join.
    *
    * @param left        probe side; all its columns are preserved
    * @param right       build side; only `keyCols`, `timeCol`, `payloadCols`
    *                    are read
    * @param keyCols     equality keys present on both sides
    * @param timeCol     integral event-time column present on both sides
    * @param payloadCols right columns carried onto the matched left row
    *                    (null when unmatched); emitted under their own names
    *                    plus `asofTime` (matched right time)
    * @param direction   "backward" (right.t ≤ left.t) or "forward"
    * @param tolerance   max |left.t − right.t|; farther matches become null
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      payloadCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None
  ): DataFrame = {
    val (l, r, sign) = oriented(left, right, keyCols, timeCol, payloadCols, direction)
    val u = tagAndUnion(l, r, keyCols, payloadCols)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(TimeCol).asc, col(SideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn(MatchCol, last(col("_asof_right"), ignoreNulls = true).over(w))
    finish(matched, left.columns.toSeq, payloadCols, sign, tolerance)
  }

  /** Bucketed as-of join — identical output to [[asof]], built for skewed
    * keys: phase 1 resolves matches inside fixed-width time buckets
    * (`(keys, bucket)` partitioning), phase 2 carries each bucket's last
    * right row forward via a window over the per-bucket summary frame and
    * joins it back, so a left row whose predecessor lives many buckets back
    * still resolves without any key-global sort.
    *
    * @param bucketWidth time-bucket width in `timeCol` units; pick it so a
    *                    single `(key, bucket)` cell fits one task (e.g. an
    *                    hour of events for a hot entity)
    */
  def asofBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      payloadCols: Seq[String],
      bucketWidth: Long,
      direction: String = "backward",
      tolerance: Option[Long] = None
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val (l, r, sign) = oriented(left, right, keyCols, timeCol, payloadCols, direction)
    val u = tagAndUnion(l, r, keyCols, payloadCols)
      // floor-div keeps negative (forward-negated) times in contiguous buckets
      .withColumn("_asof_bucket", floor(col(TimeCol) / bucketWidth).cast("long"))
    val bucketKeys = keyCols :+ "_asof_bucket"

    // Phase 1: bucket-local resolution (shuffle on (keys, bucket)).
    val localW = Window
      .partitionBy(bucketKeys.map(col): _*)
      .orderBy(col(TimeCol).asc, col(SideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.withColumn("_asof_local", last(col("_asof_right"), ignoreNulls = true).over(localW))

    // Phase 2: per-bucket summary → carry the last right row of every
    // earlier bucket onto this one. max over the (time, payload) struct is
    // ordered by its first field, so it IS the bucket's latest right row.
    val summary = u
      .filter(col(SideCol) === 0)
      .groupBy(bucketKeys.map(col): _*)
      .agg(max(col("_asof_right")).as("_bucket_last"))
    // Buckets seen by ANY side matter: a left-only bucket must still
    // receive a carry row, so key the carry frame on the union of observed
    // buckets, not just the right-occupied ones.
    val allBuckets = u.select(bucketKeys.map(col): _*).distinct()
    val carryAll = {
      val cw = Window
        .partitionBy(keyCols.map(col): _*)
        .orderBy(col("_asof_bucket").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      allBuckets
        .join(
          summary.withColumnRenamed("_bucket_last", "_sum_last"),
          bucketKeys,
          "left")
        .withColumn("_prev_incl", last(col("_sum_last"), ignoreNulls = true).over(cw))
        // carry-in at bucket START = last right row of any STRICTLY earlier
        // bucket: shift the inclusive scan by one bucket row
        .withColumn(
          "_asof_carry",
          lag(col("_prev_incl"), 1).over(
            Window.partitionBy(keyCols.map(col): _*).orderBy(col("_asof_bucket").asc)))
        .select((bucketKeys.map(col) :+ col("_asof_carry")): _*)
    }

    val matched = local
      .join(carryAll, bucketKeys, "left")
      .withColumn(MatchCol, coalesce(col("_asof_local"), col("_asof_carry")))
    finish(matched, left.columns.toSeq, payloadCols, sign, tolerance)
  }

  /** Normalise direction by negating time for the forward case; dedupe the
    * right side on (keys, t) for determinism.
    */
  private def oriented(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      payloadCols: Seq[String],
      direction: String
  ): (DataFrame, DataFrame, Int) = {
    val sign = direction match {
      case "backward" => 1
      case "forward"  => -1
      case other      => throw new IllegalArgumentException(
        s"direction must be 'backward' or 'forward', got '$other'")
    }
    val rDedup = right
      .groupBy((keyCols.map(col) :+ col(timeCol).as(timeCol)): _*)
      .agg(max(struct(payloadCols.map(col): _*)).as("_asof_payload"))
    val l = left.withColumn(TimeCol, col(timeCol).cast("long") * sign)
    val r = rDedup.withColumn(TimeCol, col(timeCol).cast("long") * sign)
    (l, r, sign)
  }

  /** Tagged union: left keeps all its columns; right contributes one struct
    * `(t, payload)` so `last(ignoreNulls)` moves whole rows atomically.
    */
  private def tagAndUnion(
      l: DataFrame,
      r: DataFrame,
      keyCols: Seq[String],
      payloadCols: Seq[String]
  ): DataFrame = {
    val rightStruct = struct(
      col(TimeCol).as("t"),
      col("_asof_payload").as("p"))
    val rTagged = r.select(
      (keyCols.map(col) :+ col(TimeCol) :+ lit(0).as(SideCol) :+
        rightStruct.as("_asof_right")): _*)
    val leftExtras = l.columns.filterNot(c => keyCols.contains(c) || c == TimeCol)
    val lTagged = l.select(
      (keyCols.map(col) :+ col(TimeCol) :+ lit(1).as(SideCol) :+
        lit(null).cast(rTagged.schema("_asof_right").dataType).as("_asof_right") :+
        struct(leftExtras.map(col): _*).as("_asof_left")): _*)
    val rAligned = rTagged.withColumn(
      "_asof_left", lit(null).cast(lTagged.schema("_asof_left").dataType))
    lTagged.unionByName(rAligned)
  }

  /** Keep left rows, enforce tolerance, flatten the matched struct. */
  private def finish(
      matched: DataFrame,
      leftCols: Seq[String],
      payloadCols: Seq[String],
      sign: Int,
      tolerance: Option[Long]
  ): DataFrame = {
    val inTol = tolerance match {
      case Some(tol) => abs(col(TimeCol) - col(MatchCol).getField("t")) <= tol
      case None      => lit(true)
    }
    val kept = matched
      .filter(col(SideCol) === 1)
      .withColumn(MatchCol, when(col(MatchCol).isNotNull && inTol, col(MatchCol)))
    val leftRestored = leftCols.map { c =>
      if (kept.columns.contains(c)) col(c)
      else col("_asof_left").getField(c).as(c)
    }
    val out = leftRestored ++
      Seq((col(MatchCol).getField("t") * sign).cast("long").as("asofTime")) ++
      payloadCols.map(p => col(MatchCol).getField("p").getField(p).as(p))
    kept.select(out: _*)
  }
}
