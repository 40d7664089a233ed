package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured Streaming extensions — beyond the (batch-only) reference: the
  * same operators running incrementally.
  *
  *   - [[streamTable]]: file-source streaming ingest with a declared schema;
  *     new files under a prefix are picked up per micro-batch, so summary
  *     statistics land incrementally through the exact batch transforms.
  *   - [[sessionizeStream]]: watermarked session-window aggregation — the
  *     streaming twin of [[graft.operators.Sessionize]].
  *   - [[runningStudyStats]]: custom per-key state with mapGroupsWithState
  *     (running per-study aggregates surviving across micro-batches).
  */
object StreamingOps {

  /** File-source streaming read with a declared schema (parquet/csv/json). */
  def streamTable(
      spark: SparkSession,
      path: String,
      schema: StructType,
      format: String = "parquet",
      options: Map[String, String] = Map.empty
  ): DataFrame =
    spark.readStream.schema(schema).options(options).format(format).load(path)

  /** Gap-based streaming sessionization: event-time session windows closed by
    * the watermark; per-session aggregates stream out as sessions finalise.
    */
  def sessionizeStream(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("value_sum")
      )
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"),
        col("value_sum")
      )

  /** Watermarked STREAM-STREAM attribution join: each conversion pairs with
    * the views of the same user in the `window` before it — the classic
    * click/conversion attribution as a live pipeline. Both sides carry
    * watermarks and the join condition bounds event-time distance, so the
    * engine can expire view state once `view_ts + window` falls behind the
    * conversion watermark — state stays proportional to the window, not the
    * stream. Batch twin: the same time-range join as a static interval
    * join.
    *
    * @param views       streaming frame `(user_id, ts, ...viewCols)`
    * @param conversions streaming frame `(user_id, ts, ...convCols)`
    */
  def attributionJoinStream(
      views: DataFrame,
      conversions: DataFrame,
      window: String = "1 hour",
      watermark: String = "30 minutes"
  ): DataFrame = {
    val v = views
      .select(col("user_id"), col("ts").as("view_ts"), col("value").as("view_value"))
      .withWatermark("view_ts", watermark)
    val c = conversions
      .select(col("user_id"), col("ts").as("conv_ts"), col("value").as("conv_value"))
      .withWatermark("conv_ts", watermark)
    c.as("c")
      .join(
        v.as("v"),
        expr(s"""
          c.user_id = v.user_id AND
          v.view_ts <= c.conv_ts AND
          v.view_ts >= c.conv_ts - INTERVAL $window
        """))
      .select(
        col("c.user_id").as("user_id"),
        col("v.view_ts"), col("c.conv_ts"),
        col("v.view_value"), col("c.conv_value"))
  }

  /** Streaming exact deduplication for ingest pipelines: drop repeats of a
    * content key within the watermark horizon (`dropDuplicatesWithinWatermark`
    * keeps state bounded — the batch twin is the hash-groupBy exact dedup).
    * `keyCols` is typically a content hash (md5 of the document text) so
    * state per key is a few bytes; at 100 TB/day the horizon bounds state to
    * the chosen window instead of the full corpus.
    */
  def dedupStream(
      docs: DataFrame,
      keyCols: Seq[String],
      eventTimeCol: String = "ts",
      watermark: String = "1 hour"
  ): DataFrame =
    docs
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class BandedDoc(band: Int, bandHash: String, docId: Long)

  /** [[BandedDoc]] plus the document's event time — the input shape for the
    * event-time-TTL variant ([[nearDupCandidatesStreamEventTime]]).
    */
  final case class BandedDocTs(band: Int, bandHash: String, docId: Long, ts: Timestamp)
  final case class BucketState(docIds: List[Long])
  final case class CandidatePair(lDoc: Long, rDoc: Long)

  /** Incremental near-duplicate candidate detection: the streaming twin of
    * [[graft.operators.Dedup.candidatePairs]]. Documents arrive banded
    * (MinHash → LSH band hashes, a stateless per-row projection via
    * [[graft.operators.TextOps.minhashSignature]]/`lshBands` + explode);
    * state is kept PER BUCKET (band, bandHash), and each arriving document
    * emits a candidate pair against every doc already in its bucket, exactly
    * once, as it arrives.
    *
    * State growth: duplicate-heavy buckets are the only ones that grow, and
    * `maxBucketSize` caps each (oldest ids retained, matching the batch
    * keep-lowest-id convention; beyond the cap new arrivals still pair
    * against the retained representatives, so recall degrades only for
    * clusters larger than the cap). At 100 TB/day the bucket key space is
    * ~(bands × 2^sig-bits) — state is proportional to observed near-dup
    * mass, not corpus size. For long-running streams pass `stateTtl` (e.g.
    * "24 hours") to expire idle buckets via processing-time timeout: recall
    * then degrades only for near-dup pairs separated by more than the TTL,
    * which is the standard freshness/state trade at this scale.
    *
    * Delivery note: "exactly once per pair per bucket" holds for RETAINED
    * docs (the `cur.contains` guard). A doc arriving at an already-full
    * bucket is never added to state, so an at-least-once redelivery of that
    * doc re-emits its candidate pairs; downstream
    * `dropDuplicatesWithinWatermark` on (lDoc, rDoc) — already required for
    * the cross-band collapse below — absorbs these too.
    */
  /** The per-bucket state transition driven by [[nearDupCandidatesStream]] —
    * named (not an inline lambda) so timeout semantics are unit-testable
    * with `TestGroupState` (a live `processAllAvailable` never quiesces
    * under ProcessingTimeTimeout: the engine keeps scheduling batches while
    * any timeout is configured).
    */
  def bucketUpdate(maxBucketSize: Int, stateTtl: Option[String])(
      key: (Int, String),
      rows: Iterator[BandedDoc],
      state: GroupState[BucketState]
  ): Iterator[CandidatePair] =
    bucketUpdateCore(maxBucketSize, rows.map(_.docId), state,
      s => stateTtl.foreach(s.setTimeoutDuration))

  /** Event-time twin of [[bucketUpdate]] (driven by
    * [[nearDupCandidatesStreamEventTime]]): the bucket expires when the
    * WATERMARK — not the wall clock — passes last-activity + ttl, so state
    * expiry is data-driven. This is the contract replay/backfill needs: a
    * reprocessing run chews through days of event time in minutes of
    * processing time, and a processing-time TTL would either never fire or
    * evict buckets that are still within their event-time horizon.
    *
    * The timer anchors on the bucket's LAST ACTIVITY in event time (the
    * max row ts of this invocation), not on the current watermark: a
    * watermark that lags the data (always true for a fresh stream, where
    * it starts at epoch) would otherwise expire state ttl-after-watermark
    * — long before ttl has elapsed in data time. The watermark is only a
    * floor (Spark requires the timer to sit above it).
    */
  def bucketUpdateEventTime(maxBucketSize: Int, ttlMillis: Long)(
      key: (Int, String),
      rows: Iterator[BandedDocTs],
      state: GroupState[BucketState]
  ): Iterator[CandidatePair] = {
    // maxTs is only read AFTER the core has drained the iterator (the
    // timeout callback runs post-fold), so the lazy map is safe
    var maxTs = Long.MinValue
    bucketUpdateCore(
      maxBucketSize,
      rows.map { d =>
        if (d.ts.getTime > maxTs) maxTs = d.ts.getTime
        d.docId
      },
      state,
      s => s.setTimeoutTimestamp(
        math.max(maxTs, s.getCurrentWatermarkMs()) + ttlMillis))
  }

  private def bucketUpdateCore(
      maxBucketSize: Int,
      docIds: Iterator[Long],
      state: GroupState[BucketState],
      setTimeout: GroupState[BucketState] => Unit
  ): Iterator[CandidatePair] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val seen = state.getOption.map(_.docIds).getOrElse(Nil)
      // membership probes go through a local hash set (state keeps the List
      // for encoder stability/ordering): the fold is O(arrivals) instead of
      // O(arrivals × cap), which matters the day the cap is raised
      val seenSet = scala.collection.mutable.HashSet.from(seen)
      val (pairs, finalSeen) =
        docIds.foldLeft((List.empty[CandidatePair], seen)) {
          case ((acc, cur), docId) if !seenSet.contains(docId) =>
            val newPairs = cur.map(other =>
              CandidatePair(math.min(other, docId), math.max(other, docId)))
            val kept =
              if (seenSet.size < maxBucketSize) { seenSet += docId; docId :: cur }
              else cur
            (newPairs reverse_::: acc, kept)
          case ((acc, cur), _) => (acc, cur)
        }
      state.update(BucketState(finalSeen))
      setTimeout(state)
      pairs.distinct.iterator
    }

  def nearDupCandidatesStream(
      banded: Dataset[BandedDoc],
      maxBucketSize: Int = 64,
      stateTtl: Option[String] = None
  ): Dataset[CandidatePair] = {
    import banded.sparkSession.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey(d => (d.band, d.bandHash))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        bucketUpdate(maxBucketSize, stateTtl))
    // NOTE: a pair sharing k bands surfaces up to k times (once per bucket).
    // The batch twin collapses these with a global distinct; streaming
    // callers should instead dedup within their downstream watermark
    // (dropDuplicatesWithinWatermark on (lDoc, rDoc)) — an unbounded global
    // distinct would grow state with every pair ever emitted.
  }

  /** Event-time-TTL variant of [[nearDupCandidatesStream]] for
    * replay/backfill: bucket state expires when the WATERMARK passes
    * last-activity + `stateTtl`, so a reprocessing run that chews through
    * days of event time in minutes of wall clock evicts state at the same
    * event-time horizon the live run would (recall degrades only for
    * near-dup pairs separated by more than the TTL in EVENT time). The
    * live-stream twin keeps ProcessingTimeTimeout; this one requires the
    * input to carry event time (`ts`) and declares the watermark itself.
    */
  def nearDupCandidatesStreamEventTime(
      banded: Dataset[BandedDocTs],
      maxBucketSize: Int = 64,
      stateTtl: java.time.Duration = java.time.Duration.ofHours(24),
      watermark: String = "1 hour"
  ): Dataset[CandidatePair] = {
    import banded.sparkSession.implicits._
    banded
      .withWatermark("ts", watermark)
      .groupByKey(d => (d.band, d.bandHash))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        bucketUpdateEventTime(maxBucketSize, stateTtl.toMillis))
  }

  final case class AnnResult(qId: Long, neighborId: Long, cos: Double)

  /** Streaming ANN lookup: an incoming query-vector stream searched against
    * a static IVF-bucketed corpus — the online twin of
    * [[graft.operators.Similarity.annTopK]] (route each incoming document
    * against an indexed corpus before admission, e.g. online semantic-dedup
    * triage). Cell assignment of the stream side is the same zero-exchange
    * codegen argmax projection (stateless, so it runs per micro-batch
    * unchanged); the candidate join is a stream-static equi join on the
    * cell id (the static side should be a persisted
    * [[graft.operators.Similarity.ivfAssign]] output so each batch probes
    * a ready frame); the per-query top-k runs as flatMapGroupsWithState in
    * append mode, because window functions are unavailable on streams.
    *
    * State: NONE retained (NoTimeout, never updated) — a query's candidates
    * all surface in its own micro-batch, so the group step only ranks
    * within the batch and long-running streams hold no per-query state.
    * Output matches the batch twin exactly: cos desc / neighbor-id asc,
    * rounded half-up to 6 dp.
    */
  def annTopKStream(
      queries: DataFrame,
      assignedCorpus: DataFrame,
      centroids: DataFrame,
      k: Int
  ): Dataset[AnnResult] = {
    import queries.sparkSession.implicits._
    annStreamCandidates(queries, assignedCorpus, centroids)
      .as[AnnResult]
      .groupByKey(_.qId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[AnnResult], _: GroupState[Int]) =>
          rows.toSeq
            .sortBy(r => (-r.cos, r.neighborId))
            .take(k)
            .map(r =>
              r.copy(cos =
                BigDecimal(r.cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
            .iterator
      }
  }

  /** The candidate frame both the streaming lookup and its batch twin rank:
    * zero-exchange cell assignment of the query side, equi join on the cell
    * id against the pre-assigned corpus, exact cosine per candidate.
    */
  private def annStreamCandidates(
      queries: DataFrame,
      assignedCorpus: DataFrame,
      centroids: DataFrame
  ): DataFrame = {
    val Similarity = graft.operators.Similarity
    val q = Similarity.ivfAssign(queries, centroids).select(
      col("vec_id").as("qId"),
      Similarity.asDouble(col("embedding")).as("q_emb"),
      col("bucket"))
    val c = assignedCorpus.select(
      col("vec_id").as("neighborId"),
      Similarity.asDouble(col("embedding")).as("c_emb"),
      col("bucket"))
    q.join(c, Seq("bucket"))
      .filter(col("qId") =!= col("neighborId"))
      .select(
        col("qId"),
        col("neighborId"),
        Similarity.cosine(col("q_emb"), col("c_emb")).as("cos"))
  }

  /** Batch projection of [[annTopKStream]] — the same candidate plan the
    * stream executes per micro-batch, ranked with a window instead of
    * flatMapGroupsWithState (windows are fine in batch). DuckDB-expressible,
    * so this is the oracle surface for the streaming twin; StreamingOpsSpec
    * pins stream output == this frame.
    */
  def annTopKStreamTwin(
      queries: DataFrame,
      assignedCorpus: DataFrame,
      centroids: DataFrame,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    annStreamCandidates(queries, assignedCorpus, centroids)
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col("qId")).orderBy(col("cos").desc, col("neighborId"))))
      .filter(col("rn") <= k)
      .select(col("qId"), col("neighborId"), round(col("cos"), 6).as("cos"))
  }

  final case class StudyEvent(studyId: String, beta: Double)
  final case class StudyState(n: Long, sumBeta: Double)
  final case class StudyStats(studyId: String, n: Long, meanBeta: Double)

  /** Running per-study statistics with explicit state — the
    * `mapGroupsWithState` pattern for aggregates that must survive across
    * micro-batches without recomputation.
    */
  def runningStudyStats(
      events: Dataset[StudyEvent]
  ): Dataset[StudyStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.studyId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (studyId: String, rows: Iterator[StudyEvent], state: GroupState[StudyState]) =>
          val prev = state.getOption.getOrElse(StudyState(0L, 0.0))
          val (n, s) = rows.foldLeft((prev.n, prev.sumBeta)) {
            case ((cn, cs), e) => (cn + 1, cs + e.beta)
          }
          state.update(StudyState(n, s))
          StudyStats(studyId, n, s / n)
      }
  }

  final case class ChangeRec(key: String, op: String, value: Double)
  final case class AggState(cnt: Long, sum: Double)
  final case class AggRow(key: String, cnt: Long, sum: Double)

  /** Streaming twin of [[graft.operators.IncrementalAgg]]: fold a CDC
    * change stream (`op` ∈ add|remove; a changed row arrives as
    * remove(old) + add(new)) into per-key count/sum state — the same
    * algebra the batch merge applies, held in `mapGroupsWithState` instead
    * of a state table. Emits the updated aggregate row per key per batch.
    */
  def incrementalAggStream(changes: Dataset[ChangeRec]): Dataset[AggRow] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[ChangeRec], state: GroupState[AggState]) =>
          val prev = state.getOption.getOrElse(AggState(0L, 0.0))
          val (c, s) = rows.foldLeft((prev.cnt, prev.sum)) {
            case ((cc, cs), r) =>
              val sign = if (r.op == "remove") -1 else 1
              (cc + sign, cs + sign * r.value)
          }
          state.update(AggState(c, s))
          AggRow(key, c, s)
      }
  }

  /** Batch relational twin of [[incrementalAggStream]]'s state fold — the
    * oracle surface for the streaming incremental-aggregate semantics
    * (the [[scd2VersionFoldTwin]] pattern): given the full change log as a
    * static frame (`key`, `op` ∈ add|remove, `value`), produce the final
    * per-key state a sink reconstructs by keeping the latest AggRow per
    * key. The fold is order-free (count/sum are abelian), so the twin is
    * one map-side-combinable signed aggregation.
    */
  def incrementalAggFoldTwin(changes: DataFrame): DataFrame = {
    val sign = when(col("op") === "remove", lit(-1L)).otherwise(lit(1L))
    changes
      .groupBy("key")
      .agg(
        sum(sign).as("cnt"),
        sum(sign.cast("double") * col("value")).as("sum"))
  }

  final case class Scd2Change(key: String, op: String, payload: String, value: Double, ts: Long)
  final case class VersionState(payload: String, value: Double, from: Long)
  final case class VersionRow(
      key: String, payload: String, value: Double,
      valid_from: Long, valid_to: Option[Long], is_current: Boolean)

  /** Streaming twin of [[graft.operators.Scd2]]: a CDC change stream
    * (`op` ∈ upsert|delete, each carrying its batch timestamp) folds into
    * SCD2 version rows live. Closed versions are emitted exactly once (they
    * are immutable history); the open version is re-emitted whenever it
    * changes — a sink keeping the latest row per `(key, valid_from)`
    * reconstructs the same table the batch fold produces.
    */
  def scd2Stream(changes: Dataset[Scd2Change]): Dataset[VersionRow] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Scd2Change], state: GroupState[VersionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[VersionRow]
          var cur = state.getOption
          rows.toSeq.sortBy(c => (c.ts, c.op)).foreach { c =>
            (c.op, cur) match {
              case ("delete", Some(v)) =>
                out += VersionRow(key, v.payload, v.value, v.from, Some(c.ts), is_current = false)
                cur = None
              case ("delete", None) => // no-op
              case (_, Some(v)) if v.payload == c.payload && v.value == c.value => // unchanged
              case (_, maybe) =>
                maybe.foreach { v =>
                  out += VersionRow(key, v.payload, v.value, v.from, Some(c.ts), is_current = false)
                }
                cur = Some(VersionState(c.payload, c.value, c.ts))
                out += VersionRow(key, c.payload, c.value, c.ts, None, is_current = true)
            }
          }
          cur match {
            case Some(v) => state.update(v)
            case None => state.remove()
          }
          out.iterator
      }
  }

  /** Batch relational twin of [[scd2Stream]]'s version fold — the oracle
    * surface for the streaming SCD2 semantics (same pattern as
    * [[annTopKStreamTwin]]): given the full CDC change log as a static
    * frame (`key`, `op` ∈ upsert|delete, `payload`, `value`, `ts`), produce
    * exactly the version table a sink reconstructs from the stream by
    * keeping the latest row per (key, valid_from).
    *
    * The sequential fold is expressible with two windows because the open
    * version after processing row i−1 is a function of row i−1 ALONE: an
    * upsert leaves (payload, value) of row i−1 open (whether it opened a
    * version or was an unchanged no-op — the values are identical either
    * way), a delete leaves nothing open. So a row opens a version iff it is
    * an upsert whose raw lag differs (or was a delete / start-of-key), a
    * delete closes one iff its raw lag was an upsert, and each version's
    * valid_to is the next opener-or-closer's ts. Shuffles once on `key`;
    * both windows share that partitioning.
    */
  def scd2VersionFoldTwin(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy("key").orderBy(col("ts"), col("op"))
    val marked = changes
      .withColumn(
        "prev", lag(struct(col("op"), col("payload"), col("value")), 1).over(byKey))
      .withColumn(
        "opens",
        // null-safe change detection: a CDC upsert carrying a NULL payload
        // or value must still open a version (plain =!= evaluates to SQL
        // NULL and would silently drop the row; scd2Stream's Scala == fold
        // treats nulls as ordinary values, and the twin must match it)
        col("op") === "upsert" && (col("prev").isNull ||
          col("prev.op") === "delete" ||
          !(col("prev.payload") <=> col("payload")) ||
          !(col("prev.value") <=> col("value"))))
      // prev-null deletes fall out as SQL null here, which the marker
      // filter drops — a delete with nothing open is a no-op, like the fold
      .withColumn("closes", col("op") === "delete" && col("prev.op") === "upsert")
    marked
      .filter(col("opens") || col("closes"))
      .withColumn("valid_to", lead(col("ts"), 1).over(byKey))
      .filter(col("opens"))
      .select(
        col("key"), col("payload"), col("value"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  final case class FunnelEvent(userId: Long, eventType: String, t: Long)
  final case class FunnelState(slots: List[Option[Long]])
  final case class FunnelProgress(
      userId: Long, stageReached: Int, stageTs: List[Option[Long]])

  /** The k-slot funnel state machine shared by the streaming twin and
    * [[funnelUpdate]] unit tests: events applied in time order against a
    * snapshot of the previous slots (stage i fills only when stage i−1 was
    * already set by an EARLIER event — identical to the batch
    * `EventAnalytics.funnelStages` fold).
    */
  def funnelUpdate(stages: Seq[String])(
      userId: Long,
      rows: Iterator[FunnelEvent],
      state: GroupState[FunnelState]
  ): FunnelProgress = {
    val init = state.getOption.getOrElse(FunnelState(List.fill(stages.length)(None)))
    val slots = rows.toSeq.sortBy(e => (e.t, e.eventType)).foldLeft(init.slots) {
      (st, e) =>
        st.indices.map { i =>
          st(i).orElse {
            if (stages(i) == e.eventType &&
              (i == 0 || st(i - 1).exists(_ < e.t))) Some(e.t)
            else None
          }
        }.toList
    }
    state.update(FunnelState(slots))
    FunnelProgress(userId, slots.count(_.isDefined), slots)
  }

  /** Streaming funnel progression: per-user `mapGroupsWithState` twin of
    * the batch sorted fold. Each micro-batch emits the user's CURRENT
    * funnel stage; under time-ordered delivery (per user) the final emitted
    * row per user is identical to the batch operator — the spec pins this.
    * Out-of-order arrivals across batches cannot retro-fill an earlier
    * stage (the state machine is monotone), matching how a first-touch
    * funnel must behave on an append-only stream.
    */
  def funnelStream(
      events: Dataset[FunnelEvent],
      stages: Seq[String]
  ): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    events
      .filter(e => stages.contains(e.eventType))
      .groupByKey(_.userId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(funnelUpdate(stages))
  }
}
