package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Event-stream analytics over the `events` table family (beyond-reference,
  * the sessionize/asof companion set): ordered funnel progression and
  * cohort retention.
  */
object EventAnalytics {

  /** k-stage ordered funnel in ONE shuffle.
    *
    * For each user, stage i counts as reached when an event of type
    * `stages(i)` occurs STRICTLY after the event that reached stage i−1
    * (first-touch semantics: each stage binds to its earliest valid time).
    * Computed as a per-user sorted fold — collect the user's events once,
    * sort in-array, and run a k-slot state machine inside an `aggregate`
    * HOF: slot i holds the stage-i timestamp, an event fills the first
    * unset slot whose predecessor is already set. One shuffle on the user
    * key, no k-pass self-joins (the naive formulation is k chained
    * join+min rounds over the full stream).
    *
    * The accumulator is a constant-k array (k = stages.length), so the
    * element_at references inside the lambda are O(k²) per event with k a
    * small literal — not an O(n) subtree over the iterated array.
    *
    * Per-user state is bounded by that user's event count; for
    * pathological hot users, pre-filter to the stage types (done here —
    * only events whose type appears in `stages` are collected).
    *
    * @return one row per user: `stage_reached` (0..k) and `stage_ts_1..k`
    */
  def funnelStages(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      timeCol: String,
      stages: Seq[String]
  ): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    val k = stages.length
    val stageArr = array(stages.map(lit): _*)
    val ev = events
      .filter(col(typeCol).isin(stages.distinct: _*))
      .select(
        col(userCol),
        struct(col(timeCol).cast("long").as("t"), col(typeCol).as("y")).as("e"))
    val init = array_repeat(lit(null).cast("long"), k)
    val folded = ev
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
      .withColumn(
        "slots",
        aggregate(
          col("evs"),
          init,
          (st: Column, e: Column) =>
            transform(st, (v: Column, i: Column) =>
              coalesce(
                v,
                when(
                  e.getField("y") === element_at(stageArr, i + 1) &&
                    (i === 0 ||
                      (element_at(st, i).isNotNull &&
                        e.getField("t") > element_at(st, i))),
                  e.getField("t"))))))
    val stageCols = (1 to k).map(i =>
      element_at(col("slots"), i).as(s"stage_ts_$i"))
    folded.select(
      (col(userCol) +:
        size(filter(col("slots"), (v: Column) => v.isNotNull)).as("stage_reached") +:
        stageCols): _*)
  }

  /** Cohort retention matrix: users bucketed by their first-activity period,
    * counted once per (cohort, offset) they were active in.
    *
    * Plan: ONE groupBy(user) computes the cohort (min period) and the
    * distinct active-period set together — no first-touch join at all —
    * then the exploded (cohort, offset) pairs feed the final small
    * (cohorts × offsets) aggregate. Per-user state is the distinct-period
    * set, bounded by the observation window / periodLength, not by event
    * count.
    *
    * @param periodLength cohort/activity bucket width in `timeCol` units
    */
  def retentionMatrix(
      events: DataFrame,
      userCol: String,
      timeCol: String,
      periodLength: Long
  ): DataFrame = {
    require(periodLength > 0, s"periodLength must be positive, got $periodLength")
    val t = col(timeCol).cast("long")
    events
      .select(col(userCol), floor(t / periodLength).cast("long").as("period"))
      .groupBy(col(userCol))
      .agg(
        min(col("period")).as("cohort"),
        collect_set(col("period")).as("periods"))
      .select(col("cohort"), explode(col("periods")).as("period"))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("active_users"))
  }
}
