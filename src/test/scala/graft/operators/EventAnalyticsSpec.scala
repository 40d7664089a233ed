package graft.operators

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("funnel binds each stage to the earliest event strictly after its predecessor") {
    // user 1: click@1 (ignored: no view yet), view@2, click@3, purchase@4 → 3
    // user 2: view@5, purchase@6 (no click in between) → 1
    // user 3: click@7 only → 0
    val ev = Seq(
      (1L, "click", 1L), (1L, "view", 2L), (1L, "click", 3L), (1L, "purchase", 4L),
      (2L, "view", 5L), (2L, "purchase", 6L),
      (3L, "click", 7L)
    ).toDF("u", "y", "t")
    val out = EventAnalytics
      .funnelStages(ev, "u", "y", "t", Seq("view", "click", "purchase"))
      .orderBy("u")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq == Seq((1L, 3), (2L, 1), (3L, 0)))
  }

  test("a same-timestamp successor does not satisfy the strictly-after rule") {
    val ev = Seq((1L, "view", 5L), (1L, "click", 5L)).toDF("u", "y", "t")
    val r = EventAnalytics.funnelStages(ev, "u", "y", "t", Seq("view", "click")).head()
    assert(r.getInt(1) == 1)
  }

  test("repeated stage types chain through distinct timestamps") {
    val ev = Seq((1L, "view", 1L), (1L, "view", 2L), (1L, "view", 3L)).toDF("u", "y", "t")
    val r = EventAnalytics.funnelStages(ev, "u", "y", "t", Seq("view", "view")).head()
    assert(r.getInt(1) == 2 && r.getLong(2) == 1L && r.getLong(3) == 2L)
  }

  test("retention counts each user once per active period against its cohort") {
    // periods of width 10: u1 first in p0, active p0,p2; u2 first in p2, active p2
    val ev = Seq((1L, 5L), (1L, 7L), (1L, 25L), (2L, 21L)).toDF("u", "t")
    val out = EventAnalytics.retentionMatrix(ev, "u", "t", 10L)
      .orderBy("cohort", "offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L, 1L), (0L, 2L, 1L), (2L, 0L, 1L)))
  }

  test("funnel plans a single pre-aggregate exchange on the user key") {
    val ev = Seq((1L, "view", 1L)).toDF("u", "y", "t")
    val p = EventAnalytics.funnelStages(ev, "u", "y", "t", Seq("view", "click"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$p")
    assert(!p.contains("Join"), "funnel must not plan joins")
  }
}
