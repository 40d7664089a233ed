package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private lazy val snap1 = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "s", "v")

  private lazy val snap2 = Seq(
    (1L, "a", 10.0),  // unchanged
    (2L, "b", 99.0),  // changed
    (4L, "d", 40.0)   // added; 3 removed
  ).toDF("k", "s", "v")

  private lazy val hist2 =
    Scd2.applySnapshot(Scd2.init(snap1, lit(100L)), snap2, Seq("k"), lit(200L))

  test("one snapshot application produces exactly the right version rows") {
    val rows = hist2
      .select($"k", $"s", $"v", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, String, Double, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(rows == Set(
      (1L, "a", 10.0, 100L, None, true),         // carried
      (2L, "b", 20.0, 100L, Some(200L), false),  // closed old version
      (2L, "b", 99.0, 200L, None, true),         // opened new version
      (3L, "c", 30.0, 100L, Some(200L), false),  // removed → closed
      (4L, "d", 40.0, 200L, None, true)          // added
    ))
  }

  test("a second application only touches the current slice; asOf slices reproduce each snapshot") {
    val snap3 = Seq((2L, "b", 99.0), (4L, "e", 40.0)).toDF("k", "s", "v")
    val hist3 = Scd2.applySnapshot(hist2, snap3, Seq("k"), lit(300L))
    // closed rows from t=200 pass through byte-identical
    val closedAt200 = hist3.filter($"valid_to" === 200L)
      .as[(Long, String, Double, Long, Option[Long], Boolean)].collect().toSet
    assert(closedAt200 == Set(
      (2L, "b", 20.0, 100L, Some(200L), false),
      (3L, "c", 30.0, 100L, Some(200L), false)))
    def slice(ts: Long): Set[(Long, String, Double)] =
      Scd2.asOf(hist3, lit(ts)).select($"k", $"s", $"v")
        .as[(Long, String, Double)].collect().toSet
    assert(slice(150) == Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    assert(slice(250) == Set((1L, "a", 10.0), (2L, "b", 99.0), (4L, "d", 40.0)))
    assert(slice(350) == Set((2L, "b", 99.0), (4L, "e", 40.0)))
  }

  test("a null <-> literal-\"NULL\" payload transition opens a new version (no sentinel collision)") {
    val s1 = Seq((1L, Option.empty[String]), (2L, Some("NULL"))).toDF("k", "s")
    val s2 = Seq((1L, Some("NULL")), (2L, Option.empty[String])).toDF("k", "s")
    val h = Scd2.applySnapshot(Scd2.init(s1, lit(100L)), s2, Seq("k"), lit(200L))
    val rows = h.select($"k", $"s", $"valid_from", $"is_current")
      .as[(Long, Option[String], Long, Boolean)].collect().toSet
    assert(rows == Set(
      (1L, None, 100L, false), (1L, Some("NULL"), 200L, true),
      (2L, Some("NULL"), 100L, false), (2L, None, 200L, true)))
  }

  test("the reconciliation is one full-outer join; emitted rows come from one explode, not per-class re-joins") {
    val p = hist2.queryExecution.executedPlan.toString
    assert(p.contains("FullOuter"), s"expected one full-outer join:\n$p")
    assert("FullOuter".r.findAllIn(p).size == 1, "exactly one reconciliation join")
    assert(p.toLowerCase.contains("generate"), "output classes must fan out via explode")
  }
}
