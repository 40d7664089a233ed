package graft.operators

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private lazy val oldSnap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, Option.empty[String].orNull, 40.0)
  ).toDF("k", "s", "v")

  private lazy val newSnap = Seq(
    (1L, "a", 10.0),      // unchanged
    (2L, "b", 99.0),      // changed value
    (4L, "d", 40.0),      // null → value change
    (5L, "e", 50.0)       // added
  ).toDF("k", "s", "v")   // 3 removed

  test("diff classifies added/removed/changed/unchanged exactly, null-safely") {
    val got = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("SQL NULL vs the literal string \"NULL\" is a change, not a sentinel collision") {
    val o = Seq((1L, Option.empty[String]), (2L, Some("NULL"))).toDF("k", "s")
    val n = Seq((1L, Some("NULL")), (2L, Option.empty[String])).toDF("k", "s")
    val got = SnapshotDiff.diff(o, n, Seq("k")).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed", 2L -> "changed"))
  }

  test("diffSummary counts per kind; compareCols restricts the payload") {
    val m = SnapshotDiff.diffSummary(oldSnap, newSnap, Seq("k"), compareCols = Seq("v"))
      .as[(String, Long)].collect().toMap
    // on v alone: k=4 is unchanged (40.0 == 40.0)
    assert(m == Map("unchanged" -> 2L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L))
  }

  test("the diff is one full-outer hash join on the key — no payload-wide compare tree") {
    val p = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(p.contains("FullOuter"), s"expected a full-outer join:\n$p")
    assert(p.contains("_old_hash") && p.contains("_new_hash"),
      "payload must collapse to one hash column per side")
  }
}
