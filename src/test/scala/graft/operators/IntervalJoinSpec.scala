package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = (0 until 2000)
    .map(i => (s"c${i % 3}", (i * 7919L) % 100000L, s"p$i"))
    .toDF("chromosome", "position", "pid")

  // spans from 10 to ~30k: some intervals cross many 5k-bins
  private lazy val intervals = (0 until 300)
    .map { i =>
      val s = (i * 104729L) % 100000L
      (s"c${i % 3}", s, s + 10 + (i % 7) * 5000L, s"iv$i")
    }
    .toDF("chromosome", "start", "end", "ivid")

  test("pointInInterval matches the naive range join exactly") {
    val got = IntervalJoin
      .pointInInterval(points, intervals, binWidth = 5000L)
      .select("pid", "ivid").as[(String, String)].collect().toSet
    val want = points
      .join(intervals, Seq("chromosome"))
      .filter(col("position") >= col("start") && col("position") <= col("end"))
      .select("pid", "ivid").as[(String, String)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("intervalOverlap finds each overlapping pair exactly once") {
    val b = (0 until 200)
      .map { j =>
        val s = (j * 7541L) % 100000L
        (s"c${j % 3}", s, s + 100 + (j % 5) * 8000L, s"b$j")
      }
      .toDF("chromosome", "start", "end", "ivid")
    val got = IntervalJoin
      .intervalOverlap(intervals, b, binWidth = 5000L)
      .select("ivid", "ivid_b").as[(String, String)].collect().toList
    val want = intervals
      .join(
        b.withColumnRenamed("start", "s2").withColumnRenamed("end", "e2")
          .withColumnRenamed("ivid", "ivid_b"),
        Seq("chromosome"))
      .filter(col("start") <= col("e2") && col("s2") <= col("end"))
      .select("ivid", "ivid_b").as[(String, String)].collect().toList
    assert(got.toSet == want.toSet && want.nonEmpty)
    assert(got.size == got.toSet.size, "pairs must be emitted exactly once (bin dedup)")
    assert(got.size == want.size)
  }

  test("the join is an equi shuffle on (chromosome, bin), never a cartesian") {
    val p = IntervalJoin.pointInInterval(points, intervals, binWidth = 5000L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"range predicate must ride an equi join:\n$p")
    assert(p.contains("_bin"), "bin key must reach the physical join")
  }

  test("degenerate binWidth fails loudly") {
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(points, intervals, binWidth = 0L)
    }
  }
}
