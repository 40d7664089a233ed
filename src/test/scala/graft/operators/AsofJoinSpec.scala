package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // One hot key (k=0, 60 rows) + sparse keys; right gaps wider than the
  // small bucket width so the cross-bucket carry path is exercised.
  private lazy val left: DataFrame = (0 until 80).map { i =>
    val k = if (i < 60) 0L else (i % 5).toLong
    (k, (i * 7 + 3).toLong, s"L$i")
  }.toDF("k", "t", "tag")

  private lazy val right: DataFrame = (0 until 25).map { i =>
    val k = if (i < 15) 0L else (i % 5).toLong
    (k, (i * 23).toLong, i * 1.5)
  }.toDF("k", "t", "w")

  private def sortStr(df: DataFrame): Seq[String] =
    df.orderBy("k", "t", "tag").collect().map(_.mkString("|")).toSeq

  test("backward asof picks the latest right row at-or-before each left t") {
    val l = Seq((1L, 10L, "a"), (1L, 4L, "b")).toDF("k", "t", "tag")
    val r = Seq((1L, 4L, 1.0), (1L, 9L, 2.0), (1L, 11L, 3.0)).toDF("k", "t", "w")
    val out = AsofJoin.asof(l, r, Seq("k"), "t", Seq("w"))
      .orderBy("t").select("t", "asofTime", "w").as[(Long, Long, Double)].collect()
    // tie at t=4 is inclusive; t=10 takes 9, not 11
    assert(out.toSeq == Seq((4L, 4L, 1.0), (10L, 9L, 2.0)))
  }

  test("forward asof picks the earliest right row at-or-after, ties inclusive") {
    val l = Seq((1L, 10L, "a"), (1L, 4L, "b"), (1L, 12L, "c")).toDF("k", "t", "tag")
    val r = Seq((1L, 4L, 1.0), (1L, 11L, 3.0)).toDF("k", "t", "w")
    val out = AsofJoin.asof(l, r, Seq("k"), "t", Seq("w"), direction = "forward")
      .orderBy("t").select("t", "asofTime").collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
    assert(out.toSeq == Seq((4L, 4L), (10L, 11L), (12L, -1L)))
  }

  test("tolerance nulls out matches farther than the bound") {
    val l = Seq((1L, 100L, "a"), (1L, 11L, "b")).toDF("k", "t", "tag")
    val r = Seq((1L, 9L, 1.0)).toDF("k", "t", "w")
    val out = AsofJoin.asof(l, r, Seq("k"), "t", Seq("w"), tolerance = Some(5L))
      .orderBy("t").select("w").collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
  }

  test("duplicate right (k,t) rows resolve deterministically to the max payload") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val r = Seq((1L, 9L, 1.0), (1L, 9L, 7.0)).toDF("k", "t", "w")
    val out = AsofJoin.asof(l, r, Seq("k"), "t", Seq("w")).select("w").head()
    assert(out.getDouble(0) == 7.0)
  }

  test("bucketed output is identical to windowed output across widths and directions") {
    for (dir <- Seq("backward", "forward"); width <- Seq(5L, 37L, 1000L)) {
      val a = sortStr(AsofJoin.asof(left, right, Seq("k"), "t", Seq("w"), dir))
      val b = sortStr(AsofJoin.asofBucketed(left, right, Seq("k"), "t", Seq("w"), width, dir))
      assert(a == b, s"dir=$dir width=$width diverged")
    }
  }

  test("bucketed identity holds with tolerance") {
    val a = sortStr(AsofJoin.asof(left, right, Seq("k"), "t", Seq("w"), tolerance = Some(40L)))
    val b = sortStr(
      AsofJoin.asofBucketed(left, right, Seq("k"), "t", Seq("w"), 37L, tolerance = Some(40L)))
    assert(a == b)
  }

  test("windowed plan shuffles once on the key — no join, no cartesian") {
    val p = AsofJoin.asof(left, right, Seq("k"), "t", Seq("w"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "asof must not plan a join")
    // one exchange for the right-side dedup agg + one for the key window;
    // the union itself must not add more
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges:\n$p")
  }

  test("bucketed plan partitions phase 1 by (key, bucket), not by key alone") {
    val p = AsofJoin.asofBucketed(left, right, Seq("k"), "t", Seq("w"), 37L)
      .queryExecution.executedPlan.toString
    assert(p.contains("_asof_bucket"), "bucket column must reach the physical plan")
    assert(!p.contains("CartesianProduct"))
  }
}
