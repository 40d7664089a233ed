package graft.operators

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(1.5), "a"), (2L, Some(2.5), "b"), (3L, None, "b"), (4L, Some(2.5), null)
  ).toDF("id", "v", "s")

  test("profile computes counts, NDV, numeric and string extrema per column") {
    val got = Profiler.profile(df, Seq("id", "v", "s"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Option[Double],
           Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 4L, 0L, 4L, Some(1.0), Some(4.0), Some(2.5), None, None)))
    assert(got("v") == (("v", 4L, 1L, 2L, Some(1.5), Some(2.5), Some(2.166667), None, None)))
    assert(got("s") == (("s", 4L, 1L, 2L, None, None, None, Some("a"), Some("b"))))
  }

  test("drift flags null growth, NDV collapse, mean shift, and range widening") {
    val oldDf = Seq((1L, Some(1.0), "a"), (2L, Some(3.0), "b"), (3L, Some(5.0), "c")).toDF("id", "v", "s")
    val newDf = Seq((1L, Some(9.0), "a"), (2L, None, "a"), (3L, Some(5.0), "a")).toDF("id", "v", "s")
    val d = Profiler.drift(
      Profiler.profile(oldDf, Seq("v", "s")), Profiler.profile(newDf, Seq("v", "s")))
      .as[(String, Long, Long, Double, Double, Double, Option[Double], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    val v = d("v")
    assert(v._4 == 0.0 && math.abs(v._5 - 1.0 / 3) < 1e-6, "null fraction moved 0 -> 1/3")
    assert(math.abs(v._6 - 2.0 / 3) < 1e-6, "NDV 3 -> 2")
    assert(v._7.exists(x => math.abs(x - (7.0 - 3.0)) < 1e-6), "mean 3 -> 7")
    assert(v._8, "9.0 exceeds the old max 5.0")
    val sCol = d("s")
    assert(math.abs(sCol._6 - 1.0 / 3) < 1e-6 && !sCol._8, "string NDV collapsed, range within")
  }

  test("profileApprox tracks exact NDV within the configured error and plans no Expand") {
    val big = (1L to 20000L).toDF("id").selectExpr("id", "CAST(id % 977 AS STRING) AS s")
    val approx = Profiler.profileApprox(big, Seq("id", "s"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Option[Double],
           Option[String], Option[String])]
      .collect().map(r => r._1 -> r._4).toMap
    assert(math.abs(approx("id") - 20000.0) / 20000.0 < 0.05, approx.toString)
    assert(math.abs(approx("s") - 977.0) / 977.0 < 0.05, approx.toString)
    val plan = Profiler.profileApprox(big, Seq("id", "s")).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
    val exact = Profiler.profile(big, Seq("id", "s")).queryExecution.executedPlan.toString
    assert(exact.contains("Expand"), "exact multi-distinct is expected to Expand (documented cost)")
  }
}
