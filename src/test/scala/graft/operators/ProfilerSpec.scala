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
