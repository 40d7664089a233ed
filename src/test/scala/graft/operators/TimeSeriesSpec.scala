package graft.operators

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val series = Seq(
    // key a: interior gap, linear in t
    ("a", 0L, Some(10.0)), ("a", 10L, None), ("a", 40L, None), ("a", 50L, Some(60.0)),
    // key a: leading + trailing gaps
    ("b", 0L, None), ("b", 10L, Some(5.0)), ("b", 20L, None),
    // key c: never observed
    ("c", 0L, None)
  ).toDF("k", "t", "v")

  test("interior gaps interpolate linearly; edges ffill/bfill; all-null keys stay null") {
    val got = TimeSeries.interpolateLinear(series, Seq("k"), "t", "v")
      .as[(String, Long, Option[Double], Option[Double])]
      .collect().map(r => (r._1, r._2) -> r._4).toMap
    assert(got(("a", 0L)) == Some(10.0))
    assert(got(("a", 10L)) == Some(10.0 + 50.0 * 10 / 50)) // 20.0
    assert(got(("a", 40L)) == Some(10.0 + 50.0 * 40 / 50)) // 50.0
    assert(got(("a", 50L)) == Some(60.0))
    assert(got(("b", 0L)) == Some(5.0), "leading gap backfills")
    assert(got(("b", 20L)) == Some(5.0), "trailing gap forward-fills")
    assert(got(("c", 0L)).isEmpty, "unobserved key stays null")
  }

  test("both window passes ride one key exchange") {
    val plan = TimeSeries.interpolateLinear(series.repartition(5), Seq("k"), "t", "v")
      .queryExecution.executedPlan.toString
    // the test's own repartition(5) adds a RoundRobin exchange; the
    // operator itself must introduce exactly one key-hash exchange
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected a single key shuffle, got $exchanges:\n$plan")
  }
}
