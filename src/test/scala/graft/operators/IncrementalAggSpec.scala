package graft.operators

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val s1 = Seq(
    ("a", 1.0), ("a", 2.0), ("b", 3.0), ("c", 4.0)
  ).toDF("k", "v")

  test("merge(init, delta) equals a direct aggregate of the new snapshot, dropping emptied keys") {
    // changes: one 'a' row revalued 2.0→5.0, the only 'c' row removed, new 'd' row
    val removed = Seq(("a", 2.0), ("c", 4.0)).toDF("k", "v")
    val added = Seq(("a", 5.0), ("d", 7.0)).toDF("k", "v")
    val got = IncrementalAgg.merge(
      IncrementalAgg.initState(s1, Seq("k"), "v"),
      IncrementalAgg.deltaFromRowSets(removed, added, Seq("k"), "v"),
      Seq("k")
    ).as[(String, Long, Double)].collect().toSet
    val s2 = Seq(("a", 1.0), ("a", 5.0), ("b", 3.0), ("d", 7.0)).toDF("k", "v")
    val direct = IncrementalAgg.initState(s2, Seq("k"), "v")
      .as[(String, Long, Double)].collect().toSet
    assert(got == direct)
    assert(!got.exists(_._1 == "c"), "emptied key must disappear")
  }

  test("an empty change set is the identity") {
    val empty = Seq.empty[(String, Double)].toDF("k", "v")
    val got = IncrementalAgg.merge(
      IncrementalAgg.initState(s1, Seq("k"), "v"),
      IncrementalAgg.deltaFromRowSets(empty, empty, Seq("k"), "v"),
      Seq("k")
    ).as[(String, Long, Double)].collect().toSet
    assert(got == IncrementalAgg.initState(s1, Seq("k"), "v")
      .as[(String, Long, Double)].collect().toSet)
  }

  test("the delta aggregation is map-side combinable (partial HashAggregate)") {
    val removed = Seq(("a", 2.0)).toDF("k", "v")
    val plan = IncrementalAgg.deltaFromRowSets(removed, s1, Seq("k"), "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected hash aggregation:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial"), s"expected partial aggregation:\n$plan")
  }
}
