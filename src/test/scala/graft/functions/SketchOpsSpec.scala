package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  // 60k rows, 20k distinct users spread over 8 fine groups in 2 coarse ones
  private lazy val df = (0 until 60000)
    .map(i => (i % 20000, i % 8, if (i % 8 < 4) "A" else "B"))
    .toDF("user", "grp", "coarse")

  test("rolling up per-group sketches equals sketching the raw data at the coarse level") {
    val fine = SketchOps.distinctSketches(df, "user", Seq("coarse", "grp"))
    val rolled = SketchOps.rollupEstimate(fine, Seq("coarse"))
      .orderBy("coarse").as[(String, Long)].collect().toSeq
    val direct = SketchOps.approxDistinct(df, "user", Seq("coarse"))
      .orderBy("coarse").as[(String, Long)].collect().toSeq
    assert(rolled == direct, "HLL union must be lossless vs direct sketching")
  }

  test("HLL estimate lands within 5% of the exact distinct count") {
    val est = SketchOps.approxDistinct(df, "user", Seq("coarse"))
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("coarse").agg(countDistinct("user").as("d"))
      .as[(String, Long)].collect().toMap
    for ((k, e) <- exact)
      assert(math.abs(est(k) - e).toDouble / e < 0.05, s"$k: est=${est(k)} exact=$e")
  }

  test("count-min estimates never undercount and bound the heavy hitter tightly") {
    val skewed = ((0 until 5000).map(i => s"u$i") ++ Seq.fill(2000)("hot")).toDF("k")
    val cms = SketchOps.frequencySketch(skewed, "k", eps = 0.001)
    val est = SketchOps.estimateCounts(cms, Seq("hot", "u17", "absent"))
    assert(est("hot") >= 2000L && est("hot") <= 2000L + (0.001 * 7000).ceil.toLong + 7)
    assert(est("u17") >= 1L)
    assert(est("absent") >= 0L)
  }

  test("sketch aggregation is map-side combinable (partial HashAggregate in plan)") {
    val p = SketchOps.distinctSketches(df, "user", Seq("grp"))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_hll_sketch_agg") || p.contains("ObjectHashAggregate"),
      s"expected a partial sketch aggregate:\n$p")
  }
}
