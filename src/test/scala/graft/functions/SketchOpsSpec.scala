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
  test("histogram rollup equals building the histogram at the coarse level") {
    val vals = (0 until 10000).map(i => ((i * 37) % 1000 / 10.0, i % 6, if (i % 6 < 3) "A" else "B"))
      .toDF("v", "grp", "coarse")
    val fine = SketchOps.histogram(vals, "v", Seq("coarse", "grp"), 0.0, 100.0, 20)
    val rolled = SketchOps.histogramRollup(fine, Seq("coarse"))
      .orderBy("coarse", "bin").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val direct = SketchOps.histogram(vals, "v", Seq("coarse"), 0.0, 100.0, 20)
      .orderBy("coarse", "bin").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rolled == direct && direct.nonEmpty)
  }

  test("histogram quantiles land within one bin width of the exact percentile") {
    val vals = (0 until 20000).map(i => Tuple1((i * 7919) % 10000 / 10.0)).toDF("v")
    val hist = SketchOps.histogram(vals.withColumn("g", org.apache.spark.sql.functions.lit("x")),
      "v", Seq("g"), 0.0, 1000.0, 100)
    val qs = SketchOps.histogramQuantiles(hist, Seq("g"), Seq(0.5, 0.95), 0.0, 1000.0, 100)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // values are ~uniform on [0, 1000): exact p50 = 500, p95 = 950
    assert(math.abs(qs(0.5) - 500.0) <= 10.0, s"p50=${qs(0.5)}")
    assert(math.abs(qs(0.95) - 950.0) <= 10.0, s"p95=${qs(0.95)}")
  }

  test("out-of-bounds values clamp into the edge bins, nulls are dropped") {
    val vals = Seq(Some(-5.0), Some(500.0), Some(1e9), None).map(Tuple1.apply)
      .toDF("v").withColumn("g", org.apache.spark.sql.functions.lit("x"))
    val h = SketchOps.histogram(vals, "v", Seq("g"), 0.0, 100.0, 10)
      .orderBy("bin").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(h == Seq((0L, 1L), (9L, 2L)))
  }

}
