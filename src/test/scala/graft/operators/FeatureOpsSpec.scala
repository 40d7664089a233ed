package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FeatureOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hashBucket is stable, in-range, and spreads values") {
    val df = (1L to 2000L).toDF("id").select($"id", concat(lit("cat_"), $"id" % 500).as("c"))
    val b = df.select(FeatureOps.hashBucket($"c", 64).as("b"))
    val counts = b.groupBy("b").count().as[(Long, Long)].collect()
    assert(counts.forall { case (bk, _) => bk >= 0 && bk < 64 })
    assert(counts.length > 48, s"500 categories should hit most of 64 buckets: ${counts.length}")
    val twice = df.select(FeatureOps.hashBucket($"c", 64).as("b")).collect()
    assert(twice.toSeq == b.collect().toSeq, "deterministic")
  }

  test("withRankFeatures: pct_rank spans [0,1] per group, deciles near-balanced") {
    val df = (1L to 1000L).toDF("id").select(
      ($"id" % 2).as("g"), $"id", (($"id" * 37) % 991).cast("double").as("v"))
    val got = FeatureOps.withRankFeatures(df, Seq("g"), "v", "id")
    val rk = got.groupBy("g").agg(min("pct_rank"), max("pct_rank")).as[(Long, Double, Double)].collect()
    assert(rk.forall { case (_, mn, mx) => mn == 0.0 && mx == 1.0 })
    val deciles = got.filter($"g" === 0).groupBy("bucket_rank").count().as[(Int, Long)].collect().toMap
    assert(deciles.keySet == (1 to 10).toSet && deciles.values.forall(_ == 50L))
  }

  test("withRankFeaturesScalable matches the window form exactly, including edge groups") {
    // groups: "big" 1000 rows, "dup" all-identical values, "tiny" n<buckets,
    // "one" n=1 (percent_rank=0 guard), few bins to force multi-row bins
    val big = (1L to 1000L).map(i => ("big", i, ((i * 37) % 991).toDouble))
    val dup = (1L to 40L).map(i => ("dup", i, 5.0))
    val tiny = (1L to 7L).map(i => ("tiny", i, (100 - i).toDouble))
    val one = Seq(("one", 1L, 3.0))
    val df = (big ++ dup ++ tiny ++ one).toDF("g", "tie", "v")
    val want = FeatureOps.withRankFeatures(df, Seq("g"), "v", "tie")
      .select($"g", $"tie", $"pct_rank", $"bucket_rank")
      .as[(String, Long, Double, Int)].collect().sortBy(r => (r._1, r._2))
    val got = FeatureOps.withRankFeaturesScalable(df, Seq("g"), "v", "tie", bins = 8)
      .select($"g", $"tie", $"pct_rank", $"bucket_rank")
      .as[(String, Long, Double, Int)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == want.toSeq)
  }

  test("withRankFeaturesScalable plan: the full-data window is partitioned by (group, bin), never group alone") {
    val df = (1L to 500L).toDF("id").select(
      ($"id" % 3).as("g"), $"id", (($"id" * 53) % 499).cast("double").as("v"))
    val plan = FeatureOps.withRankFeaturesScalable(df, Seq("g"), "v", "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("__bin"), "bin column must reach the physical plan")
    val winParts = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\], \\[".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    val fullDataWins = winParts.filterNot(_.contains("__bin"))
    // the only windows without __bin run over the tiny (group × bin) histogram
    assert(winParts.exists(_.contains("__bin")), s"expected a (group, bin) window in:\n$plan")
    assert(fullDataWins.size <= 2, s"histogram offset/total windows only, got $winParts")
  }

  test("withDistributedRunningSum matches the ROWS-frame window prefix sum") {
    import org.apache.spark.sql.expressions.Window
    val df = ((1L to 500L).map(i => (s"s${i % 3}", i, (i % 7 + 1))) :+ (("solo", 9999L, 5L)))
      .toDF("g", "id", "v")
    val w = Window.partitionBy("g").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum($"v").over(w))
      .select($"g", $"id", $"cum").as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val got = FeatureOps.withDistributedRunningSum(df, Seq("g"), "id", "v", bins = 8, cumCol = "cum")
      .select($"g", $"id", $"cum").as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == want.toSeq)
  }

  test("rollingStats matches a hand-built trailing window") {
    val df = Seq(
      (1L, 0L, 1.0), (1L, 50L, 2.0), (1L, 100L, 4.0), (1L, 1000L, 8.0)
    ).toDF("k", "t", "v")
    val got = FeatureOps.rollingStats(df, Seq("k"), "t", "v", windowSize = 100L)
      .select($"t", $"roll_n", $"roll_sum", $"roll_mean", $"roll_min", $"roll_max")
      .as[(Long, Long, Double, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 1L, 1.0, 1.0, 1.0, 1.0)))
    assert(got(100L) == ((100L, 3L, 7.0, 7.0 / 3, 1.0, 4.0)), "t=0 still inside [0,100]")
    assert(got(1000L) == ((1000L, 1L, 8.0, 8.0, 8.0, 8.0)), "window slid past everything")
  }
}
