package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 5000L).toDF("id")

  test("hashSample hits the target fraction and is deterministic across repartitionings") {
    val a = Sampling.hashSample(ids, $"id", 0.2).as[Long].collect().toSet
    val b = Sampling.hashSample(ids.repartition(17), $"id", 0.2).as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    assert(math.abs(a.size / 5000.0 - 0.2) < 0.02, s"got ${a.size} of 5000")
  }

  test("different salts draw (near-)independent samples; fraction 0/1 are empty/full") {
    val a = Sampling.hashSample(ids, $"id", 0.5, salt = "s1").as[Long].collect().toSet
    val b = Sampling.hashSample(ids, $"id", 0.5, salt = "s2").as[Long].collect().toSet
    val overlap = (a intersect b).size / 5000.0
    assert(math.abs(overlap - 0.25) < 0.03, s"independent halves overlap ~25%, got $overlap")
    assert(Sampling.hashSample(ids, $"id", 0.0).count() == 0)
    assert(Sampling.hashSample(ids, $"id", 1.0).count() == 5000)
  }

  test("groupSample returns exactly min(k, |group|) rows per group, stable under re-ordering") {
    val df = ids.withColumn("g", $"id" % 7)
    val got = Sampling.groupSample(df, Seq("g"), $"id", 10)
    assert(got.groupBy("g").count().as[(Long, Long)].collect().forall(_._2 == 10))
    val small = Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("g", "id")
    assert(Sampling.groupSample(small, Seq("g"), $"id", 10).count() == 3)
    val a = got.as[(Long, Long)].collect().toSet
    val b = Sampling.groupSample(df.orderBy(rand(42)), Seq("g"), $"id", 10)
      .as[(Long, Long)].collect().toSet
    assert(a == b, "draw must be independent of input order")
  }

  test("weightedGroupSample favours heavy weights, excludes non-positive, stays deterministic") {
    val df = ids.withColumn("g", lit(0))
      .withColumn("w", when($"id" <= 100, 100.0).when($"id" <= 4999, 1.0).otherwise(0.0))
    val got = Sampling.weightedGroupSample(df, Seq("g"), $"id", $"w", 100)
      .as[(Long, Int, Double)].collect().map(_._1)
    assert(got.length == 100)
    // 100 rows at weight 100 vs 4899 at weight 1: heavy rows carry ~2/3 of
    // the total weight mass, so they must dominate the draw
    val heavy = got.count(_ <= 100L)
    assert(heavy > 50, s"heavy-weight rows under-drawn: $heavy/100")
    assert(!got.contains(5000L), "zero-weight row must never win")
    val again = Sampling.weightedGroupSample(df.repartition(13), Seq("g"), $"id", $"w", 100)
      .as[(Long, Int, Double)].collect().map(_._1)
    assert(got.sorted.toSeq == again.sorted.toSeq, "partitioning-invariant")
  }

  test("stratifiedSample applies per-stratum fractions with a broadcast threshold join") {
    val df = ids.withColumn("st", when($"id" % 2 === 0, "even").otherwise("odd"))
    val got = Sampling.stratifiedSample(df, "st", Map("even" -> 0.4, "odd" -> 0.1), $"id")
    val counts = got.groupBy("st").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("even") / 2500.0 - 0.4) < 0.04, counts.toString)
    assert(math.abs(counts.getOrElse("odd", 0L) / 2500.0 - 0.1) < 0.04, counts.toString)
    // unknown strata fall to defaultFraction (0 → dropped entirely)
    val none = Sampling.stratifiedSample(df, "st", Map("even" -> 0.4), $"id")
    assert(none.filter($"st" === "odd").count() == 0)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"threshold table must broadcast:\n$plan")
  }
}
