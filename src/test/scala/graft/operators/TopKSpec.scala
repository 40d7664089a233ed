package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1L to 10000L).toDF("id").select(
    ($"id" % 13).as("g"),
    $"id",
    (($"id" * 2654435761L) % 997).cast("double").as("v"))

  private def naive(k: Int, desc: Boolean) = {
    val o = if (desc) $"v".desc_nulls_last else $"v".asc_nulls_last
    df.withColumn("rk", row_number().over(
        Window.partitionBy($"g").orderBy(o, $"id".asc_nulls_last)))
      .filter($"rk" <= k).drop("rk")
  }

  test("two-phase top-k equals the plain window formulation, both directions") {
    for (desc <- Seq(true, false)) {
      val got = TopK.topKPerGroup(df, Seq("g"), "v", "id", 7, descending = desc)
        .as[(Long, Long, Double)].collect().toSet
      val want = naive(7, desc).as[(Long, Long, Double)].collect().toSet
      assert(got == want, s"descending=$desc")
    }
  }

  test("ties at the k boundary resolve by the tiebreak, exactly as row_number does") {
    val tied = Seq((1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 9.0))
      .toDF("g", "id", "v").repartition(4)
    val got = TopK.topKPerGroup(tied, Seq("g"), "v", "id", 3)
      .as[(Long, Long, Double)].collect().map(_._2).toSet
    assert(got == Set(13L, 10L, 11L), s"got $got")
  }

  test("groups smaller than k survive whole; the local prune bounds rows into the shuffle") {
    val small = Seq((1L, 1L, 1.0), (2L, 2L, 2.0)).toDF("g", "id", "v")
    assert(TopK.topKPerGroup(small, Seq("g"), "v", "id", 10).count() == 2)
    // shuffle-reduction: with 8 input partitions and k=2, at most
    // 13 groups x 2 x 8 = 208 rows reach the window, out of 10000
    val pruned = TopK.topKPerGroup(df.repartition(8), Seq("g"), "v", "id", 2)
    assert(pruned.count() == 26)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("mappartitions"),
      s"local prune stage must be present:\n$plan")
  }
}
