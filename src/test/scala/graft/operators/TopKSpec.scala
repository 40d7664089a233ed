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

  test("null values rank worst in the local prune, both directions (desc/asc _nulls_last)") {
    // every 3rd value null; single input partition so the local heap sees
    // >= k rows per group INCLUDING nulls — under descending, a
    // sign-scaled null comparison would rank nulls best, evict genuine
    // top-k rows pre-shuffle, and the final window could not recover them
    val withNulls = (1L to 300L).toDF("id").select(
        ($"id" % 5).as("g"),
        $"id",
        when($"id" % 3 === 0, lit(null).cast("double"))
          .otherwise((($"id" * 2654435761L) % 97).cast("double")).as("v"))
      .coalesce(1)
    for (desc <- Seq(true, false)) {
      val o = if (desc) $"v".desc_nulls_last else $"v".asc_nulls_last
      val want = withNulls.withColumn("rk", row_number().over(
          Window.partitionBy($"g").orderBy(o, $"id".asc_nulls_last)))
        .filter($"rk" <= 7).drop("rk")
        .as[(Long, Long, Option[Double])].collect().toSet
      val got = TopK.topKPerGroup(withNulls, Seq("g"), "v", "id", 7, descending = desc)
        .as[(Long, Long, Option[Double])].collect().toSet
      assert(got == want, s"descending=$desc")
      assert(want.forall(_._3.nonEmpty), "groups have >=7 non-null rows; no null should surface")
    }
    // all-null tail group: nulls DO surface when the group runs out of values
    val tiny = Seq((1L, 1L, Some(1.0)), (1L, 2L, None), (1L, 3L, None))
      .toDF("g", "id", "v").coalesce(1)
    val got = TopK.topKPerGroup(tiny, Seq("g"), "v", "id", 2)
      .as[(Long, Long, Option[Double])].collect().map(_._2).toSet
    assert(got == Set(1L, 2L), s"null rows fill remaining slots in tiebreak order: $got")
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
