package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val big = (0 until 5000).map(i => (i.toLong, s"p$i")).toDF("k", "payload")
  private lazy val small = (0 until 5000).filter(_ % 37 == 0).map(_.toLong).toDF("k")

  test("bloomSemiJoin equals the exact semi join") {
    val got = BloomOps.bloomSemiJoin(big, small, "k", expectedItems = 200)
      .select("k").as[Long].collect().sorted.toSeq
    val want = big.join(small, Seq("k"), "semi").select("k").as[Long].collect().sorted.toSeq
    assert(got == want && want.nonEmpty)
  }

  test("the prune alone never drops a true match (no false negatives)") {
    val bf = BloomOps.bloomFrame(small, col("k"), expectedItems = 200, fpp = 0.5)
    val pruned = big.filter(BloomOps.mightContain(bf, col("k")))
      .select("k").as[Long].collect().toSet
    val truth = small.as[Long].collect().toSet
    assert(truth.subsetOf(pruned))
  }

  test("probe runs as might_contain inside the big side's stage, before the join") {
    val p = BloomOps.bloomSemiJoin(big, small, "k", expectedItems = 200)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"expected a bloom probe in the plan:\n$p")
    assert(p.contains("Subquery") || p.contains("subquery"),
      "bloom build must attach as a scalar subquery")
    assert(p.contains("LeftSemi"), "exact semi join must follow the prune")
  }

  test("an over-budget sketch fails loudly instead of building") {
    val e = intercept[IllegalArgumentException] {
      BloomOps.bloomFilterAgg(col("k"), expectedItems = 100_000_000_000L, fpp = 0.0001)
    }
    assert(e.getMessage.contains("bloom sketch"))
  }
}
