package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CrossJoinAuditSpec extends SparkSpec {

  import spark.implicits._

  private def violations(df: org.apache.spark.sql.DataFrame): Seq[String] =
    CrossJoinAudit.audit(df.queryExecution.executedPlan)

  test("a single-row global-aggregate carrier cross join passes") {
    val docs = Seq(("a", 3L), ("b", 5L)).toDF("doc", "n")
    val carrier = docs.agg(sum("n").as("total"))
    assert(violations(docs.crossJoin(carrier)).isEmpty)
  }

  test("a literal local-table cross join passes") {
    val docs = Seq(("a", 3L), ("b", 5L)).toDF("doc", "n")
    val lit1 = Seq(Tuple1(42L)).toDF("k")
    assert(violations(docs.crossJoin(lit1)).isEmpty)
  }

  test("a cross join against unbounded data is flagged") {
    val docs = spark.range(1000).toDF("n")
    val other = spark.range(100).toDF("m")
    val bad = docs.crossJoin(other)
    val found = violations(bad)
    assert(found.nonEmpty, "unbounded-build BNLJ or CartesianProduct must be flagged")
  }

  test("the full query surface has no unbounded non-equi joins at sf0.001") {
    // Bounded-by-construction exceptions the structural heuristic cannot
    // prove (each must keep producing EXACTLY one flag — the pin below —
    // so the allowlist cannot mask a new unbounded join in the same query):
    //  - q_cosine_topk: the broadcast side is the caller's query set
    //    (bruteForceTopK is the documented brute-force baseline; IVF ANN is
    //    the 100 TB path).
    // q_global_sort left the list in round 19: its triangular
    // exclusive-prefix-sum self-join over the per-chromosome count frame
    // was replaced by a running-sum window over the same ~25-row frame —
    // no non-equi join remains.
    val boundedByConstruction = Set("q_cosine_topk")
    val sfDir = "/root/testdata/sf0.001"
    val byQuery = graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val vs =
          try violations(fn(spark, sfDir))
          catch { case e: Throwable => Seq(s"(audit could not build $name: ${e.getMessage})") }
        name -> vs
    }
    val dirty = byQuery.collect {
      case (name, vs) if !boundedByConstruction(name) && vs.nonEmpty =>
        vs.map(v => s"$name: $v")
    }.flatten
    assert(dirty.isEmpty, s"${dirty.size} violations:\n${dirty.mkString("\n")}")
    byQuery.toMap.view.filterKeys(boundedByConstruction).foreach {
      case (name, vs) =>
        assert(vs.size === 1, s"$name allowlisted for exactly ONE bounded BNLJ, got: $vs")
    }
  }
}
