package graft.plans

import org.apache.spark.sql.catalyst.expressions.ScalaUDF

import graft.SparkSpec

/** Pin the engine's "functions, not UDFs" claim structurally: a ScalaUDF is
  * a codegen/pushdown black box, so every occurrence on the query surface
  * must be an explicit, justified exception. The only one is q_clump's
  * `_prune_peak` greedy lead selection — an inherently SEQUENTIAL per-cluster
  * recurrence (each accepted lead masks a window around it, so acceptance of
  * element i depends on all accepted j < i) that no relational/HOF form
  * expresses without an O(n²) self-reference; the UDF is O(n log n) via a
  * TreeSet and runs per-cluster, never per-corpus
  * (operators/WindowBasedClumping.scala).
  */
class UdfInventorySpec extends SparkSpec {

  test("the full query surface carries exactly one ScalaUDF, in q_clump") {
    val sfDir = "/root/testdata/sf0.001"
    val withUdfs = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n =
          try {
            var count = 0
            fn(spark, sfDir).queryExecution.analyzed.foreach { node =>
              node.expressions.foreach(_.foreach {
                case _: ScalaUDF => count += 1
                case _           => ()
              })
            }
            count
          } catch { case _: Throwable => -1 }
        if (n != 0) Some(name -> n) else None
    }
    assert(
      withUdfs.map(_._1) === Seq("q_clump"),
      s"UDF inventory changed: $withUdfs — every new ScalaUDF needs a justification here")
  }
}
