package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class WindowCollectAuditSpec extends SparkSpec {

  private def violations(df: org.apache.spark.sql.DataFrame): Seq[String] =
    WindowCollectAudit.audit(df.queryExecution.analyzed)

  import spark.implicits._

  private val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")

  test("a whole-partition collect_set window is flagged") {
    val bad = df.withColumn(
      "s", collect_set(col("v")).over(Window.partitionBy("k")))
    val found = violations(bad)
    assert(found.nonEmpty && found.head.contains("collect_set"), found.mkString("; "))
  }

  test("an explicit unbounded-frame collect_list window is flagged") {
    val bad = df.withColumn(
      "s",
      collect_list(col("v")).over(
        Window.partitionBy("k").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    assert(violations(bad).nonEmpty)
  }

  test("a RUNNING collect frame (sequential-greedy semantics) passes") {
    val ok = df.withColumn(
      "seen",
      collect_set(col("v")).over(
        Window.partitionBy("k").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(violations(ok).isEmpty, violations(ok).mkString("; "))
  }

  test("UnspecifiedFrame + orderBy (pre-resolution running frame) passes, without orderBy is flagged") {
    // A still-unresolved frame resolves to UnboundedPreceding→CurrentRow
    // when an orderBy is present (the exempt running frame) and to the
    // whole partition otherwise — the audit must not misflag the former.
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectSet, Complete}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val child = df.queryExecution.analyzed
    val Seq(k, v) = child.output.toSeq
    val agg = AggregateExpression(CollectSet(v), Complete, isDistinct = false)
    def plan(order: Seq[SortOrder]) = Project(
      Seq(Alias(WindowExpression(agg, WindowSpecDefinition(Seq(k), order, UnspecifiedFrame)), "s")()),
      child)
    val vRunning = WindowCollectAudit.audit(plan(Seq(SortOrder(v, Ascending))))
    val vWhole = WindowCollectAudit.audit(plan(Nil))
    assert(vRunning.isEmpty, vRunning.mkString("; "))
    assert(vWhole.nonEmpty)
  }

  test("min/max and row_number whole-partition windows pass") {
    val ok = df
      .withColumn("mn", min(col("v")).over(Window.partitionBy("k")))
      .withColumn("rn", row_number().over(Window.partitionBy("k").orderBy("v")))
    assert(violations(ok).isEmpty, violations(ok).mkString("; "))
  }

  test("the full query surface is free of whole-partition collect windows at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val dirty = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val vs =
          try violations(fn(spark, sfDir))
          catch { case e: Throwable => Seq(s"(audit could not build $name: ${e.getMessage})") }
        vs.map(v => s"$name: $v")
    }
    assert(dirty.isEmpty, s"${dirty.size} violations:\n${dirty.mkString("\n")}")
  }
}
