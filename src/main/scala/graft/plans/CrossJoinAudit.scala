package graft.plans

import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

/** Structural audit for non-equi joins: a `CartesianProduct` is O(n·m) and
  * never acceptable on the query surface; a `BroadcastNestedLoopJoin` is
  * acceptable ONLY as the single-row/bounded "broadcast carrier" pattern —
  * corpus totals (a grouping-free global aggregate, exactly one row) or a
  * literal local table cross-joined onto every row. A BNLJ whose broadcast
  * side is unbounded data re-evaluates the join condition n·m times and is
  * a 100 TB wall even when the build side happens to fit in memory at test
  * scale.
  */
object CrossJoinAudit {

  /** Depth-first walk that descends through AQE wrappers — a plain
    * `plan.foreach` stops at `AdaptiveSparkPlanExec`, making any physical
    * audit pass vacuously on an AQE-enabled session.
    */
  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case o                        => o.children
    }
    kids.foreach(walk(_)(f))
  }

  def audit(plan: SparkPlan): Seq[String] = {
    val out = Seq.newBuilder[String]
    walk(plan) {
      case c: CartesianProductExec =>
        out += s"CartesianProduct (O(n*m), never acceptable): ${c.simpleString(80)}"
      case j: BroadcastNestedLoopJoinExec =>
        val build = j.buildSide match {
          case BuildRight => j.right
          case BuildLeft  => j.left
        }
        if (!isBoundedCarrier(build))
          out += "BroadcastNestedLoopJoin with an unbounded build side " +
            s"(not a global-aggregate/literal carrier): ${build.simpleString(120)}"
      case _ => ()
    }
    out.result().distinct
  }

  /** True when every leaf-to-root path of the build side passes through a
    * grouping-free aggregate (global aggregate → one row) or bottoms out in
    * a literal local table — i.e. the broadcast is bounded by construction,
    * not by data volume.
    */
  private def isBoundedCarrier(plan: SparkPlan): Boolean = plan match {
    case a: AdaptiveSparkPlanExec                                    => isBoundedCarrier(a.executedPlan)
    case s: QueryStageExec                                           => isBoundedCarrier(s.plan)
    case a: HashAggregateExec if a.groupingExpressions.isEmpty       => true
    case a: ObjectHashAggregateExec if a.groupingExpressions.isEmpty => true
    case a: SortAggregateExec if a.groupingExpressions.isEmpty       => true
    case _: LocalTableScanExec                                       => true
    case l if l.children.isEmpty                                     => false
    case other => other.children.forall(isBoundedCarrier)
  }
}
