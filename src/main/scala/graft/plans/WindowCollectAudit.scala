package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList, CollectSet}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Structural audit for the round-12 "no whole-partition collect windows"
  * rule: `collect_list`/`collect_set` over an UnboundedPreceding→
  * UnboundedFollowing window frame computes ONE array per group and copies
  * it into EVERY row of the group before any downstream guard can drop it —
  * O(group²) struct copies (the q_clump / fromSusieResults trap), where a
  * `groupBy` aggregate (when one row per group survives) or a min/max
  * window (when only a distinct-count or any-true is consumed) is one
  * map-side-combinable pass.
  *
  * RUNNING collect frames (orderBy + UnboundedPreceding→CurrentRow, e.g.
  * the LD-clumping more-significant-leads set, Annotations.isLeadLinked)
  * are sequential-greedy semantics with genuinely row-varying values and
  * are NOT flagged.
  */
object WindowCollectAudit {

  def audit(plan: LogicalPlan): Seq[String] = {
    val out = Seq.newBuilder[String]
    plan.foreach { node =>
      node.expressions.foreach { e =>
        e.foreach {
          case WindowExpression(agg: AggregateExpression, spec)
              if isCollect(agg) && isWholePartition(spec) =>
            out += s"whole-partition ${agg.aggregateFunction.prettyName} window " +
              s"(same array copied into every group row): ${e.sql.take(160)}"
          case _ => ()
        }
      }
    }
    out.result().distinct
  }

  private def isCollect(agg: AggregateExpression): Boolean =
    agg.aggregateFunction match {
      case _: CollectList | _: CollectSet => true
      case _                              => false
    }

  private def isWholePartition(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
      // UnspecifiedFrame resolves to the whole partition ONLY without an
      // orderBy; with one it resolves to the running
      // UnboundedPreceding→CurrentRow frame this audit exempts. Matching
      // the orderSpec here keeps the audit correct on unresolved plans too.
      case UnspecifiedFrame => spec.orderSpec.isEmpty
      case _ => false
    }
}
