package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.functions.{DotProduct, LogSumExp, NearestCentroid, TopNCentroids}

/** Structural audit for the round-8 "let-bind into HOF lambdas" rule: no
  * lambda body may reference an O(n) expression over data the lambda is
  * mapped across — an interpreted lambda re-inlines every referenced
  * subtree PER ELEMENT, so `transform(v, x => x - array_max(v))` evaluates
  * `array_max(v)` |v| times (O(n²) array passes per row; measured 5.1 s →
  * 0.60 s on quantizeEmbedding at sf0.1 when let-bound). The fix pattern is
  * `element_at(transform(array(struct(v, mn, sc)), p => …), 1)` — lambda
  * VARIABLES are bound values, not re-inlined trees.
  *
  * Two violation classes per HigherOrderFunction node:
  *   1. the lambda body contains an O(n) kernel (aggregate/min/max/sort,
  *      a nested HOF, or one of the custom array expressions) whose array
  *      operand is semantically equal to one of the enclosing HOF's
  *      iterated arrays — per-element re-evaluation of an O(n) pass;
  *   2. the lambda body re-references an iterated array that is itself a
  *      NON-LEAF expression — whatever that subtree costs is paid per
  *      element once CollapseProject has re-inlined it.
  */
object BindOnceAudit {

  /** Human-readable violation descriptions for every HOF in the plan. */
  def audit(plan: LogicalPlan): Seq[String] = {
    val out = Seq.newBuilder[String]
    plan.foreach { node =>
      node.expressions.foreach(e => out ++= auditExpression(e))
    }
    out.result().distinct
  }

  def auditExpression(root: Expression): Seq[String] = {
    val out = Seq.newBuilder[String]
    root.foreach {
      case hof: HigherOrderFunction =>
        val iterated = hof.arguments.filter(_.dataType.isInstanceOf[
          org.apache.spark.sql.types.ArrayType])
        hof.functions.foreach {
          case LambdaFunction(body, _, _) =>
            body.foreach { sub =>
              oNArrayOperands(sub).foreach { arr =>
                iterated.find(_.semanticEquals(arr)).foreach { _ =>
                  out += s"O(n) kernel ${sub.prettyName} over the iterated " +
                    s"array inside a ${hof.prettyName} lambda: ${sub.sql.take(160)}"
                }
              }
              iterated.filterNot(isCheap).find(sub.semanticEquals).foreach { _ =>
                out += s"non-leaf iterated array re-referenced inside a " +
                  s"${hof.prettyName} lambda (re-evaluated per element): " +
                  sub.sql.take(160)
              }
            }
          case _ => ()
        }
      case _ => ()
    }
    out.result()
  }

  /** The array operand(s) of expressions that do a full pass over an array. */
  private def oNArrayOperands(e: Expression): Seq[Expression] = e match {
    case a: ArrayAggregate  => Seq(a.argument)
    case t: ArrayTransform  => Seq(t.argument)
    case f: ArrayFilter     => Seq(f.argument)
    case x: ArrayExists     => Seq(x.argument)
    case f: ArrayForAll     => Seq(f.argument)
    case s: ArraySort       => Seq(s.argument)
    case s: SortArray       => Seq(s.base)
    case m: ArrayMin        => Seq(m.child)
    case m: ArrayMax        => Seq(m.child)
    case d: ArrayDistinct   => Seq(d.child)
    case j: ArrayJoin       => Seq(j.array)
    case z: ArraysZip       => z.children
    case l: LogSumExp       => Seq(l.child)
    case d: DotProduct      => Seq(d.left, d.right)
    case n: NearestCentroid => Seq(n.child)
    case t: TopNCentroids   => Seq(t.child)
    case _                  => Seq.empty
  }

  /** Cheap-to-re-evaluate expressions: leaves and field extractions over
    * leaves. Anything else re-inlined into a lambda costs its full subtree
    * per element.
    */
  private def isCheap(e: Expression): Boolean = e match {
    case _: Attribute | _: Literal | _: NamedLambdaVariable => true
    case g: GetStructField                                  => isCheap(g.child)
    case g: GetArrayItem                                    => g.children.forall(isCheap)
    case _                                                  => false
  }
}
