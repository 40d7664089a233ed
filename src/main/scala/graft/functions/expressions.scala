package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the scalar special-function kernels.
  *
  * These stay inside whole-stage codegen (each generates a static call into
  * [[SpecialMath]]), unlike a Scala UDF which would break the codegen span —
  * they sit in the per-variant hot path of QC and p-value conversion.
  *
  * Inputs are cast to double by the Column-facing constructors below, so no
  * ExpectsInputTypes contract is needed.
  */
abstract class DoubleKernelExpression extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Fully-qualified static method, e.g. `graft.functions.SpecialMath.chi2Sf`. */
  protected def staticMethod: String

  override protected def nullSafeEval(input: Any): Any =
    evalKernel(input.asInstanceOf[Double])

  protected def evalKernel(x: Double): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$staticMethod($c)")
}

/** chi² (df=1) survival function: chi² statistic → p-value. */
case class Chi2SurvivalFunction(child: Expression) extends DoubleKernelExpression {
  override protected def staticMethod: String = "graft.functions.SpecialMath.chi2Sf"
  override protected def evalKernel(x: Double): Double = SpecialMath.chi2Sf(x)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** chi² (df=1) inverse survival function: p-value → chi² statistic. */
case class Chi2InverseSurvivalFunction(child: Expression) extends DoubleKernelExpression {
  override protected def staticMethod: String = "graft.functions.SpecialMath.chi2Isf"
  override protected def evalKernel(x: Double): Double = SpecialMath.chi2Isf(x)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Standard normal survival function. */
case class NormSurvivalFunction(child: Expression) extends DoubleKernelExpression {
  override protected def staticMethod: String = "graft.functions.SpecialMath.normSf"
  override protected def evalKernel(x: Double): Double = SpecialMath.normSf(x)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen dot product over two `array<double>` columns — the unit of cost
  * in every pairwise similarity kernel, where the interpreted
  * `aggregate(zip_with(...))` HOF chain allocates a zipped array and
  * evaluates two lambdas per element. This generates a tight primitive loop
  * inside whole-stage codegen instead.
  *
  * Semantics mirror the HOF formulation exactly: null if either array is
  * null, the arrays differ in length (zip_with pads with null), or any
  * element is null; otherwise a left-to-right accumulation — the same
  * addition order, so results are bit-identical.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Codegen stable log-sum-exp over an `array<double>` column — the kernel
  * inside every coloc posterior (evaluated once per overlap pair). Mirrors
  * the HOF formulation bit-for-bit: max over non-null elements, then
  * `max + log(Σ exp(x - max))` accumulated left-to-right; all-(-Inf) arrays
  * return -Inf; null array, empty array, or any null element → null (the
  * HOF's `aggregate` propagates element nulls, `array_max` of empty is
  * null).
  */
case class LogSumExp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) null
    else {
      var i = 0
      var mx = Double.NegativeInfinity
      while (i < n) {
        if (arr.isNullAt(i)) return null
        val v = arr.getDouble(i)
        if (v > mx) mx = v
        i += 1
      }
      if (mx == Double.NegativeInfinity) Double.NegativeInfinity
      else {
        var acc = 0.0
        i = 0
        while (i < n) {
          acc += math.exp(arr.getDouble(i) - mx)
          i += 1
        }
        mx + math.log(acc)
      }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $mx = Double.NEGATIVE_INFINITY;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $v = $a.getDouble($i);
         |    if ($v > $mx) { $mx = $v; }
         |  }
         |  if (!${ev.isNull}) {
         |    if ($mx == Double.NEGATIVE_INFINITY) {
         |      ${ev.value} = Double.NEGATIVE_INFINITY;
         |    } else {
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        $acc += java.lang.Math.exp($a.getDouble($i) - $mx);
         |      }
         |      ${ev.value} = $mx + java.lang.Math.log($acc);
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object expressions {
  import org.apache.spark.sql.functions.lit

  private def toDoubleExpr(c: Column): Expression =
    Bridge.expression(c.cast(DoubleType))

  /** Column API over the kernels (reference: common/udf.py:20-100). */
  def chi2_survival_function(x: Column): Column =
    Bridge.column(Chi2SurvivalFunction(toDoubleExpr(x)))

  def chi2_inverse_survival_function(p: Column): Column =
    Bridge.column(Chi2InverseSurvivalFunction(toDoubleExpr(p)))

  def norm_survival_function(x: Column): Column =
    Bridge.column(NormSurvivalFunction(toDoubleExpr(x)))

  /** Codegen pairwise dot product (see [[DotProduct]]). */
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(
      DotProduct(
        Bridge.expression(a.cast(ArrayType(DoubleType))),
        Bridge.expression(b.cast(ArrayType(DoubleType)))))

  /** Stable log-sum-exp of an array column — max + log(sum(exp(x - max)))
    * (common/stats.py:23-41; UDF-registered in the reference at
    * method/colocalisation.py:278). A native codegen expression
    * ([[LogSumExp]]); the earlier interpreted HOF formulation evaluated two
    * lambdas per element per row on the coloc hot path.
    */
  def logsumexp(arr: Column): Column =
    Bridge.column(LogSumExp(Bridge.expression(arr.cast(ArrayType(DoubleType)))))
}
