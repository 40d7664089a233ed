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
  * the HOF formulation bit-for-bit, INCLUDING its null ordering: the max is
  * taken over non-null elements (`array_max` ignores nulls), and the -Inf
  * branch short-circuits BEFORE the null-propagating aggregate — so
  * `[null, -Inf]` is -Inf, not null. Otherwise any null element → null,
  * null/empty/all-null array → null, and the finite branch is
  * `max + log(Σ exp(x - max))` accumulated left-to-right (same addition
  * order, bit-identical results).
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
      var anyNull = false
      var anyValue = false
      while (i < n) {
        if (arr.isNullAt(i)) anyNull = true
        else {
          anyValue = true
          val v = arr.getDouble(i)
          if (v > mx) mx = v
        }
        i += 1
      }
      if (!anyValue) null // array_max of an all-null array is null
      else if (mx == Double.NegativeInfinity) Double.NegativeInfinity
      else if (anyNull) null // aggregate propagates element nulls
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
      val anyNull = ctx.freshName("anyNull")
      val anyValue = ctx.freshName("anyValue")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $mx = Double.NEGATIVE_INFINITY;
         |  boolean $anyNull = false;
         |  boolean $anyValue = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { $anyNull = true; } else {
         |      $anyValue = true;
         |      final double $v = $a.getDouble($i);
         |      if ($v > $mx) { $mx = $v; }
         |    }
         |  }
         |  if (!$anyValue) {
         |    ${ev.isNull} = true;
         |  } else if ($mx == Double.NEGATIVE_INFINITY) {
         |    ${ev.value} = Double.NEGATIVE_INFINITY;
         |  } else if ($anyNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += java.lang.Math.exp($a.getDouble($i) - $mx);
         |    }
         |    ${ev.value} = $mx + java.lang.Math.log($acc);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen nearest-centroid assignment: the id of the centroid maximising
  * cosine similarity with the input `array<double>` vector (ties and
  * all-NaN rows resolve to the SMALLEST id, matching a
  * `row_number over (order by cos desc, id asc)` ranking — Spark's desc
  * ordering treats NaN as the largest double, so a NaN cosine outranks any
  * finite one here too).
  *
  * The centroid matrix is a plan constant (a few thousand rows by the IVF
  * C ≈ √N sizing rule — the same bound that made the old formulation's
  * broadcast side broadcastable), so the argmax runs entirely inside the
  * projection: the IVF assignment path has ZERO exchanges, where the
  * crossJoin(broadcast) + window top-1 formulation paid an N·C → N shuffle
  * on every assign pass. Arithmetic is ordered exactly like the Column
  * formulation it replaces (dot products accumulated left-to-right,
  * `dot / (vNorm * cNorm)`), so assignments are bit-identical.
  *
  * Null vector or any null element → null (the windowed form instead
  * assigned such rows to the min-id centroid via its all-null tiebreak —
  * null is the saner contract and test corpora carry no null embeddings);
  * centroids whose dimension differs from the input are skipped.
  */
case class NearestCentroid(
    child: Expression,
    ids: IndexedSeq[Long],
    embs: IndexedSeq[IndexedSeq[Double]])
  extends UnaryExpression {
  require(ids.length == embs.length, "ids/embs must be parallel")
  require(ids == ids.sorted, "centroid ids must be ascending (tiebreak order)")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val embArr: Array[Array[Double]] = embs.map(_.toArray).toArray
  @transient private lazy val normArr: Array[Double] = embArr.map { e =>
    var s = 0.0
    var i = 0
    while (i < e.length) { s += e(i) * e(i); i += 1 }
    math.sqrt(s)
  }

  /** Better-than: replicates (cos desc NULLS-irrelevant, NaN largest,
    * id asc) ranking with an ascending-id scan and strict improvement.
    */
  private def beats(cos: Double, best: Double): Boolean =
    (cos.isNaN && !best.isNaN) || cos > best

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val va = v.toDoubleArray()
    var vv = 0.0
    i = 0
    while (i < n) { vv += va(i) * va(i); i += 1 }
    val vn = math.sqrt(vv)
    var best = 0L
    var bestCos = 0.0
    var has = false
    var c = 0
    while (c < idArr.length) {
      val ce = embArr(c)
      if (ce.length == n) {
        var d = 0.0
        i = 0
        while (i < n) { d += va(i) * ce(i); i += 1 }
        val cos = d / (vn * normArr(c))
        if (!has || beats(cos, bestCos)) {
          has = true; bestCos = cos; best = idArr(c)
        }
      }
      c += 1
    }
    if (has) best else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centIds", idArr, "long[]")
    val embsRef = ctx.addReferenceObj("centEmbs", embArr, "double[][]")
    val normsRef = ctx.addReferenceObj("centNorms", normArr, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val va = ctx.freshName("va")
      val vv = ctx.freshName("vv")
      val vn = ctx.freshName("vn")
      val c = ctx.freshName("c")
      val ce = ctx.freshName("ce")
      val d = ctx.freshName("d")
      val cos = ctx.freshName("cos")
      val best = ctx.freshName("best")
      val bestCos = ctx.freshName("bestCos")
      val has = ctx.freshName("has")
      s"""
         |final int $n = $v.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  final double[] $va = $v.toDoubleArray();
         |  double $vv = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $vv += $va[$i] * $va[$i]; }
         |  final double $vn = java.lang.Math.sqrt($vv);
         |  long $best = 0L; double $bestCos = 0.0; boolean $has = false;
         |  for (int $c = 0; $c < $idsRef.length; $c++) {
         |    final double[] $ce = $embsRef[$c];
         |    if ($ce.length != $n) continue;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) { $d += $va[$i] * $ce[$i]; }
         |    final double $cos = $d / ($vn * $normsRef[$c]);
         |    if (!$has || (Double.isNaN($cos) && !Double.isNaN($bestCos)) || $cos > $bestCos) {
         |      $has = true; $bestCos = $cos; $best = $idsRef[$c];
         |    }
         |  }
         |  if ($has) { ${ev.value} = $best; } else { ${ev.isNull} = true; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-`nprobe` nearest centroids (cosine desc, NaN largest, id tiebreak) —
  * the multi-probe IVF kernel: queries search their `nprobe` best cells
  * instead of one, trading candidate volume for recall (the standard IVF
  * recall knob). Same projection-side, zero-exchange design and the same
  * arithmetic/ordering as [[NearestCentroid]] (whose result is always
  * element 0 here); returns up to `nprobe` centroid ids, fewer if fewer
  * centroids are dimension-compatible. Null contract matches
  * [[NearestCentroid]] (null/null-element input → null).
  */
case class TopNCentroids(
    child: Expression,
    ids: IndexedSeq[Long],
    embs: IndexedSeq[IndexedSeq[Double]],
    nprobe: Int)
  extends UnaryExpression {
  require(ids.length == embs.length, "ids/embs must be parallel")
  require(ids == ids.sorted, "centroid ids must be ascending (tiebreak order)")
  require(nprobe > 0, s"nprobe must be positive: $nprobe")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val embArr: Array[Array[Double]] = embs.map(_.toArray).toArray
  @transient private lazy val normArr: Array[Double] = embArr.map { e =>
    var s = 0.0
    var i = 0
    while (i < e.length) { s += e(i) * e(i); i += 1 }
    math.sqrt(s)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val va = v.toDoubleArray()
    var vv = 0.0
    i = 0
    while (i < n) { vv += va(i) * va(i); i += 1 }
    val vn = math.sqrt(vv)
    val bq = new Array[Double](nprobe)
    val bi = new Array[Long](nprobe)
    var m = 0
    var c = 0
    while (c < idArr.length) {
      val ce = embArr(c)
      if (ce.length == n) {
        var d = 0.0
        i = 0
        while (i < n) { d += va(i) * ce(i); i += 1 }
        val cos = d / (vn * normArr(c))
        // insertion position: after every kept entry that beats-or-ties the
        // candidate (ascending-id iteration keeps ties ordered by id)
        var p = m
        while (p > 0 && ((cos.isNaN && !bq(p - 1).isNaN) || cos > bq(p - 1))) p -= 1
        if (p < nprobe) {
          val last = math.min(m, nprobe - 1)
          var j = last
          while (j > p) { bq(j) = bq(j - 1); bi(j) = bi(j - 1); j -= 1 }
          bq(p) = cos
          bi(p) = idArr(c)
          if (m < nprobe) m += 1
        }
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bi, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centIds", idArr, "long[]")
    val embsRef = ctx.addReferenceObj("centEmbs", embArr, "double[][]")
    val normsRef = ctx.addReferenceObj("centNorms", normArr, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val va = ctx.freshName("va")
      val vv = ctx.freshName("vv")
      val vn = ctx.freshName("vn")
      val c = ctx.freshName("c")
      val ce = ctx.freshName("ce")
      val d = ctx.freshName("d")
      val cos = ctx.freshName("cos")
      val bq = ctx.freshName("bq")
      val bi = ctx.freshName("bi")
      val m = ctx.freshName("m")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val last = ctx.freshName("last")
      s"""
         |final int $n = $v.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  final double[] $va = $v.toDoubleArray();
         |  double $vv = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $vv += $va[$i] * $va[$i]; }
         |  final double $vn = java.lang.Math.sqrt($vv);
         |  final double[] $bq = new double[$nprobe];
         |  final long[] $bi = new long[$nprobe];
         |  int $m = 0;
         |  for (int $c = 0; $c < $idsRef.length; $c++) {
         |    final double[] $ce = $embsRef[$c];
         |    if ($ce.length != $n) continue;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) { $d += $va[$i] * $ce[$i]; }
         |    final double $cos = $d / ($vn * $normsRef[$c]);
         |    int $p = $m;
         |    while ($p > 0 && ((Double.isNaN($cos) && !Double.isNaN($bq[$p - 1])) || $cos > $bq[$p - 1])) $p--;
         |    if ($p < $nprobe) {
         |      final int $last = java.lang.Math.min($m, $nprobe - 1);
         |      for (int $j = $last; $j > $p; $j--) { $bq[$j] = $bq[$j - 1]; $bi[$j] = $bi[$j - 1]; }
         |      $bq[$p] = $cos;
         |      $bi[$p] = $idsRef[$c];
         |      if ($m < $nprobe) $m++;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($bi, $m));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen binary-search bin assignment: the number of elements of a SORTED
  * ascending `array<double>` (quantile boundaries, typically a broadcast
  * column) strictly less than `value` — `O(log n)` per row inside
  * whole-stage codegen, vs the interpreted `aggregate` HOF's `O(n)` with
  * per-element lambda dispatch (the n=255 linear probe dominated the
  * distributed-rank operator's runtime at sf0.1).
  *
  * Result is never null, mirroring `coalesce(aggregate(bnds, 0, (acc, b) ->
  * acc + if(v > b, 1, 0)), 0)`: a null array or null value contributes
  * nothing → bin 0; a null ELEMENT (never produced by percentile_approx,
  * which returns a null array instead) breaks the sort contract, so the
  * search falls back to a linear count of non-null elements < value —
  * exactly the HOF's semantics.
  */
case class SortedLowerBound(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = false

  private def linearCount(arr: ArrayData, x: Double): Int = {
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && arr.getDouble(i) < x) c += 1
      i += 1
    }
    c
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    val v = right.eval(input)
    if (a == null || v == null) 0
    else {
      val arr = a.asInstanceOf[ArrayData]
      val x = v.asInstanceOf[Double]
      var lo = 0
      var hi = arr.numElements()
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (arr.isNullAt(mid)) return linearCount(arr, x)
        else if (arr.getDouble(mid) < x) lo = mid + 1
        else hi = mid
      }
      lo
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val arr = ctx.freshName("arr")
    val x = ctx.freshName("x")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    val bad = ctx.freshName("bad")
    val i = ctx.freshName("i")
    val resultCode =
      code"""
        |${l.code}
        |${r.code}
        |int ${ev.value} = 0;
        |if (!${l.isNull} && !${r.isNull}) {
        |  org.apache.spark.sql.catalyst.util.ArrayData $arr = ${l.value};
        |  double $x = ${r.value};
        |  int $lo = 0;
        |  int $hi = $arr.numElements();
        |  boolean $bad = false;
        |  while ($lo < $hi && !$bad) {
        |    int $mid = ($lo + $hi) >>> 1;
        |    if ($arr.isNullAt($mid)) { $bad = true; }
        |    else if ($arr.getDouble($mid) < $x) { $lo = $mid + 1; }
        |    else { $hi = $mid; }
        |  }
        |  if (!$bad) { ${ev.value} = $lo; }
        |  else {
        |    for (int $i = 0; $i < $arr.numElements(); $i++) {
        |      if (!$arr.isNullAt($i) && $arr.getDouble($i) < $x) { ${ev.value}++; }
        |    }
        |  }
        |}
      """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
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

  /** Codegen sorted-array binary-search bin (see [[SortedLowerBound]]). */
  def sorted_lower_bound(boundaries: Column, value: Column): Column =
    Bridge.column(
      SortedLowerBound(
        Bridge.expression(boundaries.cast(ArrayType(DoubleType))),
        toDoubleExpr(value)))

  /** Projection-side nearest-centroid argmax (see [[NearestCentroid]]):
    * centroid ids must be given ascending (the tiebreak order).
    */
  def nearest_centroid(
      v: Column,
      ids: IndexedSeq[Long],
      embs: IndexedSeq[IndexedSeq[Double]]): Column =
    Bridge.column(
      NearestCentroid(Bridge.expression(v.cast(ArrayType(DoubleType))), ids, embs))

  /** Top-`nprobe` centroid ids for multi-probe IVF (see [[TopNCentroids]]). */
  def nearest_centroids(
      v: Column,
      ids: IndexedSeq[Long],
      embs: IndexedSeq[IndexedSeq[Double]],
      nprobe: Int): Column =
    Bridge.column(
      TopNCentroids(Bridge.expression(v.cast(ArrayType(DoubleType))), ids, embs, nprobe))
}
