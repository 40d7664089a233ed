package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Property-based checks for the scalar kernels — invariants that hold for
  * any input, complementing the golden-value doctests. Each property is
  * evaluated in one batched Spark job over generated rows (no per-case
  * session round trip).
  */
class KernelPropertiesSpec extends SparkSpec {

  test("reverseComplement is an involution on ACTG strings") {
    import spark.implicits._
    val gen = Gen.listOfN(200, Gen.nonEmptyListOf(Gen.oneOf('A', 'C', 'T', 'G')).map(_.mkString))
    val alleles = gen.sample.get
    val out = alleles.toDF("a")
      .select(
        col("a"),
        graft.sources.GwasCatalog.reverseComplement(
          graft.sources.GwasCatalog.reverseComplement(col("a"))).as("rc2"))
      .as[(String, String)].collect()
    assert(out.forall { case (a, rc2) => rc2 == a })
  }

  test("reverseComplement output never shares a strand-resolvable SNP with its input") {
    // For single bases, rc(x) != x always (A<->T, C<->G)
    import spark.implicits._
    val out = Seq("A", "C", "T", "G").toDF("a")
      .select(graft.sources.GwasCatalog.reverseComplement(col("a")).as("rc"), col("a"))
      .as[(String, String)].collect()
    assert(out.forall { case (rc, a) => rc != a })
  }

  test("sorted_lower_bound equals the linear HOF count on random sorted arrays, and nulls bin to 0") {
    import spark.implicits._
    val gen = Gen.listOfN(
      300,
      for {
        arr <- Gen.listOf(Gen.choose(-100.0, 100.0))
        x <- Gen.choose(-120.0, 120.0)
        dup <- Gen.oneOf(true, false)
      } yield (if (dup && arr.nonEmpty) (arr.head :: arr).sorted else arr.sorted, x))
    val cases = gen.sample.get :+ ((Nil: List[Double]), 0.0)
    val out = cases.toDF("bnds", "x")
      .select(
        expressions.sorted_lower_bound(col("bnds"), col("x")).as("cg"),
        coalesce(
          aggregate(col("bnds"), lit(0), (acc, b) => acc + when(col("x") > b, 1).otherwise(0)),
          lit(0)).as("hof"))
      .as[(Int, Int)].collect()
    out.foreach { case (cg, hof) => assert(cg == hof, s"binary search $cg != linear $hof") }
    val nulls = Seq((None: Option[Seq[Double]], None: Option[Double]))
      .toDF("bnds", "x")
      .select(
        expressions.sorted_lower_bound(col("bnds"), col("x")).as("a"),
        expressions.sorted_lower_bound(array(lit(1.0), lit(2.0)), col("x")).as("b"))
      .as[(Int, Int)].collect()
    assert(nulls.toSeq == Seq((0, 0)), "null array and null value both bin to 0")
  }

  test("harmonic sum is monotone in set size and bounded by the theoretical max") {
    import spark.implicits._
    val gen = Gen.listOfN(100, Gen.nonEmptyListOf(Gen.choose(0.0, 1.0)))
    val arrays = gen.sample.get
    val out = arrays.map(a => (a, a :+ 0.5)).toDF("a", "b")
      .select(
        ArrayOps.calculateHarmonicSum(col("a")).as("ha"),
        ArrayOps.calculateHarmonicSum(col("b")).as("hb"))
      .as[(Double, Double)].collect()
    // adding an element never decreases the harmonic sum; scores in [0,1]
    // keep the normalised sum in [0,1]
    assert(out.forall { case (ha, hb) => hb >= ha - 1e-12 })
    assert(out.forall { case (ha, _) => ha >= 0.0 && ha <= 1.0 + 1e-9 })
  }

  test("splitPvalueColumn round-trips: mantissa * 10^exponent ~= p") {
    import spark.implicits._
    val gen = Gen.listOfN(200, Gen.choose(1e-30, 1.0))
    val ps = gen.sample.get
    val out = ps.map(p => f"$p%.3e").toDF("p")
      .select(col("p"), {
        val (m, e) = Stats.splitPvalueColumn(col("p"))
        struct(m, e).as("s")
      })
      .selectExpr("CAST(p AS DOUBLE) AS p", "s.pValueMantissa AS m", "s.pValueExponent AS e")
      .as[(Double, Float, Int)].collect()
    assert(out.forall { case (p, m, e) =>
      val rt = m * math.pow(10.0, e)
      math.abs(rt - p) <= 5e-3 * p + 1e-300 // mantissa rounded to 3 decimals
    })
  }

  test("pvalueFilterCondition agrees with the materialised double comparison") {
    import spark.implicits._
    val gen = Gen.listOfN(300, Gen.zip(Gen.choose(1.0, 9.999), Gen.choose(-300, 0)))
    val cases = gen.sample.get
    val threshold = 5e-8
    val out = cases.toDF("m", "e")
      .select(
        col("m"), col("e"),
        Stats.pvalueFilterCondition(
          col("m").cast("float"), col("e"), threshold).as("cond"))
      .as[(Double, Int, Boolean)].collect()
    assert(out.forall { case (m, e, cond) =>
      val p = m.toFloat * math.pow(10.0, e)
      // two-term comparison must match p <= threshold except at exact
      // boundary rounding of the driver-side split (half-even at 3 digits)
      if (math.abs(p / threshold - 1.0) < 1e-3) true
      else cond == (p <= threshold)
    })
  }

  test("inferAlleleFrequency always returns impMaf or its complement") {
    import spark.implicits._
    val gen = Gen.listOfN(200, Gen.zip(Gen.choose(0.0, 0.5), Gen.option(Gen.choose(0.0, 1.0))))
    val cases = gen.sample.get
    val out = cases.map { case (maf, eur) => (maf, eur.map(Double.box).orNull) }
      .toDF("maf", "eur")
      .select(
        col("maf"), col("eur"),
        graft.sources.Decode.inferAlleleFrequency(col("maf"), col("eur")).as("af"))
      .as[(Double, Option[Double], Double)].collect()
    assert(out.forall { case (maf, eur, af) =>
      math.abs(af - maf) < 1e-12 || math.abs(af - (1.0 - maf)) < 1e-12
    })
    // null EUR always falls back to impMaf
    assert(out.filter(_._2.isEmpty).forall { case (maf, _, af) => af == maf })
  }

  test("repetition kernels stay in their bounds for arbitrary token lists") {
    import spark.implicits._
    import graft.operators.TextOps
    val gen = Gen.listOfN(
      150,
      Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "e f")).map(_.mkString(" ")))
    val texts = gen.sample.get
    val out = texts.toDF("text")
      .select(TextOps.tokenize(col("text")).as("toks"))
      .select(
        TextOps.duplicateNgramFraction(col("toks"), 2).as("d2"),
        TextOps.topTokenRatio(col("toks")).as("tr"),
        size(col("toks")).as("n"))
      .as[(Double, Double, Int)].collect()
    // dup fraction in [0,1); top-token ratio in (0,1] for non-empty docs
    assert(out.forall { case (d2, _, _) => d2 >= 0.0 && d2 < 1.0 })
    assert(out.filter(_._3 > 0).forall { case (_, tr, n) => tr >= 1.0 / n - 1e-12 && tr <= 1.0 })
    // a fully repeated doc maxes both signals
    val rep = Seq("x x x x x x").toDF("text")
      .select(TextOps.tokenize(col("text")).as("toks"))
      .select(
        TextOps.duplicateNgramFraction(col("toks"), 2).as("d2"),
        TextOps.topTokenRatio(col("toks")).as("tr"))
      .as[(Double, Double)].head()
    assert(rep === ((0.8, 1.0))) // 5 bigrams, 1 distinct → 1 - 1/5
  }

  test("codegen DotProduct is bit-identical to the interpreted HOF formulation on random vectors") {
    import spark.implicits._
    val gen = Gen.listOfN(
      300,
      Gen.zip(
        Gen.listOfN(16, Gen.choose(-1e3, 1e3)),
        Gen.listOfN(16, Gen.choose(-1e3, 1e3))))
    val rows = gen.sample.get.map { case (a, b) => (a, b) }
    val out = rows.toDF("a", "b")
      .select(
        expressions.dot_product(col("a"), col("b")).as("cg"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
          .as("hof"))
      .as[(Double, Double)].collect()
    assert(out.nonEmpty)
    // bit-identical, not approximately equal: same accumulation order
    assert(out.forall { case (cg, hof) =>
      java.lang.Double.doubleToLongBits(cg) == java.lang.Double.doubleToLongBits(hof)
    })
  }

  test("codegen LogSumExp matches the interpreted HOF formulation to <= 4 ulp on random arrays") {
    import spark.implicits._
    // NOT bit-identity: both sides call Math.exp/Math.log, whose HotSpot C2
    // intrinsics may differ from the non-intrinsified call by 1 ulp — so two
    // call sites in different JIT compilation states (e.g. a warm full-suite
    // JVM vs a fresh one) can drift a few ulps on identical inputs. The
    // accumulation ORDER is pinned identical (see DotProduct's true
    // bit-identity test for the exact-op case); tolerance covers only the
    // transcendental intrinsics.
    val gen = Gen.listOfN(300, Gen.listOfN(12, Gen.choose(-50.0, 50.0)))
    val rows = gen.sample.get :+ List.fill(3)(Double.NegativeInfinity)
    val hofLse = {
      val arr = col("a")
      val mx = array_max(arr)
      when(mx === lit(Double.NegativeInfinity), lit(Double.NegativeInfinity))
        .otherwise(
          mx + log(aggregate(transform(arr, x => exp(x - mx)), lit(0.0), (acc, x) => acc + x)))
    }
    val out = rows.toDF("a")
      .select(expressions.logsumexp(col("a")).as("cg"), hofLse.as("hof"))
      .as[(Double, Double)].collect()
    assert(out.forall { case (cg, hof) =>
      val cgBits = java.lang.Double.doubleToLongBits(cg)
      val hofBits = java.lang.Double.doubleToLongBits(hof)
      // same-sign finite values: ulp distance IS the bits distance; the
      // appended -Inf row compares bits-equal (distance 0)
      cgBits == hofBits || ((cg.signum == hof.signum) && math.abs(cgBits - hofBits) <= 4L)
    })
  }

  test("codegen LogSumExp matches the HOF's null ordering on null-bearing arrays") {
    import spark.implicits._
    // the HOF's array_max ignores nulls and its -Inf branch short-circuits
    // BEFORE the null-propagating aggregate: [null, -Inf] → -Inf, while any
    // null alongside a finite max → null, and all-null/empty → null
    val rows: Seq[Seq[Option[Double]]] = Seq(
      Seq(None, Some(Double.NegativeInfinity)),
      Seq(Some(Double.NegativeInfinity), None, Some(Double.NegativeInfinity)),
      Seq(None, Some(1.5), Some(0.25)),
      Seq(Some(2.0), None),
      Seq(None, None),
      Seq.empty
    )
    val hofLse = {
      val arr = col("a")
      val mx = array_max(arr)
      when(mx === lit(Double.NegativeInfinity), lit(Double.NegativeInfinity))
        .otherwise(
          mx + log(aggregate(transform(arr, x => exp(x - mx)), lit(0.0), (acc, x) => acc + x)))
    }
    val out = rows.toDF("a")
      .select(expressions.logsumexp(col("a")).as("cg"), hofLse.as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0)) assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)), s"value mismatch: $r")
    }
    assert(out(0).getDouble(0) == Double.NegativeInfinity)
    assert(out(2).isNullAt(0) && out(4).isNullAt(0) && out(5).isNullAt(0))
  }

  test("bindOnce exposes bound values identical to direct references") {
    import spark.implicits._
    val gen = Gen.listOfN(50, Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0)))
    val arrays = gen.sample.get
    val out = arrays.toDF("v")
      .select(
        // direct form: mn/span re-inlined per element (the slow idiom)
        transform(
          col("v"),
          x => (x - array_min(col("v"))) / (array_max(col("v")) - array_min(col("v")) + 1.0))
          .as("direct"),
        ArrayOps.bindOnce(
          "mn" -> array_min(col("v")),
          "span" -> (array_max(col("v")) - array_min(col("v")) + 1.0)) { get =>
          transform(col("v"), x => (x - get("mn")) / get("span"))
        }.as("bound"))
      .as[(Seq[Double], Seq[Double])].collect()
    out.foreach { case (direct, bound) =>
      assert(direct.length == bound.length)
      direct.zip(bound).foreach { case (d, b) =>
        assert(
          java.lang.Double.doubleToLongBits(d) == java.lang.Double.doubleToLongBits(b),
          s"bindOnce changed the value: $d vs $b")
      }
    }
  }
}
