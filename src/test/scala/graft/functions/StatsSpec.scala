package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden values from the reference doctests (common/stats.py, common/udf.py). */
class StatsSpec extends SparkSpec {

  private def d2(x: Any): Double = x.asInstanceOf[Double]

  test("chi2 special functions match scipy doctest values (common/udf.py)") {
    // chi2.isf(p, df=1): 0.1→2.71, 0.05→3.84, 0.001→10.83
    assert(math.abs(SpecialMath.chi2Isf(0.1) - 2.705543) < 1e-5)
    assert(math.abs(SpecialMath.chi2Isf(0.05) - 3.841459) < 1e-5)
    assert(math.abs(SpecialMath.chi2Isf(0.001) - 10.827566) < 1e-5)
    // chi2.sf(x, df=1): 1.0→0.32, 100→~0
    assert(math.abs(SpecialMath.chi2Sf(1.0) - 0.3173105) < 1e-6)
    assert(SpecialMath.chi2Sf(100.0) < 1e-20)
    // round-trip far below double precision of 1-p formulations
    assert(math.abs(SpecialMath.chi2Sf(SpecialMath.chi2Isf(1e-250)) / 1e-250 - 1.0) < 1e-6)
  }

  test("chi2FromPvalue doctest (common/stats.py:80-134)") {
    val df = spark
      .createDataFrame(Seq((5.0f, -8), (9.0f, -300), (9.0f, -301)))
      .toDF("pValueMantissa", "pValueExponent")
    val out = df
      .select(round(Stats.chi2FromPvalue(col("pValueMantissa"), col("pValueExponent")), 2))
      .collect()
      .map(r => d2(r.get(0)))
    assert(out.toSeq == Seq(29.72, 1369.48, 1373.64))
  }

  test("neglogpvalFromZ2 doctest (common/stats.py:196-240)") {
    val df = spark.createDataFrame(Seq(Tuple1(1.0), Tuple1(2000.0))).toDF("z2")
    val out =
      df.select(round(Stats.neglogpvalFromZ2(col("z2")), 2)).collect().map(r => d2(r.get(0)))
    assert(out.toSeq == Seq(0.5, 436.02))
  }

  test("neglogpvalFromPvalue doctest (common/stats.py:243-268)") {
    val df = spark.createDataFrame(Seq((1, 1), (5, -2), (1, -1000))).toDF("m", "e")
    val out = df.select(Stats.neglogpvalFromPvalue(col("m"), col("e"))).collect()
    assert(d2(out(0).get(0)) == -1.0)
    assert(math.abs(d2(out(1).get(0)) - 1.3010299956639813) < 1e-12)
    assert(d2(out(2).get(0)) == 1000.0)
  }

  test("pvalueFromNeglogpval doctest (common/stats.py:395-425)") {
    val df = spark.createDataFrame(Seq((4.56, "a"), (2109.23, "b"))).toDF("negLogPv", "label")
    val (m, e) = Stats.pvalueFromNeglogpval(col("negLogPv"))
    val out = df.select(m, e).collect()
    assert(math.abs(out(0).getFloat(0) - 2.7542286f) < 1e-5)
    assert(out(0).getInt(1) == -5)
    assert(math.abs(out(1).getFloat(0) - 5.8884363f) < 1e-5)
    assert(out(1).getInt(1) == -2110)
  }

  test("splitPvalueColumn doctest (common/stats.py:428-474)") {
    val df = spark
      .createDataFrame(Seq(Tuple1("0.01"), Tuple1("4.2E-45"), Tuple1("43.2E5"), Tuple1("0"), Tuple1("1")))
      .toDF("pval")
    val (m, e) = Stats.splitPvalueColumn(col("pval"))
    val out = df.select(m, e).collect()
    assert(out.map(r => (r.getFloat(0), r.getInt(1))).toSeq ==
      Seq((1.0f, -2), (4.2f, -45), (43.2f, 5), (2.225f, -308), (1.0f, 0)))
  }

  test("zscoreFromPvalue doctest (common/stats.py:572-619)") {
    val df = spark
      .createDataFrame(
        Seq(
          ("1.0", Some(-1.0)),
          ("0.9", Some(-1.0)),
          ("0.05", Some(1.0)),
          ("1e-300", Some(1.0)),
          ("1e-1000", None)
        )
      )
      .toDF("pval", "beta")
    val out = df
      .select(round(Stats.zscoreFromPvalue(col("pval"), col("beta")), 2))
      .collect()
      .map(r => d2(r.get(0)))
    assert(out.toSeq == Seq(0.0, -0.13, 1.96, 37.07, 67.75))
  }

  test("stderr doctest values (common/stats.py:477-569)") {
    val df = spark.createDataFrame(Seq((29.72, 3.0), (3.84, 1.0))).toDF("chi2", "beta")
    val out = df
      .select(round(Stats.stderrFromChi2AndEffectSize(col("chi2"), col("beta")), 2))
      .collect()
      .map(r => d2(r.get(0)))
    assert(out.toSeq == Seq(0.55, 0.51))

    val df2 = spark.createDataFrame(Seq((0.5, 0.1), (1.0, 0.5))).toDF("u", "l")
    val out2 =
      df2.select(round(Stats.stderrFromCi(col("u"), col("l")), 2)).collect().map(r => d2(r.get(0)))
    assert(out2.toSeq == Seq(0.41, 0.18))
  }

  test("ci doctest (common/stats.py:137-193)") {
    val df = spark
      .createDataFrame(
        Seq((2.5, -10, 0.5, Some(0.2)), (3.0, -5, 1.0, None), (1.5, -8, -0.2, Some(0.1)))
      )
      .toDF("m", "e", "beta", "se")
    val (lo, hi) = Stats.ci(col("m"), col("e"), col("beta"), col("se"))
    val out = df.select(lo, hi).collect()
    assert(math.abs(d2(out(0).get(0)) - 0.108) < 1e-12)
    assert(math.abs(d2(out(0).get(1)) - 0.892) < 1e-12)
    assert(math.abs(d2(out(1).get(0)) - 0.5303664052547075) < 1e-9)
    assert(math.abs(d2(out(1).get(1)) - 1.4696335947452925) < 1e-9)
    assert(math.abs(d2(out(2).get(0)) - (-0.396)) < 1e-12)
  }

  test("normaliseGwasStatistics doctest (common/stats.py:283-392)") {
    val data = Seq(
      (Some(0.1f), Some(1.1f), Some(0.1f), None, None, Some(9.0f), Some(-100)),
      (None, Some(1.1f), Some(0.1f), None, None, Some(9.0f), Some(-100)),
      (None, Some(1.1f), None, Some(1.30f), Some(0.90f), None, None),
      (Some(0.1f), Some(1.1f), None, Some(1.30f), Some(0.90f), None, None),
      (None, Some(1.1f), None, Some(1.30f), Some(0.90f), Some(9.0f), Some(-100)),
      (Some(0.1f), None, None, None, None, Some(9.0f), Some(-100)),
      (None, None, None, Some(1.3f), Some(0.9f), Some(9.0f), Some(-100))
    )
    val df = spark
      .createDataFrame(data)
      .toDF("beta", "oddsRatio", "standardError", "ci_upper", "ci_lower", "mantissa", "exp")
    val (beta, se) = Stats.normaliseGwasStatistics(
      col("beta"), col("oddsRatio"), col("standardError"),
      col("ci_upper"), col("ci_lower"), col("mantissa"), col("exp"))
    val out = df.select(round(beta, 2), round(se, 2)).collect()
    val exp = Seq(
      (Some(0.1), Some(0.1)), (Some(0.1), Some(0.1)), (Some(0.1), Some(0.09)),
      (Some(0.1), Some(0.09)), (Some(0.1), Some(0.0)), (Some(0.1), Some(0.0)),
      (None, None)
    )
    out.zip(exp).foreach { case (row, (b, s)) =>
      assert(Option(row.get(0)).map(d2) == b, s"beta $row")
      assert(Option(row.get(1)).map(d2) == s, s"se $row")
    }
  }

  test("logsumexp column expression matches scalar (common/stats.py:23-41)") {
    assert(math.abs(SpecialMath.logsum(Array(0.2, 0.1, 0.05, 0.0)) - 1.476557) < 1e-6)
    val df = spark.createDataFrame(Seq(Tuple1(Seq(0.2, 0.1, 0.05, 0.0)))).toDF("arr")
    val out = df.select(round(expressions.logsumexp(col("arr")), 6)).collect()
    assert(d2(out(0).get(0)) == 1.476557)
  }

  test("pvalueFilterCondition two-term predicate (dataset/summary_statistics.py:38-58)") {
    val df = spark
      .createDataFrame(Seq((4.9f, -8), (5.0f, -8), (5.1f, -8), (1.0f, -7), (1.0f, -9)))
      .toDF("m", "e")
    val out = df.filter(Stats.pvalueFilterCondition(col("m"), col("e"), 5e-8)).collect()
    assert(out.map(r => (r.getFloat(0), r.getInt(1))).toSet ==
      Set((4.9f, -8), (5.0f, -8), (1.0f, -9)))
  }

  test("GraftExtensions registers the codegen kernels as SQL functions") {
    val r = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  round(logsumexp(array(0.0D, 0.0D)), 9) AS lse,
        |  round(chi2_survival(3.841458820694124D), 6) AS p,
        |  round(norm_survival(0.0D), 6) AS ns
        |""".stripMargin).head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === math.rint(math.log(2.0) * 1e9) / 1e9)
    assert(r.getDouble(2) === 0.05)
    assert(r.getDouble(3) === 0.5)
  }

  test("DotProduct codegen expression: value, length-mismatch null, null-element null, HOF parity") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{aggregate, lit, zip_with}
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (2L, Seq[java.lang.Double](1.0), Seq[java.lang.Double](1.0, 2.0)), // length mismatch
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 1.0)) // null element
    ).toDF("id", "a", "b")
    val got = df
      .select(col("id"), graft.functions.expressions.dot_product(col("a"), col("b")).as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L) === Some(32.0))
    assert(got(2L) === None)
    assert(got(3L) === None)
    // parity with the interpreted HOF formulation on real-valued rows
    val hof = df.filter(col("id") === 1)
      .select(
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      .head().getDouble(0)
    assert(hof === 32.0)
  }
}
