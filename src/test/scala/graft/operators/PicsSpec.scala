package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden values from the reference doctests (method/pics.py:52-208). */
class PicsSpec extends SparkSpec {

  test("finemap matches the reference doctest posteriors") {
    import spark.implicits._
    // ld_set [(var1, r2=0.8), (var2, r2=1)], lead neglog p = 10:
    // posteriors [0.071, 0.929], standard errors [0.074, 0.998]
    val df = Seq(
      (Seq(("var1", 0.8), ("var2", 1.0)), 10.0)
    ).toDF("raw", "neglogP")
      .select(
        expr("transform(raw, x -> struct(x._1 AS tagVariantId, x._2 AS r2Overall))").as("ldSet"),
        col("neglogP")
      )
    val got = df
      .select(explode(Pics.finemap(col("ldSet"), col("neglogP"))).as("t"))
      .select(
        col("t.variantId"),
        round(col("t.posteriorProbability"), 3).as("pp"),
        round(col("t.standardError"), 3).as("se")
      )
      .as[(String, Double, Double)].collect().toSeq
    assert(got === Seq(("var1", 0.071, 0.074), ("var2", 0.929, 0.998)))
  }

  test("tags with r2 < 0.5 or null are dropped") {
    import spark.implicits._
    val df = Seq(
      (Seq(("var1", Some(0.3)), ("var2", None: Option[Double])), 10.0)
    ).toDF("raw", "neglogP")
      .select(
        expr("transform(raw, x -> struct(x._1 AS tagVariantId, x._2 AS r2Overall))").as("ldSet"),
        col("neglogP")
      )
    val got = df.select(size(Pics.finemap(col("ldSet"), col("neglogP"))).as("n"))
      .as[Int].head()
    assert(got === 0)
  }

  test("picsChecksum is the exact integer-µ rollup of the q_pics output") {
    import spark.implicits._
    // the checksum query (the sf0.1 golden carrier) must stay the pure
    // per-variant aggregate of q_pics — recompute it driver-side from the
    // collected q_pics rows and compare value-exactly; integer sums make
    // this deterministic regardless of aggregation order
    val d = "/root/testdata/sf0.001"
    val full = graft.harness.MiscQueries.pics(spark, d)
      .as[(String, String, Double, Double)].collect()
    val want = full.groupBy(_._2).map { case (v, rows) =>
      (v, rows.length.toLong,
        rows.map(r => math.floor(r._3 * 1e6).toLong).sum,
        rows.map(r => math.floor(r._4 * 1e6).toLong).sum)
    }.toSet
    val got = graft.harness.MiscQueries.picsChecksum(spark, d)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.size <= 186, "variant key space must stay golden-compact")
  }

  test("kernel helpers match reference doctests") {
    import spark.implicits._
    val one = Seq(1).toDF("x")
    def eval(c: org.apache.spark.sql.Column): Double =
      one.select(c.cast("double")).as[Double].head()
    // _pics_mu(10, 0.5) = 5.0
    assert(eval(Pics.mu(lit(10.0), lit(0.5))) === 5.0)
    // _pics_standard_deviation(10, 0.5, 6.4) ≈ 1.493
    assert(math.abs(eval(Pics.standardDeviation(lit(10.0), lit(0.5), 6.4)) - 1.493) < 5e-4)
    // _pics_standard_deviation(1, 1, 6.4) = 0.0
    assert(eval(Pics.standardDeviation(lit(1.0), lit(1.0), 6.4)) === 0.0)
  }
}
