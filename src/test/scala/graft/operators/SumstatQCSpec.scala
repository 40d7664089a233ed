package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden values from the reference doctests
  * (method/sumstat_quality_controls.py:114-226).
  */
class SumstatQCSpec extends SparkSpec {

  test("gcLambda matches the reference doctest") {
    import spark.implicits._
    val df = Seq(
      ("S1", 1.81, 0.2), ("S1", -0.1, 0.2),
      ("S2", 1.0, 0.1), ("S2", 1.0, 0.1)
    ).toDF("studyId", "beta", "standardError")
    val got = SumstatQC.gcLambda(df)
      .select(col("studyId"), round(col("gc_lambda"), 2).as("l"))
      .as[(String, Double)].collect().toMap
    assert(got("S1") === 0.55)
    assert(got("S2") === 219.81)
  }

  test("pzTest matches the reference doctest") {
    import spark.implicits._
    val df = Seq(
      ("S1", 1.81, 0.2, 9.9f, -20), ("S1", -0.1, 0.2, 1.0f, -1),
      ("S2", 101.0, 10.0, 1.0f, -1), ("S2", 1.0, 0.1, 1.0f, -1), ("S2", 1.0, 0.1, 2.0f, -2)
    ).toDF("studyId", "beta", "standardError", "pValueMantissa", "pValueExponent")
    val got = SumstatQC.pzTest(df)
      .select(
        col("studyId"),
        round(col("mean_diff_pz"), 2).as("m"),
        round(col("se_diff_pz"), 2).as("s")
      )
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("S1") === ((0.47, 0.45)))
    assert(got("S2") === ((-21.47, 0.49)))
  }
}
