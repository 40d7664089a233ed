package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CredibleSetsSpec extends SparkSpec {

  test("threshold-crossing variant stays in the credible set (slice i-1 trick)") {
    import spark.implicits._
    // pps sorted desc: 0.94, 0.05, 0.01 — cumsums BEFORE each: 0, 0.94, 0.99.
    // 95% set: first two (0 < 0.95, 0.94 < 0.95); third excluded (0.99 >= 0.95).
    // 99% set: first two included, third excluded only at 0.99 boundary (0.99 < 0.99 false).
    val df = Seq(
      ("L1", Seq(("v2", 0.05), ("v1", 0.94), ("v3", 0.01)))
    ).toDF("studyLocusId", "raw")
      .select(
        col("studyLocusId"),
        expr("transform(raw, x -> struct(x._1 AS variantId, x._2 AS posteriorProbability))")
          .as("locus")
      )
    val got = CredibleSets
      .annotateCredibleSets(df)
      .select(explode(col("locus")).as("t"))
      .select(
        col("t.variantId"), col("t.is95CredibleSet"), col("t.is99CredibleSet"))
      .as[(String, Boolean, Boolean)].collect().toSeq
    assert(got === Seq(("v1", true, true), ("v2", true, true), ("v3", false, false)))
  }

  test("empty and null loci are preserved as null") {
    import spark.implicits._
    val df = Seq(("L1", Seq.empty[(String, Double)]))
      .toDF("studyLocusId", "raw")
      .select(
        col("studyLocusId"),
        expr("transform(raw, x -> struct(x._1 AS variantId, x._2 AS posteriorProbability))")
          .as("locus")
      )
    val got = CredibleSets.annotateCredibleSets(df).select("locus").collect()
    assert(got.head.isNullAt(0))
  }
}
