package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnnotationsSpec extends SparkSpec {

  test("boundary annotation collects tags inside [locusStart, locusEnd]") {
    import spark.implicits._
    val clumped = Seq(("L1", "s1", "1", 100, 200)).toDF(
      "studyLocusId", "studyId", "chromosome", "locusStart", "locusEnd")
    val ss = Seq(
      ("s1", "1", 150, "v_in", 0.1, 1.0f, -8, 0.01),
      ("s1", "1", 250, "v_out", 0.2, 2.0f, -5, 0.02),
      ("s2", "1", 150, "v_other_study", 0.3, 3.0f, -4, 0.03)
    ).toDF("studyId", "chromosome", "position", "variantId", "beta",
      "pValueMantissa", "pValueExponent", "standardError")
    val got = Annotations.annotateLocusStatisticsBoundaries(clumped, ss)
      .select(col("studyLocusId"), expr("transform(locus, x -> x.variantId)").as("tags"))
      .as[(String, Seq[String])].head()
    assert(got === (("L1", Seq("v_in"))))
  }

  test("locus annotation is a BINNED broadcast hash join (no per-chromosome " +
    "residual scan, no sumstats shuffle before the join)") {
    import spark.implicits._
    val clumped = Seq(("L1", "s1", "1", 150)).toDF(
      "studyLocusId", "studyId", "chromosome", "position")
    val ss = Seq(
      ("s1", "1", 150, "v1", 0.1, 1.0f, -8, 0.01),
      ("s1", "1", 950, "v2", 0.2, 2.0f, -5, 0.02)
    ).toDF("studyId", "chromosome", "position", "variantId", "beta",
      "pValueMantissa", "pValueExponent", "standardError")
    val plan = Annotations.annotateLocusStatistics(clumped, ss, 100)
      .queryExecution.executedPlan.toString
    // hash join on the (studyId, chromosome, bin) key — not a nested-loop
    // scan of every lead on the chromosome; bin term rides the hash key
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("FLOOR"), plan)
    // boundaries twin keeps the same shape
    val clumped2 = Seq(("L1", "s1", "1", 100, 200)).toDF(
      "studyLocusId", "studyId", "chromosome", "locusStart", "locusEnd")
    val plan2 = Annotations.annotateLocusStatisticsBoundaries(clumped2, ss)
      .queryExecution.executedPlan.toString
    assert(plan2.contains("BroadcastHashJoin") &&
      !plan2.contains("BroadcastNestedLoopJoin"), plan2)
  }
}
