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
}
