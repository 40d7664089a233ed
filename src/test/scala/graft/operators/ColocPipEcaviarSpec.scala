package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ColocPipEcaviarSpec extends SparkSpec {

  test("merged result carries ColocPIP posteriors with eCAVIAR clpp") {
    import spark.implicits._
    val overlaps = Seq(
      ("l1", "r1", "eqtl", "1", "v1", 0.5, 0.5, 1.0, 1.0),
      ("l1", "r1", "eqtl", "1", "v2", 0.25, 0.75, 1.0, -1.0)
    ).toDF("leftStudyLocusId", "rightStudyLocusId", "rightStudyType", "chromosome",
      "tagVariantId", "lpp", "rpp", "lb", "rb")
      .select(
        col("leftStudyLocusId"), col("rightStudyLocusId"), col("rightStudyType"),
        col("chromosome"), col("tagVariantId"),
        struct(
          lit(null).cast("double").as("left_logBF"),
          col("lpp").as("left_posteriorProbability"),
          col("lb").as("left_beta"),
          lit(null).cast("float").as("left_pValueMantissa"),
          lit(null).cast("int").as("left_pValueExponent"),
          lit(null).cast("double").as("right_logBF"),
          col("rpp").as("right_posteriorProbability"),
          col("rb").as("right_beta"),
          lit(null).cast("float").as("right_pValueMantissa"),
          lit(null).cast("int").as("right_pValueExponent")
        ).as("statistics")
      )
    val got = Colocalisation.colocPipEcaviar(overlaps)
      .select("colocalisationMethod", "numberColocalisingVariants", "clpp", "h3", "h4")
      .as[(String, Long, Double, Double, Double)].head()
    assert(got._1 === "COLOC_PIP_ECAVIAR")
    assert(got._2 === 2L)
    assert(math.abs(got._3 - 0.4375) < 1e-9) // eCAVIAR clpp
    assert(math.abs(got._4 + got._5 - 1.0) < 1e-9) // PIP posteriors normalised
  }
}
