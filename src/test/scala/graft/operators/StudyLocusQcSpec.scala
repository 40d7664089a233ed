package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StudyLocusQcSpec extends SparkSpec {

  import spark.implicits._

  test("chromosome label validation flags non-canonical labels") {
    val df = Seq(("L1", "6"), ("L2", "X"), ("L3", "chr7"), ("L4", "26"))
      .toDF("studyLocusId", "chromosome")
    val got = StudyLocusQc.validateChromosomeLabel(df)
      .select("studyLocusId", "qualityControls")
      .as[(String, Seq[String])].collect().toMap
    assert(got("L1") === Seq.empty)
    assert(got("L2") === Seq.empty)
    assert(got("L3") === Seq(StudyLocusQc.InvalidChromosomeFlag))
    assert(got("L4") === Seq(StudyLocusQc.InvalidChromosomeFlag))
  }

  test("variant identifier validation flags loci with any unresolved variant") {
    val df = Seq(
      ("L1", Seq("v1", "v2")),
      ("L2", Seq("v1", "v9"))
    ).toDF("studyLocusId", "vids")
      .select(
        col("studyLocusId"),
        expr("transform(vids, x -> named_struct('variantId', x))").as("locus"))
    val vi = Seq("v1", "v2").toDF("variantId")
    val got = StudyLocusQc.validateVariantIdentifiers(df, vi)
      .select("studyLocusId", "qualityControls")
      .as[(String, Seq[String])].collect().toMap
    assert(got("L1") === Seq.empty)
    assert(got("L2") === Seq(StudyLocusQc.InvalidVariantIdentifierFlag))
  }

  test("lead p-value validation matches the reference doctest (study_locus.py:398-438)") {
    val df = Seq((1.0f, -7), (1.0f, -8), (5.0f, -8), (1.0f, -9))
      .toDF("pValueMantissa", "pValueExponent")
    val got = StudyLocusQc.validateLeadPvalue(df, 5e-8)
      .select("qualityControls").as[Seq[String]].collect().toSeq
    assert(got === Seq(
      Seq(StudyLocusQc.SubsignificantFlag), Seq.empty, Seq.empty, Seq.empty))
  }

  test("abnormal PIP sums are flagged, in-range kept") {
    val df = Seq(
      ("L1", Seq(0.5, 0.5)),
      ("L2", Seq(0.2, 0.2)), // 0.4 < 0.99
      ("L3", Seq(0.9, 0.2))  // 1.1 > 1.0001
    ).toDF("studyLocusId", "pps")
      .select(
        col("studyLocusId"),
        expr("transform(pps, x -> named_struct('posteriorProbability', x))").as("locus"))
    val got = StudyLocusQc.qcAbnormalPips(df)
      .select("studyLocusId", "qualityControls")
      .as[(String, Seq[String])].collect().toMap
    assert(got("L1") === Seq.empty)
    assert(got("L2") === Seq(StudyLocusQc.AbnormalPipsFlag))
    assert(got("L3") === Seq(StudyLocusQc.AbnormalPipsFlag))
  }

  test("MHC flag, redundant PICS top hits, confidence assignment") {
    val df = Seq(
      ("L1", "S1", "6", 26000000L, "PICS", Seq(StudyLocusQc.TopHitFlag)),
      ("L2", "S1", "1", 500L, "PICS", Seq.empty[String]),
      ("L3", "S2", "2", 900L, "SuSiE-inf", Seq(StudyLocusQc.OutOfSampleLdFlag)),
      ("L4", "S2", "2", 901L, "SuSie", Seq.empty[String]),
      ("L5", "S3", "3", 100L, "PICS", Seq(StudyLocusQc.TopHitFlag)),
      ("L6", "S3", "3", 200L, "other", Seq.empty[String])
    ).toDF("studyLocusId", "studyId", "chromosome", "position",
      "finemappingMethod", "qualityControls")
    val out = StudyLocusQc.assignConfidence(
      StudyLocusQc.qcRedundantTopHitsFromPics(StudyLocusQc.qcMhcRegion(df)))
      .select("studyLocusId", "qualityControls", "confidence")
      .as[(String, Seq[String], String)].collect().toMap2
    // L1: MHC + top hit + redundant (S1 has PICS sumstats via L2)
    assert(out("L1")._1.toSet === Set(
      StudyLocusQc.TopHitFlag, StudyLocusQc.InMhcFlag, StudyLocusQc.RedundantPicsTopHitFlag))
    assert(out("L1")._2 === StudyLocusQc.ConfidencePicsTopHit)
    assert(out("L2")._2 === StudyLocusQc.ConfidencePicsSumstats)
    assert(out("L3")._2 === StudyLocusQc.ConfidenceOutOfSampleLd)
    assert(out("L4")._2 === StudyLocusQc.ConfidenceInSampleLd)
    // L5: S3 has no PICS-sumstats locus → top hit NOT redundant
    assert(!out("L5")._1.contains(StudyLocusQc.RedundantPicsTopHitFlag))
    assert(out("L6")._2 === StudyLocusQc.ConfidenceUnknown)
  }

  test("credible-set log10BF matches the reference doctest (study_locus.py:653-681)") {
    val got = Seq(Seq(1.0, 0.5, 0.25, 0.0)).toDF("logBF")
      .select(round(StudyLocusQc.calculateCredibleSetLog10Bf(col("logBF"), 4), 7).as("bf"))
      .as[Double].collect().head
    assert(got === 0.2208288)
  }

  test("unique variants in locus are deduplicated across loci") {
    val df = Seq(
      ("L1", Seq("1_100_A_C", "2_5_G_T")),
      ("L2", Seq("1_100_A_C"))
    ).toDF("studyLocusId", "vids")
      .select(
        col("studyLocusId"),
        expr("transform(vids, x -> named_struct('variantId', x))").as("locus"))
    val got = StudyLocusQc.uniqueVariantsInLocus(df)
      .as[(String, String)].collect().toSet
    assert(got === Set(("1_100_A_C", "1"), ("2_5_G_T", "2")))
  }

  test("qcNoPopulation flags null LD population structure; no-op without the column (study_locus.py:1322-1340)") {
    val df = Seq(
      ("L1", Some("fin")),
      ("L2", None)
    ).toDF("studyLocusId", "ldPopulationStructure")
    val got = StudyLocusQc.qcNoPopulation(df)
      .select("studyLocusId", "qualityControls")
      .as[(String, Seq[String])].collect().toMap
    assert(got("L1") === Seq.empty)
    assert(got("L2") === Seq(StudyLocusQc.NoPopulationFlag))
    // frame without the column passes through untouched
    val plain = Seq("L3").toDF("studyLocusId")
    assert(StudyLocusQc.qcNoPopulation(plain).columns.toSeq === Seq("studyLocusId"))
  }

  test("tagVariantSource matches the reference doctest (colocalisation.py:26-57)") {
    val df = Seq(
      (Some("a"), Some("b")),
      (None: Option[String], Some("b")),
      (Some("a"), None: Option[String])
    ).toDF("a", "b")
      .select(
        struct(
          col("a").as("left_posteriorProbability"),
          col("b").as("right_posteriorProbability")).as("statistics"))
    val got = df.select(Overlaps.tagVariantSource(col("statistics")).as("source"))
      .as[String].collect().toSeq
    assert(got === Seq("both", "right", "left"))
  }

  private implicit class MapOps(rows: Array[(String, Seq[String], String)]) {
    def toMap2: Map[String, (Seq[String], String)] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
