package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Intervals

class StudyMetadataSpec extends SparkSpec {

  import spark.implicits._

  test("validateIdHasUniqueScore matches the reference doctest (intervals.py:509-523)") {
    val df = Seq(
      ("1", 100L, 200L, "ENSG1", "S1", "BS1", "E2G", "promoter", 0.5, "interval1"),
      ("1", 100L, 200L, "ENSG1", "S1", "BS1", "E2G", "promoter", 0.7, "interval2"),
      ("2", 300L, 400L, "ENSG2", "S1", "BS2", "E2G", "enhancer", 0.9, "interval3")
    ).toDF(
      "chromosome", "start", "end", "geneId", "studyId", "biosampleId",
      "datasourceId", "intervalType", "score", "intervalId")
    val got = Intervals.validateIdHasUniqueScore(df)
      .select(col("intervalId"), col("qualityControls"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("interval1") === Seq("Interval has a duplicate with different score"))
    assert(got("interval2") === Seq("Interval has a duplicate with different score"))
    assert(got("interval3") === Seq.empty)
  }

  test("annotateStudyType replaces studyType from the study index LUT (study_locus.py:233-249)") {
    val sl = Seq(("sl1", "s1", "stale"), ("sl2", "s2", "stale"), ("sl3", "sX", "stale"))
      .toDF("studyLocusId", "studyId", "studyType")
    val si = Seq(("s1", "gwas"), ("s2", "eqtl")).toDF("studyId", "studyType")
    val got = graft.datasets.StudyLocus(sl).annotateStudyType(si).df
      .select("studyLocusId", "studyType")
      .as[(String, Option[String])].collect().toMap
    assert(got === Map("sl1" -> Some("gwas"), "sl2" -> Some("eqtl"), "sl3" -> None))
  }

  test("appendStudyMetadata prefixes columns with the side and replaces rightStudyType (colocalisation.py:130-181)") {
    val coloc = Seq(("l1", "r1", "stale", 0.9), ("l1", "r2", "stale", 0.1))
      .toDF("leftStudyLocusId", "rightStudyLocusId", "rightStudyType", "h4")
    val sl = Seq(("r1", "s1"), ("r2", "s2"), ("l1", "s3"))
      .toDF("studyLocusId", "studyId")
    val si = Seq(("s1", "eqtl", "p1"), ("s2", "pqtl", "p2"), ("s3", "gwas", "p3"))
      .toDF("studyId", "studyType", "projectId")
    val right = Colocalisation
      .appendStudyMetadata(coloc, sl, si, Seq("studyType", "projectId"), "right")
    assert(right.columns.toSet ===
      Set("rightStudyLocusId", "leftStudyLocusId", "h4", "rightStudyId",
        "rightStudyType", "rightProjectId"))
    val byId = right.select("rightStudyLocusId", "rightStudyType", "rightProjectId")
      .as[(String, String, String)].collect().toMap2
    assert(byId("r1") === (("eqtl", "p1")))
    assert(byId("r2") === (("pqtl", "p2")))
    val sid = right.select("rightStudyLocusId", "rightStudyId")
      .as[(String, String)].collect().toMap
    assert(sid === Map("r1" -> "s1", "r2" -> "s2"),
      "studyId is always prepended to the appended metadata (colocalisation.py:150)")
    val left = Colocalisation
      .appendStudyMetadata(coloc, sl, si, Seq("projectId"), "left")
    assert(left.columns.contains("leftStudyId"))
    assert(left.columns.contains("leftProjectId"))
    assert(left.columns.contains("rightStudyType"), "left append must keep rightStudyType")
    intercept[IllegalArgumentException] {
      Colocalisation.appendStudyMetadata(coloc, sl, si, Seq("studyType"), "middle")
    }
  }

  private implicit class TupleMap(rows: Array[(String, String, String)]) {
    def toMap2: Map[String, (String, String)] =
      rows.map { case (k, a, b) => k -> ((a, b)) }.toMap
  }
}
