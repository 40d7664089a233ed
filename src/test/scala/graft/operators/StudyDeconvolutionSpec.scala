package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StudyDeconvolutionSpec extends SparkSpec {

  import spark.implicits._

  private val studies = Seq(
    // s1: three sources, overlapping trait arrays, nSamples with a null,
    // a carrier column that must ride with the smallest non-null nSamples.
    ("s1", Seq("t2", "t1"), Option(300), "srcC"),
    ("s1", Seq("t1", "t3"), Option(100), "srcA"),
    ("s1", Seq.empty[String], None, "srcNull"),
    // s2: single row survives untouched.
    ("s2", Seq("t9"), Option(7), "srcB"),
    // s3: all-null scalar — merge keeps null and still emits one row.
    ("s3", Seq("t5"), None, "srcX"),
    ("s3", Seq("t4"), None, "srcY")
  ).toDF("studyId", "traits", "nSamples", "source")

  test("deconvolute merges duplicates: array union, scalar min, one row per study (study_index.py:683-839)") {
    val got = StudyDeconvolution
      .deconvolute(studies, arrayCols = Seq("traits"), scalarCols = Seq("nSamples"))
      .orderBy("studyId")
      .as[(String, Seq[String], Option[Int], String)]
      .collect()
    assert(got.length === 3)
    val (s1, s2, s3) = (got(0), got(1), got(2))
    assert(s1._2 === Seq("t1", "t2", "t3")) // union, distinct, sorted
    assert(s1._3 === Some(100))             // min ignoring null
    assert(s2 === (("s2", Seq("t9"), Some(7), "srcB")))
    assert(s3._2 === Seq("t4", "t5"))
    assert(s3._3 === None)                  // all-null scalar stays null
  }

  test("deconvolute carries unmerged columns from the row with the smallest non-null head scalar") {
    val got = StudyDeconvolution
      .deconvolute(studies, arrayCols = Seq("traits"), scalarCols = Seq("nSamples"))
      .filter(col("studyId") === "s1")
      .select("source").as[String].collect()
    // srcA holds nSamples=100 (the minimum); the null-scalar row never wins.
    assert(got === Array("srcA"))
  }

  test("degenerate call (no array/scalar/other columns) degrades to a dedup") {
    val ids = studies.select("studyId")
    val got = StudyDeconvolution
      .deconvolute(ids, arrayCols = Nil, scalarCols = Nil)
      .orderBy("studyId").as[String].collect()
    assert(got === Array("s1", "s2", "s3"))
  }

  test("deconvolute output schema and column order match the input") {
    val got = StudyDeconvolution
      .deconvolute(studies, arrayCols = Seq("traits"), scalarCols = Seq("nSamples"))
    assert(got.columns.toSeq === studies.columns.toSeq)
    // Nullability may tighten (a collect_list union is never null); names and
    // types must hold.
    assert(
      got.schema.map(f => (f.name, f.dataType)) ===
        studies.schema.map(f => (f.name, f.dataType)))
  }

  test("deconvolute plan is a single aggregate exchange: no window, no sort") {
    val plan = StudyDeconvolution
      .deconvolute(studies, arrayCols = Seq("traits"), scalarCols = Seq("nSamples"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected WindowExec:\n$plan")
    assert(!plan.contains("Sort"), s"unexpected sort:\n$plan")
  }
}
