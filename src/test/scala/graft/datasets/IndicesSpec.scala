package graft.datasets

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IndicesSpec extends SparkSpec {

  test("TargetIndex.filterByBiotypes keeps only approved biotypes") {
    import spark.implicits._
    val df = Seq(("g1", "protein_coding"), ("g2", "lncRNA"), ("g3", "pseudogene"))
      .toDF("id", "biotype")
    val got = TargetIndex(df).filterByBiotypes(Seq("protein_coding", "lncRNA"))
      .df.select("id").as[String].collect().toSet
    assert(got === Set("g1", "g2"))
  }

  test("VariantIndex.filterByVariant is a semi join") {
    import spark.implicits._
    val idx = VariantIndex(Seq("v1", "v2", "v3").toDF("variantId"))
    val keep = Seq("v2", "v2", "v9").toDF("variantId")
    val got = idx.filterByVariant(keep).df.as[String].collect().toSeq
    assert(got === Seq("v2"))
  }

  test("StudyIndex.qtlStudies drops gwas studies") {
    import spark.implicits._
    val si = StudyIndex(Seq(("s1", "gwas"), ("s2", "eqtl")).toDF("studyId", "studyType"))
    assert(si.qtlStudies.df.select("studyId").as[String].collect().toSeq === Seq("s2"))
  }
}
