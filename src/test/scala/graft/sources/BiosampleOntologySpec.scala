package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BiosampleOntologySpec extends SparkSpec {

  private val obograph =
    """{"graphs": [{"id": "uberon.json",
      |  "nodes": [
      |    {"id": "http://purl.obolibrary.org/obo/UBERON_0000061",
      |     "lbl": "anatomical structure",
      |     "meta": {"definition": {"val": "a structure"},
      |              "xrefs": [{"val": "X1"}, {"val": "X2"}],
      |              "synonyms": [{"val": "structure"}]}},
      |    {"id": "http://purl.obolibrary.org/obo/UBERON_0000062", "lbl": "organ"},
      |    {"id": "http://purl.obolibrary.org/obo/UBERON_0000948", "lbl": "heart"}],
      |  "edges": [
      |    {"sub": "http://purl.obolibrary.org/obo/UBERON_0000062",
      |     "pred": "is_a",
      |     "obj": "http://purl.obolibrary.org/obo/UBERON_0000061"},
      |    {"sub": "http://purl.obolibrary.org/obo/UBERON_0000948",
      |     "pred": "is_a",
      |     "obj": "http://purl.obolibrary.org/obo/UBERON_0000062"},
      |    {"sub": "http://purl.obolibrary.org/obo/UBERON_0000948",
      |     "pred": "http://purl.obolibrary.org/obo/BFO_0000050",
      |     "obj": "http://purl.obolibrary.org/obo/UBERON_0000061"},
      |    {"sub": "http://purl.obolibrary.org/obo/UBERON_0000948",
      |     "pred": "comment",
      |     "obj": "http://purl.obolibrary.org/obo/UBERON_0000061"}]}]}"""
      .stripMargin

  test("fromObograph strips URIs, keeps is_a/part_of, closes the hierarchy") {
    import spark.implicits._
    val raw = spark.read.json(Seq(obograph).toDS())
    val out = BiosampleOntology.fromObograph(raw)
    val rows = out
      .selectExpr(
        "biosampleId", "biosampleName", "description",
        "array_sort(coalesce(xrefs, array())) AS x",
        "array_sort(coalesce(ancestors, array())) AS anc",
        "array_sort(coalesce(descendants, array())) AS des",
        "array_sort(coalesce(parents, array())) AS par")
      .as[(String, String, String, Seq[String], Seq[String], Seq[String], Seq[String])]
      .collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet === Set("UBERON_0000061", "UBERON_0000062", "UBERON_0000948"))
    val heart = rows("UBERON_0000948")
    assert(heart._2 === "heart")
    // is_a via organ plus direct part_of — both ancestors found transitively
    assert(heart._5 === Seq("UBERON_0000061", "UBERON_0000062"))
    assert(heart._7 === Seq("UBERON_0000061", "UBERON_0000062"))
    val root = rows("UBERON_0000061")
    assert(root._3 === "a structure" && root._4 === Seq("X1", "X2"))
    assert(root._6 === Seq("UBERON_0000062", "UBERON_0000948"))
    // the non-hierarchy "comment" edge contributes nothing
    assert(rows("UBERON_0000062")._6 === Seq("UBERON_0000948"))
  }

  test("mergeIndices: first non-null scalar wins, arrays union distinct") {
    import spark.implicits._
    val a = Seq(("B1", "name1", Seq("X1"))).toDF("biosampleId", "biosampleName", "xrefs")
    val b = Seq(("B1", null: String, Seq("X2", "X1")), ("B2", "name2", Seq.empty[String]))
      .toDF("biosampleId", "biosampleName", "xrefs")
    val out = BiosampleOntology.mergeIndices(Seq(a, b))
      .selectExpr("biosampleId", "biosampleName", "array_sort(xrefs) AS x")
      .as[(String, String, Seq[String])].collect().sortBy(_._1)
    assert(out(0) === (("B1", "name1", Seq("X1", "X2"))))
    assert(out(1) === (("B2", "name2", Seq.empty[String])))
  }

  test("retainRowsWithAncestorId filters on ancestor overlap") {
    import spark.implicits._
    val idx = Seq(
      ("B1", Seq("ROOT", "MID")), ("B2", Seq("OTHER"))
    ).toDF("biosampleId", "ancestors")
    val kept = BiosampleOntology
      .retainRowsWithAncestorId(idx, Seq("ROOT"))
      .select("biosampleId").as[String].collect()
    assert(kept.toSeq === Seq("B1"))
  }
}
