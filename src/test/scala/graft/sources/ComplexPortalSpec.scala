package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.SchemaRegistry

class ComplexPortalSpec extends SparkSpec {

  import spark.implicits._

  test("parseSource extracts PSI-MI id and source name (complex_portal/__init__.py:139-155)") {
    val rows = Seq("psi-mi:\"MI:0469\"(IntAct)", "").toDF("raw")
      .select(ComplexPortal.parseSource(col("raw")).as("s"))
      .select("s.id", "s.source").as[(String, String)].collect().toSeq
    assert(rows === Seq(("MI:0469", "IntAct"), ("", "")))
  }

  test("parseEvidenceCodes keeps only ECO accessions (complex_portal/__init__.py:157-172)") {
    val got = Seq(
      "ECO:0000353",
      "ECO:0000353|ECO:0005543",
      "pubmed:12345(ECO:0000353)"
    ).toDF("raw")
      .select(ComplexPortal.parseEvidenceCodes(col("raw")).as("codes"))
      .as[Seq[String]].collect().toSeq
    assert(got === Seq(
      Seq("ECO:0000353"),
      Seq("ECO:0000353", "ECO:0005543"),
      Seq("ECO:0000353")))
  }

  test("parseCrossReferences splits source:id(description) entries (complex_portal/__init__.py:174-192)") {
    val got = Seq("reactome:R-HSA-9736938(identity)|wwpdb:1U7V(subset)").toDF("raw")
      .select(explode(ComplexPortal.parseCrossReferences(col("raw"))).as("x"))
      .select("x.source", "x.id").as[(String, String)].collect().toSeq
    assert(got === Seq(("reactome", "R-HSA-9736938"), ("wwpdb", "1U7V")))
  }

  test("parseComponents handles stoichiometry and hyphenated isoforms (complex_portal/__init__.py:194-217)") {
    val got = Seq("P04637(2)|Q9Y6K9(1)|P12345-1(3)").toDF("raw")
      .select(explode(ComplexPortal.parseComponents(col("raw"))).as("c"))
      .select("c.id", "c.stoichiometry", "c.source")
      .as[(String, String, String)].collect().toSeq
    assert(got === Seq(
      ("P04637", "2", "uniprot"),
      ("Q9Y6K9", "1", "uniprot"),
      ("P12345-1", "3", "uniprot")))
  }

  private def tabRow(
      ac: String,
      taxonomy: Int,
      participants: String,
      source: String): Row =
    Row(
      ac, "a complex", "-", taxonomy, "-", "ECO:0000353", "-", "-",
      "reactome:R-HSA-1(identity)", "a description", "props", "Heterodimer",
      "-", "-", "-", "-", "-", source, participants)

  test("fromComplexTab unions, filters to human and matches the molecular_complex schema (complex_portal/__init__.py:86-136)") {
    val experimental = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        tabRow("CPX-1", 9606, "P84022(1)|Q13485(1)|Q15796(1)", "psi-mi:\"MI:0469\"(IntAct)"),
        tabRow("CPX-2", 10090, "P04637(2)", "psi-mi:\"MI:0469\"(IntAct)"))),
      ComplexPortal.rawSchema)
    val predicted = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        tabRow("CPX-3", 9606, "P16220(1)|P18848(1)", "psi-mi:\"MI:1197\"(complex portal predicted)"))),
      ComplexPortal.rawSchema)
    val out = ComplexPortal.fromComplexTab(experimental, predicted)
    val ids = out.df.select("id").as[String].collect().toSet
    assert(ids === Set("CPX-1", "CPX-3")) // mouse CPX-2 dropped
    assert(out.df.schema.map(f => (f.name, f.dataType.simpleString)) ===
      SchemaRegistry("molecular_complex").map(f => (f.name, f.dataType.simpleString)))
    val cpx1 = out.df.filter(col("id") === "CPX-1")
      .select(explode(col("components")).as("c")).select("c.id")
      .as[String].collect().toSeq
    assert(cpx1 === Seq("P84022", "Q13485", "Q15796"))
  }
}
