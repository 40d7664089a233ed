package graft.datasets

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqtlStudyIndexSpec extends SparkSpec {

  import spark.implicits._

  // target-index-shaped rows: (id, approvedSymbol, obsolete labels,
  // chromosome, tss, protein ids)
  private def targets = Seq(
    ("ENSG1", "TP53", Seq("P53"), "17", 100L, Seq("Q1")),
    ("ENSG2", "BRCA2", Seq.empty[String], "13", 200L, Seq("Q2")),
    // PAR pair: same protein on X and Y (reference example ASMTL,
    // target_index.py:97-106)
    ("ENSGX", "ASMTL", Seq.empty[String], "X", 300L, Seq("QPAR")),
    ("ENSGY", "ASMTL", Seq.empty[String], "Y", 300L, Seq("QPAR"))
  ).toDF("id", "approvedSymbol", "labels", "chrom", "tss", "pids")
    .select(
      col("id"), col("approvedSymbol"),
      expr("transform(labels, l -> named_struct('label', l))").as("obsoleteSymbols"),
      expr("named_struct('chromosome', chrom)").as("genomicLocation"),
      col("tss"),
      expr("transform(pids, p -> named_struct('id', p, 'source', 'uniprot_swissprot'))")
        .as("proteinIds"),
      expr("named_struct('chromosome', chrom)").as("canonicalTranscript"))

  test("symbolsLut includes obsoleted symbols (target_index.py:63-79)") {
    val lut = TargetIndex(targets).symbolsLut
      .select("geneSymbol", "geneId").as[(String, String)].collect().toSet
    assert(lut.contains(("TP53", "ENSG1")))
    assert(lut.contains(("P53", "ENSG1")), "obsolete symbol must resolve")
    assert(lut.contains(("BRCA2", "ENSG2")))
  }

  test("proteinIdLut keeps only the X copy of a PAR protein by default (target_index.py:81-133)") {
    val lut = TargetIndex(targets).proteinIdLut()
      .select("proteinId", "geneId").as[(String, String)].collect().toSeq
    assert(lut.count(_._1 == "QPAR") === 1)
    assert(lut.contains(("QPAR", "ENSGX")), "X-chromosome PAR copy kept")
    assert(!lut.contains(("QPAR", "ENSGY")), "Y-chromosome PAR copy dropped")
    val yLut = TargetIndex(targets).proteinIdLut(includeParChr = "Y")
      .select("proteinId", "geneId").as[(String, String)].collect().toSeq
    assert(yLut.contains(("QPAR", "ENSGY")))
    intercept[IllegalArgumentException](TargetIndex(targets).proteinIdLut("Z"))
  }

  test("tssLut falls back preferred tss → canonical transcript → genomic location (target_index.py:135-158)") {
    val df = Seq(
      // preferred tss wins
      ("g1", Some(11L), "+", 100L, 200L, 1, 300L, 400L),
      // canonical transcript by strand
      ("g2", None, "+", 100L, 200L, 1, 300L, 400L),
      ("g3", None, "-", 100L, 200L, 1, 300L, 400L),
      // genomic location by strand (unknown transcript strand)
      ("g4", None, "?", 100L, 200L, -1, 300L, 400L)
    ).toDF("id", "tss", "cstrand", "cstart", "cend", "gstrand", "gstart", "gend")
      .select(
        col("id"), col("tss"),
        expr("named_struct('strand', cstrand, 'start', cstart, 'end', cend)")
          .as("canonicalTranscript"),
        expr("named_struct('strand', gstrand, 'start', gstart, 'end', gend)")
          .as("genomicLocation"))
    val got = TargetIndex(df).tssLut
      .select("geneId", "tss").as[(String, Long)].collect().toMap
    assert(got === Map("g1" -> 11L, "g2" -> 100L, "g3" -> 200L, "g4" -> 400L))
  }

  test("toStudy resolves symbols, prefers curated ids and falls back to the protein LUT on ambiguity (study_index.py:885-936)") {
    val pqtl = Seq(
      // clean symbol → LUT id
      ("st1", null.asInstanceOf[String], "TP53", "Q1"),
      // curated id wins over the LUT
      ("st2", "ENSG_CURATED", "BRCA2", "Q2"),
      // AMBIG maps to two LUT genes → protein fallback
      ("st3", null.asInstanceOf[String], "AMBIG", "Q9")
    ).toDF("studyId", "gid", "sym", "prot")
      .select(
        col("studyId"),
        lit(null).cast("string").as("geneId"),
        array(expr("named_struct('geneId', gid, 'geneSymbol', sym, 'proteinId', prot)"))
          .as("targetsFromSource"))
    val symbolLut = Seq(
      ("TP53", "ENSG1"), ("BRCA2", "ENSG2"),
      ("AMBIG", "ENSGA"), ("AMBIG", "ENSGB")
    ).toDF("geneSymbol", "geneId")
    val proteinLut = Seq(("Q9", "ENSG9")).toDF("proteinId", "geneId")
    val got = PqtlStudyIndex.toStudy(pqtl, symbolLut, proteinLut)
      .select("studyId", "geneId").as[(String, String)].collect().toSeq
    assert(got.filter(_._1 == "st1") === Seq(("st1", "ENSG1")))
    assert(got.filter(_._1 == "st2") === Seq(("st2", "ENSG_CURATED")))
    // ambiguous symbol fans out through both LUT rows, each resolved via Q9
    assert(got.filter(_._1 == "st3") === Seq(("st3", "ENSG9"), ("st3", "ENSG9")))
  }
}
