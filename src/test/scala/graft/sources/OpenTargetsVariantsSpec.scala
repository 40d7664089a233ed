package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OpenTargetsVariantsSpec extends SparkSpec {

  import spark.implicits._

  test("LoF curation builds GRCh38/GRCh37 hybrid ids with normalised verdicts") {
    val lof = Seq(
      ("1-100-A-C", "1-101-A-C", "lof"),
      ("2-5-G-T", "2-5-G-T", "likely_not_lof")
    ).toDF("Variant ID GRCh37", "Variant ID GRCh38", "Verdict")
    val got = OpenTargetsVariants.lofAsVariantIndex(lof)
      .selectExpr(
        "variantId", "chromosome", "position",
        "variantEffect[0].assessment AS assessment",
        "variantEffect[0].normalisedScore AS n",
        "variantDescription")
      .as[(String, String, Int, String, Double, String)].collect().toSet
    assert(got === Set(
      ("1_101_A_C", "1", 101, "lof", 1.0,
        "Assessed to cause LoF by OTAR2075 variant curation effort."),
      ("2_5_G_T", "2", 5, "likely_not_lof", -0.5,
        "Suspected not to cause LoF by OTAR2075 variant curation effort.")))
  }

  test("FoldX ingest: pLDDT filter, ambiguous-accession exclusion, normalised ddG") {
    val foldx = Seq(
      // P1 clean: one plddt per (pos, wild_type)
      ("P1", 10, "A", "V", 0.9, 1.0),
      ("P1", 10, "A", "G", 0.9, 2.5),
      ("P1", 11, "A", "T", 0.3, 9.9), // below plddt threshold
      // P2 ambiguous: same (pos, wt) with two plddts → excluded entirely
      ("P2", 5, "L", "M", 0.8, 1.0),
      ("P2", 5, "L", "M", 0.95, 1.0)
    ).toDF("protein_acc", "position", "wild_type", "mutated_type", "plddt", "foldx_ddg")
    val got = OpenTargetsVariants.ingestFoldx(foldx, plddtThreshold = 0.7)
      .selectExpr(
        "uniprotAccession", "aminoAcidChange",
        "variantEffect[0].method AS m", "variantEffect[0].normalisedScore AS n")
      .as[(String, String, String, Double)].collect().toSet
    assert(got === Set(
      ("P1", "A10V", "FoldX", 0.5),
      ("P1", "A10G", "FoldX", 1.0)))
  }

  test("distance-to-gene extraction explodes transcripts and bounds the window") {
    val vi = Seq(
      ("v1", Seq(("G1", 100L), ("G2", 400000L))),
      ("v2", Seq(("G3", 499999L)))
    ).toDF("variantId", "raw")
      .select(
        col("variantId"),
        expr("transform(raw, x -> named_struct('targetId', x._1, 'distanceFromTss', x._2))")
          .as("transcriptConsequences"))
    val all = OpenTargetsVariants.getDistanceToGene(vi)
      .as[(String, String, Long)].collect().toSet
    assert(all === Set(("v1", "G1", 100L), ("v1", "G2", 400000L), ("v2", "G3", 499999L)))
    val near = OpenTargetsVariants.getDistanceToGene(vi, maxDistance = 1000)
      .as[(String, String, Long)].collect().toSet
    assert(near === Set(("v1", "G1", 100L)))
  }

  test("amino-acid consequence enrichment unions predictor arrays and keeps richest row") {
    val vi = Seq(
      ("v1", Seq(("A10V", Seq("P1"))), Seq("VEP")),
      ("v2", Seq((null.asInstanceOf[String], Seq.empty[String])), Seq("VEP"))
    ).toDF("variantId", "tc0", "ve0")
      .select(
        col("variantId"),
        expr(
          "transform(tc0, x -> named_struct('aminoAcidChange', x._1, 'uniprotAccessions', x._2))")
          .as("transcriptConsequences"),
        expr("transform(ve0, m -> named_struct('method', m))").as("variantEffect"))
    val aa = Seq(("P1", "A10V", Seq("FoldX")))
      .toDF("uniprotAccession", "aminoAcidChange", "ve0")
      .select(
        col("uniprotAccession"), col("aminoAcidChange"),
        expr("transform(ve0, m -> named_struct('method', m))").as("variantEffect"))
    val got = OpenTargetsVariants.annotateWithAminoAcidConsequences(vi, aa)
      .selectExpr("variantId", "transform(variantEffect, x -> x.method) AS methods")
      .as[(String, Seq[String])].collect().toMap
    assert(got("v1") === Seq("VEP", "FoldX"))
    assert(got("v2") === Seq("VEP"))
  }

  test("asVcf merges locus ids, drops dirty alleles, keeps rsId") {
    val variants = Seq(
      (Some("1_100_A_C"), Some(Seq("1_107_A_C")), Some("rs1")),
      (Some("1_200_A_N"), None, None), // non-ACGT alt dropped
      (None, Some(Seq("1_300_G_T")), None) // null variantId → row dropped
    ).toDF("variantId", "locus0", "variantRsId")
      .withColumn("locus", expr("transform(locus0, x -> named_struct('variantId', x))"))
      .drop("locus0")
    val got = OpenTargetsVariants.asVcf(variants)
      .selectExpr("`#CHROM`", "POS", "ID", "REF", "ALT")
      .as[(String, Int, String, String, String)].collect().toSet
    assert(got === Set(
      ("1", 100, "rs1", "A", "C"),
      ("1", 107, "rs1", "A", "C")))
  }

  test("getLoftee keeps only LOFTEE-annotated transcripts; HC is high-quality pLoF (variant_index.py:343-366)") {
    val vi = Seq(
      ("v1", Seq(("G1", Some("HC")), ("G2", Some("LC")), ("G3", None: Option[String]))),
      ("v2", Seq(("G4", None: Option[String])))
    ).toDF("variantId", "raw")
      .select(
        col("variantId"),
        expr("transform(raw, x -> named_struct('targetId', x._1, 'lofteePrediction', x._2))")
          .as("transcriptConsequences"))
    val got = VepParser.getLoftee(vi)
      .as[(String, String, String, Boolean)].collect().toSet
    assert(got === Set(
      ("v1", "G1", "HC", true),
      ("v1", "G2", "LC", false)))
  }
}
