package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EqtlDecodeSpec extends SparkSpec {

  test("eQTL Catalogue credible sets: dataset id, cs index, rsid dedup") {
    import spark.implicits._
    val dir = Files.createTempDirectory("eqtl")
    val p = dir.resolve("QTD000584.credible_sets.tsv")
    Files.writeString(
      p,
      """molecular_trait_id	gene_id	cs_id	variant	rsid	cs_size	pip	pvalue	beta	se	z	cs_min_r2	region
        |T1	ENSG1	T1_L1	chr1_100_A_T	rs1	2	0.8	1e-9	0.5	0.1	5.0	0.9	chr1:1-1000
        |T1	ENSG1	T1_L1	chr1_100_A_T	rs1b	2	0.8	1e-9	0.5	0.1	5.0	0.9	chr1:1-1000
        |T1	ENSG1	T1_L2	chr1_200_C_G	rs2	1	0.99	1e-12	0.7	0.1	7.0	1.0	chr1:1-1000
        |""".stripMargin
    )
    val df = EqtlCatalogue.readCredibleSets(spark, p.toString)
    // rsid explosion collapsed: 2 distinct rows remain
    assert(df.count() === 2)
    val row = df.filter(col("cs_id") === "T1_L2")
      .select("dataset_id", "credibleSetIndex").as[(String, Int)].head()
    assert(row === (("QTD000584", 2)))
  }

  test("deCODE allele-frequency inference matches the reference doctest") {
    import spark.implicits._
    val got = Seq((0.01, Some(0.02)), (0.01, Some(0.6)), (0.01, None: Option[Double]))
      .toDF("impMAF", "EUR_AF")
      .select(round(Decode.inferAlleleFrequency(col("impMAF"), col("EUR_AF")), 2).as("eaf"))
      .as[Double].collect().toSeq
    assert(got === Seq(0.01, 0.99, 0.01))
    val sid = Seq("x").toDF("d")
      .select(Decode.studyIdFromFile(lit("DECODE"), lit("/a/b/Proteomics_SomaScan_1.txt.gz")))
      .as[String].head()
    assert(sid === "DECODE_Proteomics_SomaScan_1")
  }

  test("study type identification matches the reference doctest (study_index.py:60-87)") {
    import spark.implicits._
    val got = Seq(("ge", "bulk"), ("leafcutter", "bulk"), ("tx", "single-cell"))
      .toDF("quant_method", "study_type")
      .select(EqtlCatalogue.identifyStudyType(col("quant_method"), col("study_type")))
      .as[String].collect().toSeq
    assert(got === Seq("eqtl", "sqtl", "sceqtl"))
  }

  test("SuSiE results parse + collapse into credible-set StudyLocus rows") {
    import spark.implicits._
    val cs = Seq(
      // two variants in credible set L1 of trait T1; chr-prefixed variant ids
      ("T1", "r1", "chr1_100_A_C", "D1", 1, 0.8, 1e-9, 0.5, 0.05, "ENSG1"),
      ("T1", "r1", "chr1_200_G_T", "D1", 1, 0.2, 1e-7, 0.4, 0.04, "ENSG1"),
      // single-variant credible set 2
      ("T1", "r1", "chr1_300_A_G", "D1", 2, 1.0, 1e-12, 0.3, 0.03, "ENSG1")
    ).toDF("molecular_trait_id", "region", "variant", "dataset_id",
      "credibleSetIndex", "pip", "pvalue", "beta", "se", "gene_id")
    val lbf = Seq(
      ("T1", "r1", "chr1_100_A_C", "D1", "1", 100, 3.0, 0.1),
      ("T1", "r1", "chr1_200_G_T", "D1", "1", 200, 2.0, 0.2),
      ("T1", "r1", "chr1_300_A_G", "D1", "1", 300, 0.5, 4.0)
    ).toDF("molecular_trait_id", "region", "variant", "dataset_id",
      "chromosome", "position", "lbf_variable1", "lbf_variable2")
      .withColumns((3 to 10).map(i => s"lbf_variable$i" -> lit(0.0)).toMap)
    val meta = Seq(
      ("D1", "S1", "GTEx", "adipose", "UBERON_0001", "naive", 500, "ge", "123", "bulk")
    ).toDF("dataset_id", "study_id", "study_label", "sample_group", "tissue_id",
      "condition_label", "sample_size", "quant_method", "pmid", "study_type")
    val parsed = EqtlCatalogue.parseSusieResults(cs, lbf, meta)
    val out = EqtlCatalogue.fromSusieResults(parsed)
      .selectExpr(
        "variantId", "credibleSetIndex", "studyType", "studyId",
        "size(locus) AS n", "round(credibleSetlog10BF, 4) AS bf",
        "round(locus[0].logBF, 2) AS leadBF")
      .as[(String, Int, String, String, Int, Double, Double)]
      .collect().sortBy(_._2)
    assert(out.length === 2)
    val l1 = out(0)
    assert(l1._1 === "1_100_A_C") // lead by pip, chr prefix stripped
    assert(l1._3 === "eqtl")
    assert(l1._4 === "gtex_ge_adipose_t1")
    assert(l1._5 === 2)
    // credible set 1: logBFs [3.0, 2.0] (lbf_variable1)
    assert(l1._7 === 3.0)
    val expectedBf = (math.log(math.exp(3.0) + math.exp(2.0)) - math.log(500.0)) / math.log(10.0)
    assert(math.abs(l1._6 - math.round(expectedBf * 10000) / 10000.0) < 1e-9)
    // credible set 2 picks lbf_variable2
    assert(out(1)._1 === "1_300_A_G" && out(1)._5 === 1)
  }
}
