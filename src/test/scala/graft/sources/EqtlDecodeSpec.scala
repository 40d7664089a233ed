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
}
