package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  private def writeFixture(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-src")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("FinnGen reader harmonises TSV into SummaryStatistics columns") {
    import spark.implicits._
    val tsv = writeFixture(
      "FINNGEN_R9_AB1.tsv",
      """#chrom	pos	ref	alt	rsids	nearest_genes	pval	mlogp	beta	sebeta	af_alt	af_alt_cases	af_alt_controls
        |1	1000	A	T	rs1	G1	4.1e-8	7.38	0.25	0.05	0.1	0.11	0.09
        |1	bad	A	T	rs2	G1	0.5	0.3	0.1	0.2	0.2	0.2	0.2
        |2	2000	C	G	rs3	G2	0.01	2.0	0.0	0.1	0.3	0.3	0.3
        |2	3000	C	G	rs4	G2	1e-320	319.7	-0.5	0.08	0.4	0.4	0.4
        |""".stripMargin
    )
    val ss = FinnGen.fromSource(spark, tsv).df
    val rows = ss
      .select("studyId", "variantId", "chromosome", "position", "pValueMantissa", "pValueExponent", "beta")
      .as[(String, String, String, Int, Float, Int, Double)]
      .collect()
      .sortBy(_._2)
    // bad position and zero beta dropped
    assert(rows.length === 2)
    assert(rows.head === (("FINNGEN_R9_AB1", "1_1000_A_T", "1", 1000, 4.1f, -8, 0.25)))
    // p-value survives beyond double underflow via the split representation
    val sub = rows.last
    assert(sub._5 === 1.0f && sub._6 === -320)
  }

  test("liftover maps, flips negative strand, drops unmapped") {
    import spark.implicits._
    // chain: chr1 [100,200) → chrA at 500 (+); chr2 [0,100) → chrB negative
    // strand, size 1000, offset 50.
    val chain = writeFixture(
      "test.chain",
      """chain 1000 chr1 10000 + 100 200 chrA 20000 + 500 600 1
        |100
        |
        |chain 900 chr2 5000 + 0 100 chrB 1000 - 50 150 2
        |100
        |""".stripMargin
    )
    val map = Liftover.parseChainFile(chain)
    val df = Seq(
      ("chr1", 101L), // in block → chrA 501 (0-based: 100→500)
      ("chr1", 300L), // outside → dropped
      ("chr2", 1L)    // neg strand: 0-based 0 → 1000 - (50+0) - 1 = 949 → 1-based 950
    ).toDF("chromosome", "position")
    val out = Liftover.convertCoordinates(df, map)
      .select("chromosome", "position", "mappedChromosome", "mappedPosition")
      .as[(String, Long, String, Long)]
      .collect()
      .sortBy(_._1)
    assert(out.length === 2)
    assert(out(0) === (("chr1", 101L, "chrA", 501L)))
    assert(out(1) === (("chr2", 1L, "chrB", 950L)))
  }

  test("VEP JSON parser extracts variant identity and gene consequences") {
    import spark.implicits._
    val json = writeFixture(
      "vep.jsonl",
      """{"input":"chr1\t1000\t.\tA\tT\t.\t.\t.","seq_region_name":"chr1","start":1000,"most_severe_consequence":"missense_variant","colocated_variants":[{"id":"rs123"}],"transcript_consequences":[{"gene_id":"ENSG1","consequence_terms":["missense_variant"],"impact":"MODERATE"}]}
        |""".stripMargin
    )
    val variants = VepParser.extractVariants(VepParser.readVepJson(spark, json))
    val v = variants
      .select("variantId", "chromosome", "position", "mostSevereConsequence")
      .as[(String, String, Int, String)]
      .head()
    assert(v === (("1_1000_A_T", "1", 1000, "missense_variant")))
    val g = VepParser.geneConsequences(variants)
      .select("variantId", "geneId", "impact")
      .as[(String, String, String)]
      .head()
    assert(g === (("1_1000_A_T", "ENSG1", "MODERATE")))
  }

  test("GWAS-Catalog harmonisation: OR→beta, CI→SE, EFO parsing") {
    import spark.implicits._
    val raw = Seq(
      ("GCST001", "chr7", "12345", "rs999-A", "5e-8", "1.2", "[1.1-1.3]",
        "http://www.ebi.ac.uk/efo/EFO_0000001"),
      ("GCST002", "23", "777", "rs1-T", "0.001", "0.15", "(unit increase)",
        "http://www.ebi.ac.uk/efo/EFO_0000002,http://purl.obolibrary.org/obo/MONDO_0000001")
    ).toDF("STUDY ACCESSION", "CHR_ID", "CHR_POS", "STRONGEST SNP-RISK ALLELE",
      "P-VALUE", "OR or BETA", "95% CI (TEXT)", "MAPPED_TRAIT_URI")
    val out = GwasCatalog.harmoniseAssociations(raw)
    val r1 = out.filter(col("studyId") === "GCST001")
      .select("chromosome", "position", "riskAllele", "beta", "standardError")
      .as[(String, Int, String, Double, Double)].head()
    assert(r1._1 === "7" && r1._2 === 12345 && r1._3 === "A")
    assert(math.abs(r1._4 - math.log(1.2)) < 1e-12) // beta = ln(OR)
    // SE precedence follows the reference: chi2-based (from p-value + beta)
    // wins over the CI-based fallback (common/stats.py:283-392).
    val expectedSe = math.abs(math.log(1.2)) / math.sqrt(graft.functions.SpecialMath.chi2Isf(5e-8))
    assert(math.abs(r1._5 - expectedSe) < 1e-9)
    val r2 = out.filter(col("studyId") === "GCST002")
      .select("chromosome", "beta", "efos")
      .as[(String, Double, Seq[String])].head()
    assert(r2._1 === "X") // 23 → X
    assert(r2._2 === 0.15) // beta passthrough
    assert(r2._3 === Seq("EFO_0000002", "MONDO_0000001"))
  }

  test("Intervals.readBed normalises BED coordinates and parses gene ids") {
    import spark.implicits._
    val bed = writeFixture("e2g.bed", "chr1\t999\t2000\tENSG1|enh42\t0.75\nchrX\t0\t100\tENSG2\t0.5\n")
    val got = Intervals.readBed(spark, bed)
      .select("chromosome", "start", "end", "geneId", "resourceScore")
      .as[(String, Int, Int, String, Double)].collect().sortBy(_._1)
    assert(got(0) === (("1", 1000, 2000, "ENSG1", 0.75)))
    assert(got(1) === (("X", 1, 100, "ENSG2", 0.5)))
  }

  test("loadFromUrl fetches and parses a file URL") {
    import graft.core.GSession
    val csv = writeFixture("u.csv", "a,b\n1,x\n")
    val df = GSession(spark).loadFromUrl("file://" + csv, "csv")
    assert(df.count() === 1)
    assert(df.columns.toSeq === Seq("a", "b"))
  }

  test("GSession.loadData reads csv/tsv/json with declared or inferred schema") {
    import graft.core.GSession
    val g = GSession(spark)
    val csv = writeFixture("t.csv", "a,b\n1,x\n2,y\n")
    assert(g.loadData(Seq(csv), "csv").count() === 2)
    val tsv = writeFixture("t.tsv", "a\tb\n1\tx\n")
    assert(g.loadData(Seq(tsv), "tsv").select("b").head().getString(0) === "x")
    val json = writeFixture("t.jsonl", """{"a":1}""" + "\n" + """{"a":2}""" + "\n")
    assert(g.loadData(Seq(json), "json").count() === 2)
  }
}
