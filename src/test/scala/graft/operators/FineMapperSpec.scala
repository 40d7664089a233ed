package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FineMapperSpec extends SparkSpec {

  test("flatMapGroups fine-maps independent loci in one pass") {
    import spark.implicits._
    // Two loci. Locus A: variant a2 has a strong signal, a1/a3 weak and
    // loosely linked. Locus B: single strong variant.
    val sumstats = Seq(
      ("A", "a1", 2.0), ("A", "a2", 9.0), ("A", "a3", 1.5),
      ("B", "b1", 8.0)
    ).toDF("studyLocusId", "variantId", "z")
    val ld = Seq(
      ("A", "a1", "a2", 0.3), ("A", "a1", "a3", 0.2), ("A", "a2", "a3", 0.25)
    ).toDF("studyLocusId", "vi", "vj", "r")

    val out = FineMapper.finemapLoci(spark, sumstats, ld, n = 10000)
      .select("studyLocusId", "variantId", "pip")
      .as[(String, String, Double)]
      .collect()

    val byLocus = out.groupBy(_._1)
    assert(byLocus.keySet === Set("A", "B"))
    // the strong variants dominate their credible sets
    assert(byLocus("A").maxBy(_._3)._2 === "a2")
    assert(byLocus("B").head._2 === "b1")
    assert(out.forall(r => r._3 >= 0 && r._3 <= 1.0 + 1e-9))
  }

  test("harness q_finemap emits credible sets at sf0.001 with the causal variant on top") {
    import spark.implicits._
    val out = graft.harness.MiscQueries.finemap(spark, "/root/testdata/sf0.001")
      .as[(String, String, Int, Double)]
      .collect()
    // densified loci (40 x 60, AR(1) LD) must yield real evidence: many rows,
    // every locus represented, and each locus' top-PIP variant is the planted
    // causal one (varIdx = 7 * locusIdx mod 60).
    assert(out.length > 40, s"expected >40 credible-set rows, got ${out.length}")
    val byLocus = out.groupBy(_._1)
    assert(byLocus.size >= 25, s"expected >=25 loci with credible sets, got ${byLocus.size}")
    byLocus.foreach { case (locus, rows) =>
      val locusIdx = locus.stripPrefix("FL").toInt
      val c1 = (locusIdx * 7) % 60
      val c2 = (locusIdx * 7 + 30) % 60
      val topIdx = rows.maxBy(_._4)._2.stripPrefix("v").toInt
      // sf0.001's sparse orderkeys can omit the exact causal variant from a
      // locus; the top-PIP variant must then be a close LD neighbour of one
      // of the two planted causals.
      val dist = math.min(math.abs(topIdx - c1), math.abs(topIdx - c2))
      assert(dist <= 6, s"locus $locus top v$topIdx vs causals v$c1/v$c2")
    }
    assert(out.forall(r => r._4 >= 0 && r._4 <= 1.0 + 1e-9))
  }

  test("dense AR(1) locus reproduces pinned PIP values (golden)") {
    import spark.implicits._
    // 20-variant AR(1) locus, causal at index 10 — deterministic kernel, so
    // these values are a regression pin for the distributed path.
    val n = 20
    val causal = 10
    val sumstats = (0 until n)
      .map(i => ("G", f"v$i%03d", 8.0 * math.pow(0.9, math.abs(i - causal))))
      .toDF("studyLocusId", "variantId", "z")
    val ld = (for { i <- 0 until n; j <- (i + 1) until n }
      yield ("G", f"v$i%03d", f"v$j%03d", math.pow(0.9, j - i)))
      .toDF("studyLocusId", "vi", "vj", "r")
    val result = FineMapper.finemapLoci(spark, sumstats, ld, n = 10000)
    val out = result
      .select("studyLocusId", "variantId", "credibleSetIndex", "pip", "credibleSetlog10BF")
      .as[(String, String, Int, Double, Double)]
      .collect()
    assert(out.nonEmpty)
    val top = out.maxBy(_._4)
    assert(top._2 === f"v$causal%03d")
    assert(top._4 > 0.15, s"causal PIP should dominate, got ${top._4}")
    // post-QC columns: purity within (0,1], exactly one lead per credible set
    val qc = result
      .select("credibleSetIndex", "purityMeanR2", "purityMinR2", "isLead")
      .as[(Int, Double, Double, Boolean)].collect()
    assert(qc.forall(r => r._2 > 0 && r._2 <= 1.0 && r._3 > 0 && r._3 <= 1.0))
    assert(qc.groupBy(_._1).forall { case (_, rows) => rows.count(_._4) === 1 })
  }
}
