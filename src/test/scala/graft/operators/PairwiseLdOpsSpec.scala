package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PairwiseLdOpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val tri = Seq(
    ("1", "v1", "v1", 100L, 100L, 1.0),
    ("1", "v1", "v2", 100L, 200L, 0.9),
    ("1", "v2", "v2", 200L, 200L, 1.0),
    ("1", "v1", "v3", 100L, 900L, 0.2)
  ).toDF("chromosome", "variantIdI", "variantIdJ", "positionI", "positionJ", "r")

  test("symmetrise mirrors off-diagonal entries") {
    val sym = PairwiseLdOps.symmetrise(tri)
    assert(sym.count() === 6) // 4 + 2 mirrored off-diagonals
    val mirrored = sym.filter(col("variantIdI") === "v2" && col("variantIdJ") === "v1")
    assert(mirrored.select("r").as[Double].head() === 0.9)
  }

  test("sliceRegion keeps pairs fully inside the window") {
    val sliced = PairwiseLdOps.sliceRegion(tri, "1", 50, 300)
    assert(sliced.select("variantIdJ").as[String].collect().toSet === Set("v1", "v2"))
  }

  test("aggregateAcrossPopulations nests per-population r under each tag") {
    val df = Seq(
      ("0.5", "var1", "X", "var2", "pop1"),
      ("0.6", "var1", "X", "var2", "pop2"),
      ("0.9", "var1", "X", "var3", "pop1")
    ).toDF("r", "variantId", "chromosome", "tagVariantId", "population")
    val got = PairwiseLdOps.aggregateAcrossPopulations(df)
    assert(got.count() === 1)
    val row = got.selectExpr(
      "size(ldSet) AS n",
      "size(filter(ldSet, x -> x.tagVariantId = 'var2')[0].rValues) AS nv2"
    ).head()
    assert(row.getInt(0) === 2) // two tags
    assert(row.getInt(1) === 2) // var2 carries both populations
  }

  test("toLdIndex collects thresholded neighbourhoods") {
    val idx = PairwiseLdOps.toLdIndex(PairwiseLdOps.symmetrise(tri), minR2 = 0.5)
    val v1 = idx.filter(col("variantId") === "v1")
      .select(expr("transform(ldSet, x -> x.tagVariantId)")).as[Seq[String]].head()
    assert(v1.toSet === Set("v1", "v2")) // v3 pruned (r² = 0.04)
  }

  test("major population: nfe wins ties, first element otherwise (method/ld.py:23-44)") {
    import spark.implicits._
    def major(pops: Seq[(String, Double)]): String =
      Seq(pops).toDF("p")
        .select(expr(
          "transform(p, x -> named_struct('ldPopulation', x._1, 'relativeSampleSize', x._2))"
        ).as("pops"))
        .select(PairwiseLdOps.getMajorPopulation(col("pops"))).as[String].head()
    assert(major(Seq(("afr", 0.5), ("nfe", 0.5))) === "nfe")
    assert(major(Seq(("afr", 0.5), ("eas", 0.5))) === "afr")
    assert(major(Seq(("fin", 0.8), ("nfe", 0.2))) === "fin")
  }

  test("r2 from major population, unresolved flag, lead rescue (method/ld.py:47-115)") {
    import spark.implicits._
    val df = Seq(
      ("L1", "v1", Some(Seq(("t1", Seq(("nfe", 0.8), ("afr", 0.1))),
        ("t2", Seq(("afr", 0.9)))))),
      ("L2", "v2", None) // no LD info → flag + rescue
    ).toDF("id", "variantId", "raw")
      .select(
        col("id"), col("variantId"),
        expr("""transform(raw, x -> named_struct(
          'tagVariantId', x._1,
          'rValues', transform(x._2, y -> named_struct('population', y._1, 'r', y._2))))""")
          .as("ldSet"),
        lit(null).cast("array<string>").as("qualityControls"))
    val out = df.select(
      col("id"),
      PairwiseLdOps.qcUnresolvedLd(col("ldSet"), col("qualityControls")).as("qc"),
      PairwiseLdOps.rescueLeadVariant(
        PairwiseLdOps.calculateR2Major(col("ldSet"), lit("nfe")),
        col("variantId")).as("ldSet"))
      .selectExpr("id", "qc", "transform(ldSet, x -> struct(x.tagVariantId, x.r2Overall)) AS s")
      .as[(String, Seq[String], Seq[(String, Double)])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("L1")._1 === Seq.empty)
    val l1 = out("L1")._2.toMap
    assert(math.abs(l1("t1") - 0.64) < 1e-12)
    assert(l1("t2") === 0.0) // nfe absent → 0.0
    assert(out("L2")._1 === Seq("Variant not found in LD reference"))
    assert(out("L2")._2 === Seq(("v2", 1.0)))
  }
}
