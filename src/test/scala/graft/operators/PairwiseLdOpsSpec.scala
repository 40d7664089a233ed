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
}
