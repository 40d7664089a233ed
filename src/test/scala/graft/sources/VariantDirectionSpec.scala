package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VariantDirectionSpec extends SparkSpec {

  import spark.implicits._

  test("strand ambiguity matches the reference doctest (variant_direction.py:125-161)") {
    val got = Seq(
      ("A", "T"), ("C", "G"), ("A", "G"), ("AC", "GT"), ("AT", "TA"), ("A", "AT")
    ).toDF("ref", "alt")
      .select(VariantDirection.isStrandAmbiguous(col("ref"), col("alt")))
      .as[Boolean].collect().toSeq
    assert(got === Seq(true, true, false, true, false, false))
  }

  test("complement and variant type match the reference doctests") {
    val comp = Seq("A", "GTC").toDF("a")
      .select(VariantDirection.complement(col("a"))).as[String].collect().toSeq
    assert(comp === Seq("T", "CAG"))
    val vt = Seq(("A", "G"), ("A", "AT"), ("AT", "A"), ("AT", "GC"))
      .toDF("ref", "alt")
      .select(VariantDirection.variantType(col("ref"), col("alt")).cast("int"))
      .as[Int].collect().toSeq
    assert(vt === Seq(1, 2, 3, 4))
  }

  test("allele expansion matches the reference doctest (variant_direction.py:265-372)") {
    val af = Seq((1, Seq(("nfe_adj", 0.1)))).toDF("x", "af0")
      .select(
        expr("transform(af0, a -> named_struct('populationName', a._1, 'alleleFrequency', a._2))")
          .as("alleleFrequencies"))
    // strand-resolvable A/G
    val resolvable = af.select(
      explode(VariantDirection.alleles(
        lit("1"), lit(100), lit("A"), lit("G"), col("alleleFrequencies"))).as("a"))
      .selectExpr("a.variantId", "CAST(a.direction AS INT)", "CAST(a.strand AS INT)", "a.isStrandAmbiguous")
      .as[(String, Int, Int, Boolean)].collect().toSeq
    assert(resolvable === Seq(
      ("1_100_A_G", 1, 1, false),
      ("1_100_G_A", -1, 1, false),
      ("1_100_T_C", 1, -1, false),
      ("1_100_C_T", -1, -1, false)))
    // palindromic T/A: only forward pair, flagged ambiguous
    val ambiguous = af.select(
      explode(VariantDirection.alleles(
        lit("1"), lit(100), lit("T"), lit("A"), col("alleleFrequencies"))).as("a"))
      .selectExpr("a.variantId", "CAST(a.direction AS INT)", "a.isStrandAmbiguous")
      .as[(String, Int, Boolean)].collect().toSeq
    assert(ambiguous === Seq(("1_100_T_A", 1, true), ("1_100_A_T", -1, true)))
  }

  test("fromVariantIndex builds the bucketed LUT") {
    val vi = Seq(
      ("1", 25000000, "1_25000000_A_G", "A", "G"),
      ("2", 5, "2_5_C_G", "C", "G") // palindromic
    ).toDF("chromosome", "position", "variantId", "referenceAllele", "alternateAllele")
      .withColumn("alleleFrequencies",
        expr("array(named_struct('populationName', 'nfe', 'alleleFrequency', 0.3))"))
    val lut = VariantDirection.fromVariantIndex(vi)
    val rows = lut
      .selectExpr("originalVariantId", "rangeId", "CAST(type AS INT)", "variantId")
      .as[(String, Int, Int, String)].collect()
    assert(rows.count(_._1 == "1_25000000_A_G") === 4)
    assert(rows.count(_._1 == "2_5_C_G") === 2)
    assert(rows.filter(_._1 == "1_25000000_A_G").forall(r => r._2 === 2 && r._3 === 1))
  }
}
