package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VariantEffectNormaliserSpec extends SparkSpec {

  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Option[Double] =
    Seq(1).toDF("x").select(c.cast("double").as("v")).as[Option[Double]].collect().head

  test("CADD bands (variant_index.py:488-511)") {
    assert(one(VariantEffectNormaliser.normaliseCadd(lit(5.0))) === Some(-0.5))
    assert(one(VariantEffectNormaliser.normaliseCadd(lit(15.0))) === Some(0.25))
    assert(one(VariantEffectNormaliser.normaliseCadd(lit(25.0))) === Some(0.625))
    val v = one(VariantEffectNormaliser.normaliseCadd(lit(40.0))).get
    assert(math.abs(v - (0.75 + 10.0 / 51 * 0.25)) < 1e-12)
  }

  test("GERP bands (variant_index.py:513-545)") {
    assert(one(VariantEffectNormaliser.normaliseGerp(lit(7.0))) === Some(1.0))
    assert(one(VariantEffectNormaliser.normaliseGerp(lit(4.0))) === Some(0.875))
    assert(one(VariantEffectNormaliser.normaliseGerp(lit(-4.0))) === Some(0.0))
    val v = one(VariantEffectNormaliser.normaliseGerp(lit(-1.0))).get
    assert(math.abs(v - 2.0 / 3 * 0.25) < 1e-12)
  }

  test("LOFTEE, LoF curation, FoldX, Pangolin") {
    assert(one(VariantEffectNormaliser.normaliseLoftee(lit("HC"))) === Some(1.0))
    assert(one(VariantEffectNormaliser.normaliseLoftee(lit("LC"))) === Some(0.85))
    assert(one(VariantEffectNormaliser.normaliseLoftee(lit("other"))) === None)
    assert(one(VariantEffectNormaliser.normaliseLof(lit("likely_lof"))) === Some(0.5))
    assert(one(VariantEffectNormaliser.normaliseLof(lit("not_lof"))) === Some(-1.0))
    assert(one(VariantEffectNormaliser.normaliseFoldx(lit(1.0))) === Some(0.5))
    assert(one(VariantEffectNormaliser.normaliseFoldx(lit(-2.5))) === Some(1.0))
    val p = one(VariantEffectNormaliser.normalisePangolin(lit(-0.5))).get
    assert(math.abs(p - (0.5 + 0.36 / 0.86 * 0.5)) < 1e-12)
  }

  test("SIFT, PolyPhen, AlphaMissense") {
    val s = one(VariantEffectNormaliser.normaliseSift(lit(0.03), lit("deleterious"))).get
    assert(math.abs(s - 0.7) < 1e-9)
    assert(one(VariantEffectNormaliser.normalisePolyphen(lit("unknown"), lit(0.5))) === None)
    val pp = one(VariantEffectNormaliser.normalisePolyphen(lit("probably_damaging"), lit(0.95))).get
    assert(math.abs(pp - (0.25 + (0.95 - 0.908) / 0.092 * 0.75)) < 1e-12)
    val am = one(VariantEffectNormaliser.normaliseAlphaMissense(lit(0.9))).get
    assert(math.abs(am - (0.25 + 0.13 / 0.23 * 0.75)) < 1e-12)
  }

  test("normaliseVariantEffect appends normalisedScore per struct, SpliceAI/VEP pass through") {
    val df = Seq(
      (Seq(("CADD", null.asInstanceOf[String], Some(15.0f), null.asInstanceOf[String], "G1"),
        ("SpliceAI", null.asInstanceOf[String], Some(0.42f), null.asInstanceOf[String], "G1"),
        ("LossOfFunctionCuration", "lof", None: Option[Float], null.asInstanceOf[String], "G1")))
    ).toDF("raw")
      .select(expr(
        "transform(raw, x -> named_struct('method', x._1, 'assessment', x._2, 'score', x._3, 'assessmentFlag', x._4, 'targetId', x._5))"
      ).as("variantEffect"))
    val got = df
      .select(VariantEffectNormaliser.normaliseVariantEffect(col("variantEffect")).as("ve"))
      .selectExpr("transform(ve, x -> x.normalisedScore) AS n")
      .as[Seq[Option[Double]]].collect().head
    assert(got(0) === Some(0.25))
    assert(got(1).isDefined && math.abs(got(1).get - 0.42f.toDouble) < 1e-9)
    assert(got(2) === Some(1.0))
  }
}
