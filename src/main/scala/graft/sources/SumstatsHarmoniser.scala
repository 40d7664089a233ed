package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, IntegerType}
import org.apache.spark.sql.DataFrame

import graft.functions.Stats

/** Generic raw-sumstats harmonisation shared by UKB-PPP, deCODE and kin
  * (reference: common/processing.py:248-430 harmonise_summary_stats).
  *
  * The variant-annotation side carries both allele orientations per variant
  * (vaChromosome, summary_stats_id, variantId, direction∈{direct,flip}), so
  * orientation resolves in one sort-merge equi-join — no per-row branching
  * logic, and the 100 TB sumstats side is never broadcast or collected.
  */
object SumstatsHarmoniser {

  /** Source column names; optional stats are skipped when absent. */
  final case class Cols(
      position: String,
      allele0: String,
      allele1: String,
      a1freq: Option[String],
      info: Option[String],
      beta: String,
      se: String,
      mlog10p: String,
      n: Option[String]
  )

  /** UKB-PPP (EUR) raw column layout (ukb_ppp_eur/summary_stats.py:38-53). */
  val UkbPppCols: Cols = Cols(
    position = "GENPOS", allele0 = "ALLELE0", allele1 = "ALLELE1",
    a1freq = Some("A1FREQ"), info = Some("INFO"), beta = "BETA", se = "SE",
    mlog10p = "LOG10P", n = Some("N"))

  /** Harmonise raw summary statistics against a two-orientation variant
    * annotation LUT:
    *
    *  1. chromosome 23 → X;
    *  2. drop low-INFO rows (when an INFO column exists);
    *  3. drop MAF < 1e-4 rows (when an AF column exists);
    *  4. classify variants (snp_c | snp_n | indel);
    *  5. equi-join the annotation on (chromosome, chr_pos_a0_a1);
    *  6. flip beta / allele frequency for reverse-orientation matches;
    *  7. drop complementary-SNP flips (strand-unresolvable);
    *  8. split neglog-p into mantissa/exponent, recompute missing SE from
    *     the chi² of the p-value.
    */
  def harmonise(raw: DataFrame, variantAnnotation: DataFrame, c: Cols): DataFrame = {
    val a0 = col(c.allele0)
    val a1 = col(c.allele1)
    var df = raw.withColumn(
      "chromosome",
      when(col("chromosome") === "23", "X").otherwise(col("chromosome")))
    c.info.foreach(i => df = df.filter(col(i) >= 0.8))
    c.a1freq.foreach { a =>
      df = df
        .withColumn("MAF", when(col(a) < 0.5, col(a)).otherwise(lit(1) - col(a)))
        .filter(col("MAF") >= 0.0001)
        .drop("MAF")
    }
    df = df
      .withColumn(
        "variant_type",
        when(
          length(a0) === 1 && length(a1) === 1,
          when(
            (a0 === "A" && a1 === "T") || (a0 === "T" && a1 === "A") ||
              (a0 === "G" && a1 === "C") || (a0 === "C" && a1 === "G"),
            "snp_c"
          ).otherwise("snp_n")
        ).otherwise("indel"))
      .withColumn(c.position, col(c.position).cast(IntegerType))
      .withColumn(
        "summary_stats_id",
        concat_ws("_", col("chromosome"), col(c.position), a0, a1))
    val va = variantAnnotation.select(
      col("vaChromosome"),
      col("summary_stats_id").as("va_ssid"),
      col("variantId"),
      col("direction"))
    var joined = df
      .join(
        va,
        df("chromosome") === va("vaChromosome") &&
          df("summary_stats_id") === va("va_ssid"),
        "inner")
      .drop("vaChromosome", "va_ssid")
      .withColumn(
        "beta",
        when(col("direction") === "direct", col(c.beta).cast("double"))
          .otherwise(-col(c.beta).cast("double")))
    c.a1freq.foreach { a =>
      joined = joined.withColumn(
        "effectAlleleFrequencyFromSource",
        when(col("direction") === "direct", col(a).cast(FloatType))
          .otherwise(lit(1) - col(a).cast(FloatType)))
    }
    joined = joined.filter(!(col("variant_type") === "snp_c" && col("direction") === "flip"))
    val (mantissa, exponent) = Stats.pvalueFromNeglogpval(col(c.mlog10p).cast("double"))
    val base = Seq(
      col("studyId"),
      col("chromosome"),
      col("variantId"),
      col("beta"),
      col(c.position).cast(IntegerType).as("position"),
      mantissa,
      exponent,
      col(c.se).cast("double").as("standardError")
    ) ++ c.n.map(nc => col(nc).cast(IntegerType).as("sampleSize"))
    val out = joined
      .select(base: _*)
      .filter(col("position").isNotNull)
      .filter(col("beta").isNotNull && col("beta") =!= 0)
    val chi2 = Stats.chi2FromPvalue(col("pValueMantissa"), col("pValueExponent"))
    out.withColumn(
      "standardError",
      coalesce(col("standardError"), Stats.stderrFromChi2AndEffectSize(chi2, col("beta"))))
  }
}
