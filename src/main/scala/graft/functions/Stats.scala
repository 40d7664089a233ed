package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, StringType}

import graft.functions.expressions._

/** P-value / effect-size column kernels (reference: common/stats.py:80-619).
  *
  * P-values are carried as `(pValueMantissa: float, pValueExponent: int)` to
  * survive beyond double underflow (1e-308); every conversion below is a pure
  * column expression (codegen-friendly), with the chi² special functions as
  * native Catalyst expressions.
  */
object Stats {

  /** smallest positive normalised double, matches Python sys.float_info.min */
  private val FloatInfoMin = java.lang.Double.MIN_NORMAL // 2.2250738585072014e-308

  /** chi² statistic from p-value mantissa/exponent; linear approximation when
    * exponent < -300 (common/stats.py:80-134).
    */
  def chi2FromPvalue(mantissa: Column, exponent: Column): Column = {
    val neglogPval = neglogpvalFromPvalue(mantissa, exponent)
    val pValue = mantissa * pow(lit(10.0), exponent)
    val neglogApprox = (neglogPval * lit(4.596) + lit(-5.367)).cast(DoubleType)
    when(exponent < lit(-300), neglogApprox)
      .otherwise(chi2_inverse_survival_function(pValue))
      .alias("chi2")
  }

  /** Negative log10 p-value from mantissa/exponent (common/stats.py:243-268). */
  def neglogpvalFromPvalue(mantissa: Column, exponent: Column): Column =
    lit(-1) * (log10(mantissa) + exponent)

  /** Negative log10 p-value from squared z-score (chi², df=1), with a linear
    * approximation above z² > 1400 (common/stats.py:196-240).
    */
  def neglogpvalFromZ2(z2: Column): Column = {
    val approx = lit(1.4190) + lit(0.2173) * z2
    val exact = lit(-1) * log10(chi2_survival_function(z2))
    when(z2 <= lit(1400), exact).otherwise(approx)
  }

  /** (mantissa, exponent) from a negative-log10 p-value
    * (common/stats.py:395-425).
    */
  def pvalueFromNeglogpval(negLogP: Column): (Column, Column) = {
    val exponent = ceil(negLogP)
    val mantissa = pow(lit(10.0), exponent - negLogP)
    (
      mantissa.cast(FloatType).alias("pValueMantissa"),
      (lit(-1) * exponent).cast(IntegerType).alias("pValueExponent")
    )
  }

  /** (mantissa, exponent) from a p-value string, scientific or plain; "0"
    * clamps to the smallest normal double (common/stats.py:428-474).
    */
  def splitPvalueColumn(pv0: Column): (Column, Column) = {
    val pv = when(pv0 === lit("0"), lit(FloatInfoMin).cast(StringType)).otherwise(pv0)
    val exponent = when(
      upper(pv).contains("E"),
      split(upper(pv), "E").getItem(1)
    ).otherwise(floor(log10(pv)))
    val mantissa = round(
      when(upper(pv).contains("E"), split(upper(pv), "E").getItem(0))
        .otherwise(pv / pow(lit(10.0), exponent)),
      3
    )
    (
      mantissa.cast(FloatType).alias("pValueMantissa"),
      exponent.cast(IntegerType).alias("pValueExponent")
    )
  }

  /** Standard error from chi² + beta (common/stats.py:477-516). */
  def stderrFromChi2AndEffectSize(chi2: Column, beta: Column): Column =
    (abs(beta) / sqrt(chi2)).alias("standardError")

  /** Standard error from confidence-interval bounds (common/stats.py:519-569). */
  def stderrFromCi(ciUpper: Column, ciLower: Column, oddsRatioBased: Boolean = true): Column =
    (if (oddsRatioBased) abs(log(ciUpper) - log(ciLower)) / lit(2 * 1.96)
     else abs(ciUpper - ciLower) / lit(2 * 1.96)).alias("standardError")

  /** z-score from p-value string, signed by beta (null beta → +)
    * (common/stats.py:572-619).
    */
  def zscoreFromPvalue(pval: Column, beta: Column): Column = {
    val (mantissa, exponent) = splitPvalueColumn(pval)
    val sign = when(beta > 0, lit(1)).when(beta < 0, lit(-1)).when(beta.isNull, lit(1))
    (sign * sqrt(chi2FromPvalue(mantissa, exponent))).alias("zscore")
  }

  /** Confidence interval for the effect; recomputes a missing standard error
    * from the p-value (common/stats.py:137-193).
    */
  def ci(
      mantissa: Column,
      exponent: Column,
      beta: Column,
      standardError: Column
  ): (Column, Column) = {
    val pRaw = mantissa * pow(lit(10.0), exponent)
    val p = when(pRaw === 0, lit(FloatInfoMin)).otherwise(pRaw)
    val se = when(
      standardError.isNull,
      abs(beta) / abs(zscoreFromPvalue(p.cast(StringType), beta))
    ).otherwise(standardError)
    (
      (beta - lit(1.96) * se).alias("betaConfidenceIntervalLower"),
      (beta + lit(1.96) * se).alias("betaConfidenceIntervalUpper")
    )
  }

  /** Harmonise effect (beta | log(oddsRatio)) and standard error
    * (direct | from chi²+beta | from CI) (common/stats.py:283-392).
    * Returns (beta, standardError).
    */
  def normaliseGwasStatistics(
      beta0: Column,
      oddsRatio: Column,
      standardError: Column,
      ciUpper: Column,
      ciLower: Column,
      mantissa: Column,
      exponent: Column
  ): (Column, Column) = {
    val beta = when(beta0.isNotNull, beta0)
      .when(oddsRatio.isNotNull, log(oddsRatio))
      .otherwise(lit(null))
      .alias("beta")
    val chi2 = chi2FromPvalue(mantissa, exponent)
    val se = when(standardError.isNotNull, standardError)
      .when(
        standardError.isNull && mantissa.isNotNull && exponent.isNotNull && beta.isNotNull,
        stderrFromChi2AndEffectSize(chi2, beta)
      )
      .when(
        standardError.isNull && ciLower.isNotNull && ciUpper.isNotNull && oddsRatio.isNotNull,
        stderrFromCi(ciUpper, ciLower)
      )
      .otherwise(lit(null))
      .alias("standardError")
    (beta, se)
  }

  /** Two-term mantissa/exponent significance predicate
    * (dataset/summary_statistics.py:38-58): p <= m*10^e without materialising
    * the double.
    */
  def pvalueFilterCondition(
      mantissaCol: Column,
      exponentCol: Column,
      pValue: Double
  ): Column = {
    val (m, e) = splitPvalue(pValue)
    (exponentCol < e) || (exponentCol === e && mantissaCol <= m)
  }

  /** Driver-side float → (mantissa, exponent) (common/stats.py:44-74).
    * HALF_EVEN matches Python's round() used by the reference.
    */
  def splitPvalue(pvalue: Double): (Double, Int) = {
    require(pvalue >= 0.0 && pvalue <= 1.0, "P-value must be between 0 and 1")
    val exponent = if (pvalue != 0) math.floor(math.log10(pvalue)).toInt else 0
    val mantissa = BigDecimal(pvalue / math.pow(10, exponent))
      .setScale(3, BigDecimal.RoundingMode.HALF_EVEN)
      .toDouble
    (mantissa, exponent)
  }
}
