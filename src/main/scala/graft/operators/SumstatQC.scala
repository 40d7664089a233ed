package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{SpecialMath, Stats}

/** Per-study QC aggregates over summary statistics
  * (reference: method/sumstat_quality_controls.py:97-414).
  */
object SumstatQC {

  /** chi² ppf(0.5, df=1): expected median of z² under the null. */
  val Chi2MedianNull: Double = SpecialMath.chi2Isf(0.5)

  /** Genomic-control lambda: median(z²) / chi²_ppf(0.5)
    * (sumstat_quality_controls.py:97-154).
    *
    * Like the reference, uses `percentile_approx`, which selects the lower
    * existing element rather than interpolating (the doctest value 0.55 for
    * a 2-element study depends on this); at default accuracy it is exact for
    * per-study groups under 10k rows, and matches DuckDB's `quantile_disc`.
    */
  def gcLambda(gwas: DataFrame): DataFrame =
    gwas
      .select(col("studyId"), pow(col("beta") / col("standardError"), 2).as("z2"))
      .groupBy("studyId")
      .agg(percentile_approx(col("z2"), lit(0.5), lit(10000)).as("z2_median"))
      .select(col("studyId"), (col("z2_median") / Chi2MedianNull).as("gc_lambda"))

  /** P-Z test: mean and stddev of (reported − z-derived) neglog p-value per
    * study; rows with z² > 100 are excluded
    * (sumstat_quality_controls.py:157-227).
    */
  def pzTest(gwas: DataFrame): DataFrame =
    gwas
      .withColumn("z2", pow(col("beta") / col("standardError"), 2))
      .filter(col("z2") <= 100)
      .withColumn("neglogpFromZ", Stats.neglogpvalFromZ2(col("z2")))
      .withColumn(
        "neglogp",
        Stats.neglogpvalFromPvalue(col("pValueMantissa"), col("pValueExponent"))
      )
      .withColumn("diffpval", col("neglogp") - col("neglogpFromZ"))
      .groupBy("studyId")
      .agg(
        mean("diffpval").as("mean_diff_pz"),
        stddev("diffpval").as("se_diff_pz")
      )

  /** Mean beta per study (sumstat_quality_controls.py:230-274). */
  def meanBeta(gwas: DataFrame): DataFrame =
    gwas.groupBy("studyId").agg(avg("beta").as("mean_beta"))

  /** Total and genome-wide-significant variant counts per study
    * (sumstat_quality_controls.py:367-414).
    */
  def variantCounts(gwas: DataFrame, pValueThreshold: Double = 5e-8): DataFrame =
    gwas
      .groupBy("studyId")
      .agg(
        count(lit(1)).as("n_variants"),
        sum(
          Stats
            .pvalueFilterCondition(col("pValueMantissa"), col("pValueExponent"), pValueThreshold)
            .cast("long")
        ).as("n_variants_sig")
      )
}
