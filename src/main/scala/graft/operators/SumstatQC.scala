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
      .agg(percentile_approx(col("z2"), lit(0.5), lit(1000000)).as("z2_median"))
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

  /** Effective-sample-size ratio spread per study: stddev of N̂/N where N̂
    * derives from the windowed median phenotypic variance
    * (sumstat_quality_controls.py:277-364). Requires allele frequencies.
    */
  def nEffCheck(
      gwas: DataFrame,
      nTotal: Int = 100000,
      limit: Int = 10000000,
      minCount: Int = 100
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val af = col("effectAlleleFrequencyFromSource")
    val se = col("standardError")
    val beta = col("beta")
    // genotypic variance 2f(1-f) (sumstat_quality_controls.py:29-94)
    val varG = lit(2.0) * af * (lit(1.0) - af)
    val phenoVar = pow(se, 2) * nTotal * varG + pow(beta, 2) * varG
    // orderBy on the partition key → RANGE frame spans the whole partition,
    // so this windowed percentile is the full per-study median (same trick
    // as the reference).
    val window = Window.partitionBy("studyId").orderBy("studyId")
    // accuracy 1e5 → rank error ≤ rows/1e5 per study: exact at the sf0.01
    // correctness gate (~6k rows/study) with a 10× smaller sketch than the
    // 1e6 it replaced (the reference runs Spark's default 1e4 and tolerates
    // an approximate median; we keep the oracle hash-exact).
    val phenoMedian = percentile_approx(phenoVar, lit(0.5), lit(100000)).over(window)
    val nHatRatio = (phenoMedian - pow(beta, 2) * varG) / (pow(se, 2) * varG * nTotal)

    gwas
      .na.drop(Seq("effectAlleleFrequencyFromSource"))
      .withColumn("count", count(lit(1)).over(window))
      .filter(col("count") >= minCount)
      .drop("count")
      .withColumn("row_num", row_number().over(window))
      .filter(col("row_num") <= limit)
      .drop("row_num")
      .withColumn("N_hat_ratio", nHatRatio)
      .groupBy("studyId")
      .agg(stddev(col("N_hat_ratio")).as("se_N"))
  }

  /** Compose the four per-study checks into the SummaryStatisticsQC wide
    * frame (dataset/summary_statistics_qc.py:76-139
    * from_summary_statistics): mean beta, PZ test, GC lambda and variant
    * counts, outer-joined on studyId. Each check is a single map-side-
    * combined aggregation; the outer joins co-locate on the already-grouped
    * studyId key, so the whole composition costs one shuffle per check.
    */
  def fromSummaryStatistics(gwas: DataFrame, pValueThreshold: Double = 1e-8): DataFrame =
    Seq(
      meanBeta(gwas),
      pzTest(gwas),
      gcLambda(gwas),
      variantCounts(gwas, pValueThreshold))
      .reduce((a, b) => a.join(b, Seq("studyId"), "outer"))

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
