package graft.plans

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, StringType}
import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Property pins for the round-12 aggregate-collapse rewrites: the single
  * groupBy (min_by lead + collect_list locus) must reproduce the original
  * two-pass window formulation (row_number lead + whole-partition collect +
  * rejoin) row-for-row on randomized frames — including null posteriors
  * (desc nulls-last) and single-row groups. Posterior values are generated
  * tie-free per group so the window form's arbitrary tie pick cannot differ
  * from the deterministic min_by tiebreak.
  */
class CollapseEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new Random(7)
  private val rows: Seq[(String, String, Int, String, Option[Double], Double, Int, Double, Double, Double)] =
    (0 until 800).map { i =>
      val group = rng.nextInt(120)
      (
        s"D${group % 9}", s"R${group % 13}", group % 4,
        f"chr${group % 5}_${rng.nextInt(100000)}%06d_A_G_$i", // unique variant per row
        // tie-free pip: index-salted; ~15% null
        if (rng.nextInt(7) == 0) None else Some(rng.nextDouble() + i * 1e-9),
        rng.nextDouble() * 4 - 1, -(rng.nextInt(20) + 4),
        rng.nextDouble() * 8 - 4, rng.nextDouble() * 2 - 1, rng.nextDouble() / 10)
    }

  private val processed: DataFrame = rows
    .toDF("dataset_id", "region", "credibleSetIndex", "variantId",
      "posteriorProbability", "pValueMantissaD", "pValueExponent",
      "logBF", "beta", "standardError")
    .withColumn("molecular_trait_id", concat(lit("T"), col("credibleSetIndex")))
    .withColumn("pValueMantissa", col("pValueMantissaD").cast(FloatType))
    .drop("pValueMantissaD")
    .withColumn("studyId", concat(col("dataset_id"), lit("_"), col("region")))
    .withColumn("geneId", lit("ENSG1"))
    .withColumn("studyType", lit("eqtl"))
    .withColumn("chromosome", lit("1"))
    .withColumn("position", (rand(5) * 1000).cast(IntegerType))

  private val keys = Seq("dataset_id", "molecular_trait_id", "region", "credibleSetIndex")

  /** The original two-pass window formulation of the credible-set collapse. */
  private def windowForm(df: DataFrame): DataFrame = {
    val leadW = Window.partitionBy(keys.map(col): _*)
    df
      .withColumn(
        "isLead",
        row_number().over(
          leadW.orderBy(col("posteriorProbability").desc, col("variantId").asc)) === 1)
      .withColumn(
        "locus",
        when(
          col("isLead"),
          collect_list(
            struct(
              col("variantId"), col("posteriorProbability"),
              col("pValueMantissa"), col("pValueExponent"),
              col("logBF"), col("beta"), col("standardError")))
            .over(leadW)))
      .filter(col("isLead"))
      .drop("isLead")
  }

  /** The committed aggregate formulation (mirrors EqtlCatalogue
    * .fromSusieResults before its id/metadata tail).
    */
  private def aggregateForm(df: DataFrame): DataFrame = {
    val rest = df.columns.filterNot(keys.contains)
    val leadKey = struct(
      col("posteriorProbability").isNull,
      negate(col("posteriorProbability")),
      col("variantId"))
    val locusEntry = struct(
      col("variantId"), col("posteriorProbability"),
      col("pValueMantissa"), col("pValueExponent"),
      col("logBF"), col("beta"), col("standardError"))
    val cmp = (l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) => {
      val lk = l.getField("posteriorProbability")
      val rk = r.getField("posteriorProbability")
      when(lk.isNull && rk.isNotNull, 1)
        .when(lk.isNotNull && rk.isNull, -1)
        .when(lk > rk, -1).when(lk < rk, 1)
        .when(l.getField("variantId") < r.getField("variantId"), -1)
        .when(l.getField("variantId") > r.getField("variantId"), 1)
        .otherwise(0)
    }
    df.groupBy(keys.map(col): _*)
      .agg(
        min_by(struct(rest.map(col).toSeq: _*), leadKey).as("_lead"),
        array_sort(collect_list(locusEntry), cmp).as("locus"))
      .select(
        df.columns.map(c =>
          if (keys.contains(c)) col(c) else col(s"_lead.$c").as(c)).toSeq
          :+ col("locus"): _*)
  }

  test("aggregate collapse equals the window formulation row-for-row (random frame, null pips)") {
    // The window form's locus order is its shared sort (pip desc, variantId
    // asc) — the same order the aggregate form pins via its comparator, so
    // the arrays compare directly.
    val w = windowForm(processed).orderBy(keys.map(col): _*)
    val a = aggregateForm(processed).select(w.columns.map(col): _*).orderBy(keys.map(col): _*)
    val diff = w.exceptAll(a).union(a.exceptAll(w))
    assert(diff.isEmpty, s"formulations diverge:\n${diff.take(4).mkString("\n")}")
    assert(w.count() === a.count())
  }

  test("every group's lead is its locus head and has the maximum non-null pip") {
    val got = aggregateForm(processed)
      .select(
        col("variantId"),
        col("locus")(0).getField("variantId").as("head"),
        col("posteriorProbability").as("pp"),
        array_max(col("locus").getField("posteriorProbability")).as("mx"))
      .collect()
    got.foreach { r =>
      assert(r.getString(0) === r.getString(1), "lead must be locus[0]")
      if (!r.isNullAt(2)) assert(r.getDouble(2) === r.getDouble(3), "lead pip must be the group max")
    }
  }
}
