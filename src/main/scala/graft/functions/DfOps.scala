package graft.functions

import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType
import org.apache.spark.sql.{Column, DataFrame}

/** DataFrame-level reshaping / ranking helpers
  * (reference: common/spark.py:22-96, 122-174, 387-418, 490-517).
  */
object DfOps {

  /** Wide → long melt via explode of an array-of-structs literal
    * (common/spark.py:22-69). Values are cast to float like the reference.
    */
  def convertFromWideToLong(
      df: DataFrame,
      idVars: Seq[String],
      varName: String,
      valueName: String,
      valueVars: Seq[String] = Nil
  ): DataFrame = {
    val vars0 = if (valueVars.nonEmpty) valueVars else df.columns.filterNot(idVars.contains).toSeq
    val varsAndVals = array(
      vars0.map(c => struct(lit(c).alias(varName), col(c).cast(FloatType).alias(valueName))): _*
    )
    df.withColumn("_vars_and_vals", explode(varsAndVals))
      .select(idVars.map(col) ++ Seq(varName, valueName).map(x => col("_vars_and_vals")(x).alias(x)): _*)
  }

  /** Long → wide pivot (common/spark.py:72-96). Pivot values are pre-collected
    * (one extra small job) so the pivot itself is a single shuffle — required
    * for planning stability at scale.
    */
  def convertFromLongToWide(
      df: DataFrame,
      idVars: Seq[String],
      varName: String,
      valueName: String,
      agg: Column => Column = first(_)
  ): DataFrame = {
    val values = df.select(varName).distinct().collect().map(_.getString(0)).sorted.toSeq
    df.groupBy(idVars.map(col): _*).pivot(varName, values).agg(agg(col(valueName)))
  }

  /** Keep the rank-1 record of each window partition (common/spark.py:122-140). */
  def getTopRankedInWindow(df: DataFrame, w: WindowSpec): DataFrame =
    df.withColumn("row_number", row_number().over(w))
      .filter(col("row_number") === 1)
      .drop("row_number")

  /** Top-1 by minimum value per group (common/spark.py:143-157). */
  def getRecordWithMinimumValue(df: DataFrame, groupingCols: Seq[String], sortingCol: String): DataFrame =
    getTopRankedInWindow(df, Window.partitionBy(groupingCols.map(col): _*).orderBy(col(sortingCol)))

  /** Top-1 by maximum value per group (common/spark.py:160-174). */
  def getRecordWithMaximumValue(df: DataFrame, groupingCols: Seq[String], sortingCol: String): DataFrame =
    getTopRankedInWindow(df, Window.partitionBy(groupingCols.map(col): _*).orderBy(col(sortingCol).desc))

  /** 0-1 min-max scaling of a feature within optional partitions via window
    * min/max — the reference wraps a Spark-ML pipeline for this
    * (common/spark.py:177-215); plain column arithmetic avoids the
    * VectorAssembler round-trip entirely.
    */
  def minMaxNormalize(feature: Column, partitionBy: Seq[Column] = Nil): Column = {
    val w = Window.partitionBy(partitionBy: _*)
    val mn = min(feature).over(w)
    val mx = max(feature).over(w)
    when(mx === mn, lit(0.5)).otherwise((feature - mn) / (mx - mn))
  }

  /** Regional normalisation: a feature divided by its neighbourhood maximum
    * (dataset/l2g_features/distance.py:123-127).
    */
  def neighbourhoodMax(feature: Column, partitionBy: Seq[Column]): Column =
    max(feature).over(Window.partitionBy(partitionBy: _*))

  /** Prefix-rename every column (common/spark.py:490-517). */
  def renameAllColumns(df: DataFrame, prefix: String): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$prefix$c"))

  /** A decomposable aggregate: how to partially aggregate an input column
    * and how to merge partials (count merges with sum, the rest are
    * idempotent under re-application).
    */
  sealed abstract class SaltedAgg(val name: String, val inputCol: String) {
    def partial(c: Column): Column
    def merge(c: Column): Column
  }
  final case class SaltedSum(override val name: String, override val inputCol: String)
      extends SaltedAgg(name, inputCol) {
    def partial(c: Column): Column = sum(c)
    def merge(c: Column): Column = sum(c)
  }
  final case class SaltedCount(override val name: String, override val inputCol: String)
      extends SaltedAgg(name, inputCol) {
    def partial(c: Column): Column = count(c)
    def merge(c: Column): Column = sum(c)
  }
  final case class SaltedMin(override val name: String, override val inputCol: String)
      extends SaltedAgg(name, inputCol) {
    def partial(c: Column): Column = min(c)
    def merge(c: Column): Column = min(c)
  }
  final case class SaltedMax(override val name: String, override val inputCol: String)
      extends SaltedAgg(name, inputCol) {
    def partial(c: Column): Column = max(c)
    def merge(c: Column): Column = max(c)
  }

  /** Two-phase salted aggregation for skewed group keys: rows spread over
    * `saltBuckets` random sub-keys, partially aggregated, then merged — no
    * single reducer ever sees a hot key's full row set. Use when one key
    * (a mega-chromosome, a viral document hash) dominates; AQE's skew
    * handling covers joins but not aggregations.
    */
  def saltedAggregate(
      df: DataFrame,
      groupCols: Seq[String],
      aggs: Seq[SaltedAgg],
      saltBuckets: Int = 16
  ): DataFrame = {
    require(aggs.nonEmpty)
    val salted = df.withColumn(
      "_salt", pmod(hash(groupCols.map(col) :+ monotonically_increasing_id(): _*), lit(saltBuckets)))
    val partial = salted
      .groupBy((groupCols :+ "_salt").map(col): _*)
      .agg(
        aggs.head.partial(col(aggs.head.inputCol)).as(aggs.head.name),
        aggs.tail.map(a => a.partial(col(a.inputCol)).as(a.name)): _*
      )
    partial
      .groupBy(groupCols.map(col): _*)
      .agg(
        aggs.head.merge(col(aggs.head.name)).as(aggs.head.name),
        aggs.tail.map(a => a.merge(col(a.name)).as(a.name)): _*
      )
  }

  /** Per-feature null fraction (dataset/l2g_feature_matrix.py:113-137). */
  def missingnessRate(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c => avg(when(col(c).isNull, 1.0).otherwise(0.0)).alias(c)): _*)
}
