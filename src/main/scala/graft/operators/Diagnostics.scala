package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Distribution diagnostics that decide scale strategy: how skewed is a
  * join/groupBy key, and how unbalanced are the physical partitions. The
  * numbers feed the [[SkewJoin]] / AQE / salting decision instead of
  * guessing from a stack trace at 3am.
  */
object Diagnostics {

  /** Top-`k` heaviest values of a key with their share of all rows and a
    * skew ratio vs the mean key load. `skew_ratio ≳ 10` on a join key is
    * the signal to salt or isolate that key.
    */
  def keySkew(df: DataFrame, keyCols: Seq[String], k: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(k > 0, s"k must be positive: $k")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum(col("n")).as("total_rows"), count(lit(1)).as("n_keys"))
    counts
      .crossJoin(broadcast(totals))
      .withColumn("share", round(col("n") / col("total_rows"), 6))
      .withColumn(
        "skew_ratio",
        round(col("n") / (col("total_rows") / col("n_keys")), 6))
      .orderBy(col("n").desc +: keyCols.map(col(_).asc): _*)
      .limit(k)
      .select(keyCols.map(col) ++ Seq(col("n"), col("share"), col("skew_ratio")): _*)
  }

  /** Rows per physical partition of the CURRENT plan — the straggler
    * check after a repartition/bucketing decision.
    */
  def partitionSizes(df: DataFrame): DataFrame =
    df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("n_rows"))
}
