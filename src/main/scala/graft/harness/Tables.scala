package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the driver's oracle harness.
  *
  * Tables live at `<sfDir>/<name>.parquet` (see TESTDATA.md). All queries in
  * [[graft.SparkEntry.queries]] read exclusively through here so the scan path
  * (schema pruning, filter pushdown) is uniform.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread a fixture scan over the session's cores. The fixture parquet
    * files ship ONE row group each, so a scan is a single task no matter
    * the split size — a per-row-kernel-heavy builder chained directly on
    * the scan runs serially on one core (measured round 18: q_pics 3.2 s
    * of executor CPU on 2 effective tasks). Builders whose first exchange
    * comes late call this right after the read, the same no-op-at-scale
    * decision as TextQueries.docsParallel (production parquet has many
    * row groups/files and the scan is already wide).
    */
  def parallel(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
