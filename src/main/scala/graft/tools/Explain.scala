package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-shape inspector: prints the formatted physical plan of named
  * SparkEntry queries (all queries when none named) against a scale dir.
  * Usage: runMain graft.tools.Explain <sfDir> [query...]
  * Grep the output for "WholeStageCodegen" spans, "Exchange" counts and
  * CodegenFallback-only projections when auditing a query's 100 TB shape.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected =
      if (names.nonEmpty) graft.SparkEntry.queries.filter(q => names.contains(q._1))
      else graft.SparkEntry.queries
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"===== $name =====")
      try println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"(failed to build: ${e.getMessage})") }
    }
    spark.stop()
  }
}
