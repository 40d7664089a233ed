package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnosis probe for the round-17 containment folded-path
  * re-bind: prints whether the RETURNED frame reads the persisted count
  * table (InMemoryTableScan) or silently recomputes the folded join.
  */
object CjPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val t0 = System.nanoTime()
    val out = graft.operators.Dedup.containmentJoin(
      docs, theta = 0.8, maxBroadcastPairs = Long.MaxValue)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val n = out.queryExecution.toRdd.count()
    val tExec = (System.nanoTime() - t1) / 1e9
    val plan = out.queryExecution.executedPlan.toString
    println(f"[cjprobe] build $tBuild%.1f s, exec $tExec%.1f s, rows $n")
    println(s"[cjprobe] InMemoryTableScan in plan: ${plan.contains("InMemoryTableScan")}")
    println(s"[cjprobe] Scan parquet in plan: ${plan.contains("parquet")}")
    println("[cjprobe] ---- executed plan (head) ----")
    println(plan.split("\n").take(40).mkString("\n"))
    spark.stop()
  }
}
