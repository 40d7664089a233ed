package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase-timing probe for the containment folded-vs-fallback
  * gap at the many-groups (small-pairs) group-scale cell: times the
  * whole containmentJoin build (which runs every eager materialisation)
  * separately from the final result execution, for one gate setting.
  *
  * Usage: CjPhaseProbe <docsParquet> [gate] — gate as in
  * containmentJoin.maxBroadcastPairs (0 auto, -1 forced fallback).
  */
object CjPhaseProbe {
  def main(args: Array[String]): Unit = {
    val docsPath = args(0)
    val gate = args.drop(1).headOption.map(_.toLong).getOrElse(0L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256"))
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(docsPath).select(col("doc_id"), col("text"))
    val t0 = System.nanoTime()
    val out = graft.operators.Dedup.containmentJoin(
      docs, theta = 0.8, shingle = 3, maxBroadcastPairs = gate)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val n = out.queryExecution.toRdd.count()
    val tExec = (System.nanoTime() - t1) / 1e9
    println(f"[cjphase] gate=$gate build=$tBuild%.1f s exec=$tExec%.1f s rows=$n")
    spark.stop()
  }
}
