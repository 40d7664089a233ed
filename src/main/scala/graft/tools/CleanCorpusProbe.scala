package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Stage decomposition for q_clean_corpus (guide §1: find where the time
  * goes before touching the plan): times each building block of
  * TextPipeline.cleanCorpus solo with the noop sink, best-of-2, so the
  * 60 s of summed executor CPU the full query burns at sf0.1 can be
  * attributed to token aggs / gram aggs / dedup branches / final joins.
  */
object CleanCorpusProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, TextOps}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    val tokens = docs.select(
      col("doc_id"), explode(TextOps.tokenize(col("text"))).as("token"))
    val gramStats = docs
      .select(
        col("doc_id"),
        explode(TextOps.shingles(TextOps.tokenize(col("text")), 2)).as("g2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_g2"), countDistinct(col("g2")).as("d_g2"))
    val docStats = tokens
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("nd"),
        max(col("cnt")).as("mx"), sum(length(col("token")) * col("cnt")).as("sl"))
    val sigs = Dedup.signatures(docs)
    val verified = Dedup.verifiedPairs(docs)
    val full = graft.harness.TextQueries.queries("q_clean_corpus")(spark, sfDir)

    def time(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name%-22s $t%7.2f s")
    }
    time("tokenize_explode", tokens)
    time("docStats_agg", docStats)
    time("gramStats_agg", gramStats)
    time("signatures", sigs)
    time("verifiedPairs", verified)
    time("full_q_clean_corpus", full)
    spark.stop()
  }
}
