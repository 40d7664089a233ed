package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.WindowBasedClumping

/** Stage-by-stage timing probe for the q_clump pipeline — temporary
  * diagnosis tool (round 12: q_clump 374 s at sf1 after two fix rounds;
  * this isolates which stage owns the remaining cost).
  * Usage: runMain graft.tools.ClumpProbe <sfDir>
  */
object ClumpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val ss = graft.harness.GenomicQueries.synthSumstats(spark, sfDir).df
    val distance = 100000L

    time("synth_distinct")(ss)
    val clustered = ss.withColumn(
      "cluster_id",
      WindowBasedClumping.clusterPeaks(
        col("studyId"), col("chromosome"), col("position"), distance))
    time("plus_clusterPeaks")(clustered)
    val clusterWindow = Window
      .partitionBy("studyId", "chromosome", "cluster_id")
      .orderBy(col("pValueExponent").asc, col("pValueMantissa").asc, col("position").asc)
    time("plus_rank_window")(clustered.withColumn("pvRank", row_number().over(clusterWindow)))
    time("agg_side_alone")(
      clustered
        .groupBy("studyId", "chromosome", "cluster_id")
        .agg(sort_array(collect_list(struct(
          col("pValueExponent").as("e"),
          col("pValueMantissa").as("m"),
          col("position").as("p")))).as("_ordered"))
        .select(col("cluster_id"), size(col("_ordered")).as("n")))
    val ranked = clustered.withColumn("pvRank", row_number().over(clusterWindow))
    val leadRanks = clustered
      .groupBy("studyId", "chromosome", "cluster_id")
      .agg(sort_array(collect_list(struct(
        col("pValueExponent").as("e"),
        col("pValueMantissa").as("m"),
        col("position").as("p")))).as("_ordered"))
      .select(
        col("studyId").as("_l_studyId"),
        col("chromosome").as("_l_chromosome"),
        col("cluster_id").as("_l_clusterId"),
        explode(
          WindowBasedClumping.prunePeakLeadIndicesUdf(
            expr("transform(_ordered, x -> CAST(x.p AS LONG))"),
            lit(distance.toInt))).as("_leadIdx"))
      .select(
        col("_l_studyId"), col("_l_chromosome"), col("_l_clusterId"),
        (col("_leadIdx") + 1).as("_leadRank"))
    val aggd = clustered
      .groupBy("studyId", "chromosome", "cluster_id")
      .agg(sort_array(collect_list(struct(
        col("pValueExponent").as("e"),
        col("pValueMantissa").as("m"),
        col("position").as("p")))).as("_ordered"))
    time("agg_plus_transform")(
      aggd.select(col("cluster_id"),
        size(expr("transform(_ordered, x -> CAST(x.p AS LONG))")).as("n")))
    time("agg_plus_udf")(
      aggd.select(col("cluster_id"),
        size(WindowBasedClumping.prunePeakLeadIndicesUdf(
          expr("transform(_ordered, x -> CAST(x.p AS LONG))"),
          lit(distance.toInt))).as("n")))
    time("agg_udf_explode")(
      aggd.select(col("cluster_id"),
        explode(WindowBasedClumping.prunePeakLeadIndicesUdf(
          expr("transform(_ordered, x -> CAST(x.p AS LONG))"),
          lit(distance.toInt))).as("i")))
    time("leadRanks_alone")(leadRanks)
    if (!sys.env.contains("CLUMP_PROBE_FULL")) { spark.stop(); return }
    val joinCond = col("studyId") === col("_l_studyId") &&
      col("chromosome") === col("_l_chromosome") &&
      col("cluster_id") === col("_l_clusterId") &&
      col("pvRank") === col("_leadRank")
    time("join_plain")(
      ranked.join(leadRanks, joinCond, "left")
        .select(col("studyId"), col("variantId"), col("_leadRank").isNull.as("clumped")))
    time("join_plus_md5")(
      ranked.join(leadRanks, joinCond, "left")
        .select(col("studyId"), col("variantId"),
          graft.core.GDataset.generateIdentifier(Seq("studyId", "variantId")).as("id"),
          col("_leadRank").isNull.as("clumped")))
    time("full_clump")(WindowBasedClumping.clump(ss, distance))
    println(ranked.join(leadRanks, joinCond, "left").queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Sort ")).mkString("\n"))
    spark.stop()
  }
}
