package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Colocalisation, Overlaps}

/** Debug main: per-stage timings of the coloc chain over a ScaleProbe
  * credset parquet (usage: runMain graft.tools.ColocStageProbe
  * target/scale10/credsets10.parquet).
  */
object ColocStageProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("target/scale10/credsets10.parquet")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cred = spark.read.parquet(path)
      .repartition(spark.sparkContext.defaultParallelism)

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }

    timed("peaks")(Overlaps.overlappingPeaks(cred).count())
    timed("aligned")(
      Overlaps.alignOverlappingTags(cred, Overlaps.overlappingPeaks(cred)).count())
    val aligned = Overlaps.alignOverlappingTags(cred, Overlaps.overlappingPeaks(cred))
    timed("agg_only") {
      aligned
        .groupBy("chromosome", "leftStudyLocusId", "rightStudyLocusId", "rightStudyType")
        .agg(
          collect_list(col("statistics.left_logBF")).as("l"),
          collect_list(col("statistics.right_logBF")).as("r"))
        .count()
    }
    timed("coloc_full")(Colocalisation.coloc(aligned).count())
    spark.stop()
  }
}
