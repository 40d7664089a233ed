package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: dump formatted physical plans for the headline queries so
  * scan pruning, pushed filters, broadcast joins and codegen spans can be
  * inspected (`sbt "runMain graft.Explain [queryName ...]"`).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq(
        "q_pvalue_filter", "q_clump", "q_locus_annotate", "q_overlaps",
        "q_lsh_pairs", "q_clean_corpus", "q_contamination", "q_seq_pack",
        "q_topk_pushdown", "q_setsim_join", "q_pagerank", "q_scd2",
        "q_salted_join", "q_rolling_stats")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n===== $name =====")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
