package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.rules.RuleExecutor

/** Where does DRIVER planning time go for a query? Builds each named query,
  * forces analysis+optimization+physical planning, and prints the Catalyst
  * rule-timing breakdown (RuleExecutor.dumpTimeSpent) plus per-phase wall
  * time. For queries whose bench cost is driver-bound (tiny executor CPU,
  * seconds of wall), this says which rule/expression shape to shrink.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.PlanTimeProbe q_x q_y
  */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      graft.SparkEntry.queries.get(name).foreach { fn =>
        // warm one build so codegen/rule JIT noise lands outside the timing
        fn(spark, sfDir).queryExecution.executedPlan
        RuleExecutor.resetMetrics()
        val t0 = System.nanoTime()
        val qe = fn(spark, sfDir).queryExecution
        val t1 = System.nanoTime(); qe.analyzed
        val t2 = System.nanoTime(); qe.optimizedPlan
        val t3 = System.nanoTime(); qe.executedPlan
        val t4 = System.nanoTime()
        println(s"===== $name build=${(t1 - t0) / 1e6} ms analyze=${(t2 - t1) / 1e6} ms " +
          s"optimize=${(t3 - t2) / 1e6} ms physical=${(t4 - t3) / 1e6} ms")
        println(RuleExecutor.dumpTimeSpent().linesIterator.take(25).mkString("\n"))
      }
    }
    spark.stop()
  }
}
