package graft.tools
import org.apache.spark.sql.SparkSession
object BinProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GSession.local().spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import org.apache.spark.sql.functions._
    for (bins <- Seq(16, 64, 256)) {
      val df = graft.harness.Tables.lineitem(spark, d).select(
        col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("tie"))
      val t0 = System.nanoTime
      val out = graft.operators.FeatureOps
        .withRankFeaturesScalable(df, Seq("l_returnflag"), "l_extendedprice", "tie", bins = bins)
      val tPlan = System.nanoTime
      out.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime
      println(s"[probe] bins=$bins build=${(tPlan-t0)/1e9}s exec=${(t1-tPlan)/1e9}s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
