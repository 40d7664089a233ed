package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedAggSpec extends SparkSpec {

  test("salted aggregation matches plain groupBy on a skewed key") {
    import spark.implicits._
    // hot key "A" carries 90% of rows
    val df = ((1 to 900).map(i => ("A", i.toDouble)) ++ (1 to 100).map(i => ("B", i.toDouble)))
      .toDF("k", "v")
    val got = DfOps
      .saltedAggregate(
        df, Seq("k"),
        Seq(
          DfOps.SaltedSum("v_sum", "v"),
          DfOps.SaltedCount("n", "v"),
          DfOps.SaltedMin("v_min", "v"),
          DfOps.SaltedMax("v_max", "v")
        )
      )
      .select("k", "v_sum", "n", "v_min", "v_max")
      .as[(String, Double, Long, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val want = df.groupBy("k")
      .agg(sum("v"), count("v"), min("v"), max("v"))
      .as[(String, Double, Long, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got === want)
  }
}
