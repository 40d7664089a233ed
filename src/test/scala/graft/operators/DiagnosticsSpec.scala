package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  test("keySkew surfaces the planted hot key with its share and ratio") {
    val df = (1L to 10000L).toDF("id")
      .select(when($"id" <= 5000, 7L).otherwise($"id" % 100).as("k"))
    val top = Diagnostics.keySkew(df, Seq("k"), k = 3)
      .as[(Long, Long, Double, Double)].collect()
    assert(top.head._1 == 7L)
    assert(top.head._2 >= 5000L)
    assert(math.abs(top.head._3 - top.head._2 / 10000.0) < 1e-6)
    assert(top.head._4 > 40, s"hot key must show a large skew ratio: ${top.head._4}")
    assert(top.tail.forall(_._4 < 2.0), "cold keys sit near the mean load")
  }

  test("partitionSizes reports the physical layout") {
    val sizes = Diagnostics.partitionSizes((1L to 999L).toDF("id").repartition(4))
      .as[(Int, Long)].collect()
    assert(sizes.length <= 4 && sizes.map(_._2).sum == 999L)
  }
}
