package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SafeSplitSpec extends SparkSpec {

  test("safeSplit doctest: whitespace around the delimiter is absorbed") {
    import spark.implicits._
    val got = Seq("a,a", "a, a", "a ,a").toDF("A")
      .select(ArrayOps.safeSplit(col("A"), ",").as("S"))
      .as[Seq[String]].collect().toSeq
    assert(got === Seq(Seq("a", "a"), Seq("a", "a"), Seq("a", "a")))
  }
}
