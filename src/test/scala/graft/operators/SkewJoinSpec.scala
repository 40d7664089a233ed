package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 10k fact rows, 90% on one hot key
  private lazy val fact = (1L to 10000L).toDF("i").select(
    when($"i" <= 9000, 1L).otherwise($"i").as("k"), $"i".as("line"), ($"i" * 1.5).as("v"))
  private lazy val dim = (1L to 10000L).toDF("k").withColumn("name", concat(lit("d"), $"k"))

  test("salted join is row-identical to the plain join under heavy skew") {
    val got = SkewJoin.saltedEquiJoin(fact, dim, Seq("k"), Seq("line"), 16)
      .select($"k", $"line", $"v", $"name")
      .as[(Long, Long, Double, String)].collect().toSet
    val want = fact.join(dim, Seq("k"))
      .select($"k", $"line", $"v", $"name")
      .as[(Long, Long, Double, String)].collect().toSet
    assert(got == want)
    assert(got.size == 10000)
  }

  test("the join key is extended with the salt and the hot key spreads across salt values") {
    val joined = SkewJoin.saltedEquiJoin(fact, dim, Seq("k"), Seq("line"), 16)
    assert(joined.queryExecution.optimizedPlan.toString.contains("_salt"),
      "salt must be part of the join key")
    val spread = fact
      .withColumn("_salt", pmod(xxhash64($"line"), lit(16L)))
      .filter($"k" === 1L).groupBy("_salt").count()
      .as[(Long, Long)].collect()
    assert(spread.length == 16, "hot key must occupy every salt bucket")
    assert(spread.map(_._2).max < 9000L * 2 / 16 + 200, "roughly balanced")
  }
}
