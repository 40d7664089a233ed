package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SCD2 invariant that matters: after folding ANY snapshot sequence,
  * `asOf(t_i)` reproduces snapshot i exactly — point-in-time reads are
  * lossless for every batch, not just the latest.
  */
class Scd2PropertiesSpec extends SparkSpec {
  import spark.implicits._

  test("asOf reproduces every historical snapshot for seeded random snapshot sequences") {
    for (seed <- Seq(7, 41)) {
      val rnd = new Random(seed)
      val keySpace = 1L to 30L
      // 4 generations: each key present with p=0.7, value re-rolled with p=0.4
      var values = keySpace.map(k => k -> rnd.nextInt(5)).toMap
      val snaps = (1 to 4).map { gen =>
        values = values.map { case (k, v) =>
          k -> (if (rnd.nextDouble() < 0.4) rnd.nextInt(5) else v)
        }
        val present = keySpace.filter(_ => rnd.nextDouble() < 0.7)
        gen -> present.map(k => (k, s"s${values(k)}", values(k).toDouble)).toSeq
      }

      var hist = Scd2.init(snaps.head._2.toDF("k", "s", "v"), lit(100L))
      for ((gen, rows) <- snaps.tail)
        hist = Scd2.applySnapshot(hist, rows.toDF("k", "s", "v"), Seq("k"), lit(100L * gen))
      hist.cache()

      for ((gen, rows) <- snaps) {
        val got = Scd2.asOf(hist, lit(100L * gen + 50L))
          .select($"k", $"s", $"v").as[(Long, String, Double)].collect().toSet
        assert(got == rows.toSet, s"seed=$seed generation $gen not reproduced")
      }
      // exactly one open row per key present in the LAST snapshot
      val open = hist.filter($"is_current").groupBy($"k").count()
        .as[(Long, Long)].collect()
      assert(open.forall(_._2 == 1L))
      assert(open.map(_._1).toSet == snaps.last._2.map(_._1).toSet)
      hist.unpersist()
    }
  }

  test("joinAsOf hands each fact the version valid at its own timestamp") {
    val h2 = Scd2.applySnapshot(
      Scd2.init(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "v"), lit(100L)),
      Seq((1L, "a", 9.0), (3L, "c", 3.0)).toDF("k", "s", "v"),
      Seq("k"), lit(200L))
    val facts = Seq(
      (1L, 10L, 150L), (1L, 11L, 250L), // sees v=1.0 then v=9.0
      (2L, 12L, 150L), (2L, 13L, 250L), // second dropped (key removed at 200)
      (3L, 14L, 150L),                  // dropped (not yet present)
      (9L, 15L, 150L)                   // dropped (never present)
    ).toDF("k", "fact_id", "t")
    val got = Scd2.joinAsOf(facts, h2, Seq("k"), "t")
      .select($"fact_id", $"v").as[(Long, Double)].collect().toMap
    assert(got == Map(10L -> 1.0, 11L -> 9.0, 12L -> 2.0))
  }
}
