package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based checks over generated event sets: the windowed and
  * bucketed as-of plans must agree on ARBITRARY data (keys, times, gaps,
  * empty sides), and both must agree with a driver-side reference model —
  * three independent implementations of the same contract.
  */
class AsofJoinPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val genEvents: Gen[(List[(Long, Long, String)], List[(Long, Long, Double)])] =
    for {
      nl <- Gen.choose(0, 120)
      nr <- Gen.choose(0, 120)
      left <- Gen.listOfN(nl, for {
        k <- Gen.choose(0L, 4L)
        t <- Gen.choose(-500L, 500L)
      } yield (k, t, s"L$k-$t"))
      right <- Gen.listOfN(nr, for {
        k <- Gen.choose(0L, 4L)
        t <- Gen.choose(-500L, 500L)
        w <- Gen.choose(0, 1000)
      } yield (k, t, w / 10.0))
    } yield (left.distinct, right.distinct)

  /** Driver-side reference model of the backward as-of with dedup-by-max. */
  private def model(
      left: Seq[(Long, Long, String)],
      right: Seq[(Long, Long, Double)],
      tolerance: Option[Long]
  ): Set[(Long, Long, String, Option[Long], Option[Double])] = {
    val byKey = right
      .groupBy(r => (r._1, r._2)).map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }
      .toSeq.groupBy(_._1)
    left.map { case (k, t, tag) =>
      val cands = byKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
      val hit = if (cands.isEmpty) None else Some(cands.maxBy(_._2))
      val kept = hit.filter(h => tolerance.forall(tol => t - h._2 <= tol))
      (k, t, tag, kept.map(_._2), kept.map(_._3))
    }.toSet
  }

  private def run(df: DataFrame): Set[(Long, Long, String, Option[Long], Option[Double])] =
    df.select("k", "t", "tag", "asofTime", "w")
      .as[(Long, Long, String, Option[Long], Option[Double])]
      .collect().toSet

  test("windowed ≡ bucketed ≡ reference model on 12 generated event sets") {
    val seeds = (1L to 12L).map(Seed.apply)
    for (seed <- seeds) {
      val (l, r) = genEvents.apply(Gen.Parameters.default, seed).get
      val lDf = l.toDF("k", "t", "tag")
      val rDf = r.toDF("k", "t", "w")
      for (tol <- Seq(None, Some(50L))) {
        val expected = model(l, r, tol)
        val windowed = run(AsofJoin.asof(lDf, rDf, Seq("k"), "t", Seq("w"), tolerance = tol))
        assert(windowed == expected, s"windowed diverged from model (seed=$seed tol=$tol)")
        for (width <- Seq(7L, 100L, 1000L)) {
          val bucketed = run(AsofJoin.asofBucketed(
            lDf, rDf, Seq("k"), "t", Seq("w"), width, tolerance = tol))
          assert(bucketed == expected, s"bucketed diverged (seed=$seed tol=$tol width=$width)")
        }
      }
    }
  }
}
