package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-level invariants of the curation operators on seeded random
  * inputs — the contracts a pipeline silently relies on.
  */
class CurationPropertiesSpec extends SparkSpec {
  import spark.implicits._

  test("hash samples are NESTED: a smaller fraction is always a subset of a larger one") {
    val ids = (1L to 4000L).toDF("id")
    val fractions = Seq(0.05, 0.1, 0.3, 0.7)
    val draws = fractions.map(f =>
      Sampling.hashSample(ids, $"id", f).as[Long].collect().toSet)
    for (Seq(small, large) <- draws.sliding(2))
      assert(small.subsetOf(large),
        "threshold sampling must grow monotonically — reproducible sample growth " +
          "is what lets a pipeline scale a corpus up without re-drawing it")
    // and the same holds per group for the k-draw
    val grouped = ids.withColumn("g", $"id" % 11)
    val k3 = Sampling.groupSample(grouped, Seq("g"), $"id", 3).as[(Long, Long)].collect().toSet
    val k9 = Sampling.groupSample(grouped, Seq("g"), $"id", 9).as[(Long, Long)].collect().toSet
    assert(k3.subsetOf(k9), "k-per-group draws must nest in k")
  }

  test("incremental aggregation over random change sequences equals direct recomputation") {
    for (seed <- Seq(3, 77)) {
      val rnd = new Random(seed)
      var current = (1 to 40).map(k => s"k$k" -> rnd.nextInt(100).toDouble).toMap
      var state = IncrementalAgg.initState(
        current.toSeq.toDF("k", "v"), Seq("k"), "v")
      for (_ <- 1 to 3) {
        val removedKeys = current.keys.filter(_ => rnd.nextDouble() < 0.3).toSet
        val changed = current.keys.filterNot(removedKeys).filter(_ => rnd.nextDouble() < 0.4)
          .map(k => k -> rnd.nextInt(100).toDouble).toMap
        val added = (1 to rnd.nextInt(10) + 1)
          .map(i => s"n${rnd.nextInt(1000)}_$i" -> rnd.nextInt(100).toDouble).toMap
        val removedRows = (removedKeys.map(k => k -> current(k)) ++
          changed.keys.map(k => k -> current(k))).toSeq
        val addedRows = (changed ++ added).toSeq
        current = current -- removedKeys -- changed.keys ++ changed ++ added
        state = IncrementalAgg.merge(
          state,
          IncrementalAgg.deltaFromRowSets(
            removedRows.toDF("k", "v"), addedRows.toDF("k", "v"), Seq("k"), "v"),
          Seq("k"))
      }
      val got = state.as[(String, Long, Double)].collect()
        .map(r => r._1 -> (r._2, math.round(r._3 * 1e6) / 1e6)).toMap
      val direct = IncrementalAgg.initState(current.toSeq.toDF("k", "v"), Seq("k"), "v")
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> (r._2, math.round(r._3 * 1e6) / 1e6)).toMap
      assert(got == direct, s"seed=$seed diverged after 3 random batches")
    }
  }

  test("snapshot diff composes: applying the diff's classes reconstructs the new snapshot") {
    val rnd = new Random(19)
    val s1 = (1L to 300L).map(k => (k, rnd.nextInt(5))).toDF("k", "v")
    val s2 = (1L to 300L).filter(_ => rnd.nextDouble() < 0.9)
      .map(k => (k, rnd.nextInt(5))).toDF("k", "v")
    val diff = SnapshotDiff.diff(s1, s2, Seq("k"))
    val byClass = diff.as[(Long, String)].collect().groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val s1m = s1.as[(Long, Int)].collect().toMap
    val s2m = s2.as[(Long, Int)].collect().toMap
    // removed ∪ changed ∪ unchanged = old keys; added ∪ changed ∪ unchanged = new keys
    val r = byClass.getOrElse("removed", Set()); val a = byClass.getOrElse("added", Set())
    val c = byClass.getOrElse("changed", Set()); val u = byClass.getOrElse("unchanged", Set())
    assert((r ++ c ++ u) == s1m.keySet && (a ++ c ++ u) == s2m.keySet)
    assert(u.forall(k => s1m(k) == s2m(k)) && c.forall(k => s1m(k) != s2m(k)))
  }
}
