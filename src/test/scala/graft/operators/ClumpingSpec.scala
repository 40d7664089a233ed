package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden-value tests from the reference doctests
  * (method/window_based_clumping.py:44-91, :127-131).
  */
class ClumpingSpec extends SparkSpec {

  test("clusterPeaks reproduces the reference doctest cluster ids") {
    import spark.implicits._
    val data = Seq(
      ("s1", "chr1", 2), ("s1", "chr1", 4), ("s1", "chr1", 12),
      ("s1", "chr1", 31), ("s1", "chr1", 38), ("s1", "chr1", 42),
      ("s1", "chr2", 41), ("s1", "chr2", 44), ("s1", "chr2", 50),
      ("s2", "chr2", 55), ("s2", "chr2", 62), ("s2", "chr2", 70)
    ).toDF("studyId", "chromosome", "position")

    val got = data
      .withColumn(
        "cluster_id",
        WindowBasedClumping.clusterPeaks(col("studyId"), col("chromosome"), col("position"), 10)
      )
      .orderBy("studyId", "chromosome", "position")
      .select("cluster_id")
      .as[String]
      .collect()
      .toSeq

    assert(
      got === Seq(
        "s1_chr1_2", "s1_chr1_2", "s1_chr1_2",
        "s1_chr1_31", "s1_chr1_31", "s1_chr1_31",
        "s1_chr2_41", "s1_chr2_41", "s1_chr2_41",
        "s2_chr2_55", "s2_chr2_55", "s2_chr2_55"
      )
    )
  }

  test("prunePeak reproduces the reference doctest lead vector") {
    assert(
      WindowBasedClumping.prunePeak(Seq(3L, 9L, 8L, 4L, 6L), 2) === Seq(1, 1, 0, 0, 1)
    )
  }

  test("prunePeakLeadIndices is the index compression of prunePeak") {
    assert(
      WindowBasedClumping.prunePeakLeadIndices(Seq(3L, 9L, 8L, 4L, 6L), 2) ===
        Seq(0, 1, 4))
    // property over random position sets: indices == positions of the 1s
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val ps = Seq.fill(rnd.nextInt(200) + 1)(rnd.nextInt(100000).toLong)
      val w = rnd.nextInt(5000) + 1
      val flags = WindowBasedClumping.prunePeak(ps, w)
      val idx = WindowBasedClumping.prunePeakLeadIndices(ps, w)
      assert(idx === flags.zipWithIndex.collect { case (1, i) => i })
    }
  }

  test("clump keeps all variants and flags non-leads") {
    import spark.implicits._
    // One cluster (positions within 10 of each other), pv rank: 20 < 30 < 40.
    val df = Seq(
      ("s1", "chr1", 20, 1.0f, -10, "v1"),
      ("s1", "chr1", 25, 1.0f, -8, "v2"),
      ("s1", "chr1", 30, 1.0f, -6, "v3")
    ).toDF("studyId", "chromosome", "position", "pValueMantissa", "pValueExponent", "variantId")

    val out = WindowBasedClumping.clump(df, distance = 10)
      .select("variantId", "qualityControls")
      .as[(String, Seq[String])]
      .collect()
      .toMap

    assert(out("v1").isEmpty) // most significant → lead
    assert(out("v2") === Seq(WindowBasedClumping.WindowClumpedFlag)) // within 10 of v1
    assert(out("v3").isEmpty) // 10 away from v1 → not `< distance` → new lead
  }
}
