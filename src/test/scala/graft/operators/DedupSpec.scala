package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(sf("documents"))

  test("LSH candidates catch planted near-duplicates and never all pairs") {
    val n = docs.count()
    val verified = Dedup.verifiedPairs(docs)
    val rows = verified.collect()
    // Candidate set must be far below all-pairs.
    assert(rows.length < n * (n - 1) / 4)
    // Every candidate with jaccard ≥ 0.9 is a genuine near-dup; at least one
    // such pair is planted in the corpus at every scale factor.
    val high = rows.filter(_.getAs[Double]("jaccard") >= 0.9)
    assert(high.nonEmpty, "expected planted near-duplicates in candidates")
  }

  test("near-duplicates have close simhash, unrelated docs do not") {
    import spark.implicits._
    val withSim = docs
      .withColumn("toks", TextOps.tokenize(col("text")))
      .select(col("doc_id"), TextOps.simhash16(col("toks")).as("simhash"))
      .as[(Long, Int)]
      .collect()
      .toMap
    val pair = Dedup.verifiedPairs(docs)
      .filter(col("jaccard") >= 0.9)
      .select("l_doc", "r_doc")
      .as[(Long, Long)]
      .head()
    def hamming(a: Int, b: Int) = Integer.bitCount(a ^ b)
    assert(hamming(withSim(pair._1), withSim(pair._2)) <= 3)
  }

  test("jaccard of identical shingle sets is 1") {
    import spark.implicits._
    val df = Seq((Seq("a b c", "b c d"), Seq("b c d", "a b c"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y")).as("j")).as[Double].head()
    assert(j === 1.0)
  }

  test("connectedComponents resolves multi-hop chains, merges and cycles to min-id labels") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12 (cycle),
    // two components bridged late: {20,21} + {22,23} via (21,22)
    val pairs = Seq(
      (2L, 1L), (3L, 2L), (4L, 3L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L), (22L, 23L), (21L, 22L)
    ).toDF("l_id", "r_id")
    val comp = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("connectedComponents of an empty pair set is empty (no NPE on the fixpoint check)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("l_id", "r_id")
    assert(Dedup.connectedComponents(empty).count() === 0L)
    // dedupByComponent then keeps every doc as its own canonical
    val docs = Seq(5L, 6L).toDF("doc_id")
    val got = Dedup.dedupByComponent(docs, empty)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(got === Map(5L -> true, 6L -> true))
  }

  test("dedupByComponent keeps exactly one canonical doc per component, unpaired docs keep themselves") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 9L).toDF("doc_id") // 9 is in no pair
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("l_id", "r_id")
    val got = Dedup.dedupByComponent(docs, pairs)
      .select("doc_id", "component", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (9L, 9L, true)))
  }
}
