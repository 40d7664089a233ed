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
}
