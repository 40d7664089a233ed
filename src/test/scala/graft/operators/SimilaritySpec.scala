package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(sf("embeddings"))

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    val self = emb.limit(1).select(Similarity.asDouble(col("embedding")).as("v"))
    val c = self.select(Similarity.cosine(col("v"), col("v")).as("c")).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("brute-force top-k is ordered by similarity and excludes self") {
    import spark.implicits._
    val topk = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
    val rows = topk.select("q_id", "neighbor_id", "cos").as[(Long, Long, Double)].collect()
    assert(rows.groupBy(_._1).forall { case (_, g) => g.length == 5 })
    assert(rows.forall { case (q, n, _) => q != n })
    rows.groupBy(_._1).values.foreach { g =>
      val sims = g.map(_._3).toSeq
      assert(sims == sims.sorted.reverse)
    }
  }

  test("ANN candidates share the query bucket; recall vs brute force is sane") {
    import spark.implicits._
    val bucketed = Similarity.lshBuckets(emb)
    // Every vector gets one of 16 buckets.
    val buckets = bucketed.select("bucket").as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 16))
    val ann = Similarity.annTopK(bucketed, col("vec_id") < 20, k = 3)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20), k = 3)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // LSH with 4 planes on random vectors: recall is partial by design; just
    // require overlap to confirm buckets are not degenerate.
    assert(ann.nonEmpty)
    assert((ann intersect brute).nonEmpty)
  }
}
