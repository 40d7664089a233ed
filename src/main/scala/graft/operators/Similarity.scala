package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k via a broadcast cross join —
  *     the correctness baseline, O(|queries| × |corpus|). Fine when the
  *     query set is small and broadcastable.
  *   - [[lshBuckets]] + [[annTopK]]: random-hyperplane LSH — vectors are
  *     bucketed by sign-pattern, candidates are co-bucketed only. The join
  *     shuffles on the bucket id, so corpus scale-out is linear; this is the
  *     100 TB path.
  *
  * Hyperplane weights derive from md5 so any engine (and the DuckDB oracle)
  * reproduces them exactly.
  */
object Similarity {

  /** Cast a float-array column to double for stable arithmetic. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k neighbours for each query vector (excluding self), ranked
    * by cosine desc with id tiebreak.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int
  ): DataFrame = {
    val q = queries.select(
      col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_emb"))
    val c = corpus.select(
      col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("c_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_raw").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("cos_raw", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("neighbor_id"), round(col("cos_raw"), 6).as("cos"))
  }

  /** ±1 hyperplane weight for (plane, dim), derived from md5 — deterministic
    * and engine-independent: +1 iff the first hex digit of
    * md5("p:&lt;plane&gt;:d:&lt;dim&gt;") is ≥ 8.
    */
  def planeWeight(plane: Int, dim: Int): Double = {
    val h = MessageDigest.getInstance("MD5")
      .digest(s"p:$plane:d:$dim".getBytes(StandardCharsets.UTF_8))
    val firstHexDigit = (h(0) >> 4) & 0xf
    if (firstHexDigit >= 8) 1.0 else -1.0
  }

  /** Append an LSH `bucket` column: bit p of the bucket is the sign of the
    * dot product with hyperplane p.
    */
  def lshBuckets(vectors: DataFrame, numPlanes: Int = 4, dims: Int = 64): DataFrame = {
    val vecD = asDouble(col("embedding"))
    val bucket = (0 until numPlanes)
      .map { p =>
        val plane = (0 until dims).map(d => planeWeight(p, d))
        val d = dot(vecD, typedlit(plane))
        when(d >= 0, lit(1L << p)).otherwise(lit(0L))
      }
      .reduce(_ + _)
    vectors.withColumn("bucket", bucket)
  }

  /** IVF-style partitioning: assign every vector to its nearest centroid
    * (cosine, centroid-id tiebreak). Centroids are any small broadcastable
    * table of (centroid_id, embedding); production would use k-means means,
    * here any deterministic subset works — the partition/probe mechanics are
    * identical.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val c = broadcast(centroids.select(
      col("centroid_id"), asDouble(col("embedding")).as("c_emb")))
    val v = vectors.select(
      col("vec_id"), col("embedding"), asDouble(col("embedding")).as("v_emb"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("c_cos").desc, col("centroid_id").asc)
    v.crossJoin(c)
      .withColumn("c_cos", cosine(col("v_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id").as("bucket"))
  }

  /** Embedding-level near-duplicate pairs: candidates co-bucketed by the LSH
    * sign pattern, verified by exact cosine above `threshold`. The dedup
    * variant of [[annTopK]] — same bucketed candidate generation, symmetric
    * output with id ordering.
    */
  def embeddingNearDupPairs(bucketed: DataFrame, threshold: Double): DataFrame = {
    val a = bucketed.select(
      col("vec_id").as("l_id"), asDouble(col("embedding")).as("l_emb"), col("bucket"))
    val b = bucketed.select(
      col("vec_id").as("r_id"), asDouble(col("embedding")).as("r_emb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("l_id") < col("r_id"))
      .withColumn("cos_raw", cosine(col("l_emb"), col("r_emb")))
      .filter(col("cos_raw") >= threshold)
      .select(col("l_id"), col("r_id"), round(col("cos_raw"), 6).as("cos"))
  }

  /** Approximate top-k: only candidates sharing the query's bucket are
    * scored. The bucket join is an equi-shuffle; no all-pairs work.
    */
  def annTopK(
      bucketed: DataFrame,
      queryPredicate: Column,
      k: Int
  ): DataFrame = {
    val q = bucketed.filter(queryPredicate).select(
      col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_emb"), col("bucket"))
    val c = bucketed.select(
      col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("c_emb"), col("bucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_raw").desc, col("neighbor_id").asc)
    c.join(q, Seq("bucket"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("cos_raw", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("neighbor_id"), round(col("cos_raw"), 6).as("cos"))
  }
}
