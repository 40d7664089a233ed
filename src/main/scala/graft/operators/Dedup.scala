package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Near-duplicate detection at corpus scale: MinHash + LSH banding.
  *
  * Scale design: candidate generation NEVER considers all pairs — documents
  * are exploded to (band, bandHash) keys and only bucket collisions are
  * joined (a shuffle on band hash, with each bucket tiny for non-duplicate
  * corpora). Verification (exact n-gram Jaccard) runs only on candidates.
  */
object Dedup {

  /** Per-document signature table: doc id, shingle set, band hashes. */
  def signatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8
  ): DataFrame = {
    // Each stage is materialised as a column before feeding the next HOF:
    // array lambdas evaluate interpreted, so an inlined tokenize/shingle
    // expression would be re-computed per outer lambda element (16× per row
    // for the signature) — a >100× slowdown observed at sf0.1.
    docs
      .select(col(idCol), TextOps.tokenize(col(textCol)).as("toks"))
      .select(col(idCol), TextOps.shingles(col("toks"), shingleSize).as("shingles"))
      .select(
        col(idCol), col("shingles"),
        TextOps.minhashSignature(col("shingles"), numHashes).as("sig")
      )
      .select(
        col(idCol), col("shingles"),
        TextOps.lshBands(col("sig"), bands, numHashes / bands).as("bands")
      )
  }

  /** Candidate near-duplicate pairs: documents sharing at least one LSH band
    * bucket. Join key is (band index, band hash) — never all-pairs.
    */
  def candidatePairs(sigs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val exploded = sigs
      .select(col(idCol), posexplode(col("bands")).as(Seq("band", "band_hash")))
    exploded.as("a")
      .join(
        exploded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col(s"a.$idCol") < col(s"b.$idCol")
      )
      .select(col(s"a.$idCol").as("l_doc"), col(s"b.$idCol").as("r_doc"))
      .distinct()
  }

  /** Exact Jaccard over distinct shingle sets. */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db))
    inter / (size(da) + size(db) - inter).cast("double")
  }

  /** Verify candidates with exact n-gram Jaccard; keeps all candidates with
    * their similarity so callers can threshold.
    */
  def verifiedPairs(docs: DataFrame): DataFrame = {
    val sigs = signatures(docs).persist()
    val pairs = candidatePairs(sigs)
    val shingleSets = sigs.select(col("doc_id"), array_distinct(col("shingles")).as("s"))
    pairs
      .join(shingleSets.as("x"), col("l_doc") === col("x.doc_id"))
      .join(shingleSets.as("y"), col("r_doc") === col("y.doc_id"))
      .select(
        col("l_doc"),
        col("r_doc"),
        round(jaccard(col("x.s"), col("y.s")), 6).as("jaccard")
      )
  }
}
