package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-call corpus cleaning for LLM training data — the standard C4/Gopher
  * gate sequence composed from the individual operators, with a keep flag
  * and a first-failing-gate reason per document:
  *
  *   1. quality   — C4-style composite ([[TextOps.qualityPredicate]])
  *   2. language  — stopword-vote language id in an allowlist
  *   3. repetition — Gopher gates (duplicate 2-gram fraction, top-token share)
  *   4. exact_duplicate — content-hash dedup, keep the lowest doc id
  *   5. near_duplicate  — MinHash/LSH candidates verified by n-gram Jaccard;
  *      the later (higher-id) side of each qualifying pair is dropped
  *
  * Scale shape: gates 1–3 are shuffle-free per-row projections; exact dedup
  * is one hash shuffle over the SURVIVORS only (filter-then-dedup, the cheap
  * order); near-dedup reuses the bucketed LSH chain (never all-pairs).
  * Dropping the higher id of each qualifying pair is deliberately
  * single-pass — the iterative alternative (connected components, keep one
  * per cluster) needs multi-round joins for a marginal retention gain.
  */
object TextPipeline {

  def cleanCorpus(
      docs: DataFrame,
      minTokens: Int = 20,
      minStopwordRatio: Double = 0.02,
      allowedLangs: Seq[String] = Seq("en"),
      maxDup2gramFrac: Double = 0.4,
      maxTopTokenRatio: Double = 0.3,
      nearDupJaccard: Double = 0.5
  ): DataFrame = {
    val gated = docs
      .withColumn("toks", TextOps.tokenize(col("text")))
      .withColumn(
        "q_ok",
        TextOps.qualityPredicate(
          col("toks"), minTokens = minTokens, minStopwordRatio = minStopwordRatio))
      .withColumn("l_ok", TextOps.langId(col("toks")).isInCollection(allowedLangs))
      .withColumn(
        "r_ok",
        TextOps.duplicateNgramFraction(col("toks"), 2) <= maxDup2gramFrac &&
          TextOps.topTokenRatio(col("toks")) <= maxTopTokenRatio)
      .drop("toks")

    // Exact dedup over gate survivors only (dedup after filtering): first
    // occurrence by doc id survives, the rest are exact duplicates.
    val survivors = gated.filter(col("q_ok") && col("l_ok") && col("r_ok"))
    val ranked = survivors
      .withColumn("content_hash", md5(col("text")))
      .withColumn(
        "dup_rank",
        row_number().over(Window.partitionBy("content_hash").orderBy("doc_id")))
    val exactDropped = ranked.filter(col("dup_rank") > 1).select(col("doc_id"))
    val nearDropped = Dedup
      .verifiedPairs(ranked.filter(col("dup_rank") === 1).select(col("doc_id"), col("text")))
      .filter(col("jaccard") >= nearDupJaccard)
      .select(col("r_doc").as("doc_id"))
      .distinct()

    val reason = when(!col("q_ok"), "quality")
      .when(!col("l_ok"), "language")
      .when(!col("r_ok"), "repetition")
      .when(col("is_exact_dup"), "exact_duplicate")
      .when(col("is_near_dup"), "near_duplicate")
    gated
      .join(
        exactDropped.withColumn("is_exact_dup", lit(true)), Seq("doc_id"), "left")
      .join(nearDropped.withColumn("is_near_dup", lit(true)), Seq("doc_id"), "left")
      .withColumn("reason", reason)
      .withColumn("keep", col("reason").isNull)
      .drop("q_ok", "l_ok", "r_ok", "is_exact_dup", "is_near_dup")
  }
}
