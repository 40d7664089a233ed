package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * select raw-corpus documents that look like a small target domain by
  * weighting each document with the log-likelihood ratio of two hashed
  * n-gram bag-of-words models, then Gumbel-top-k resampling on the weights.
  *
  * Beyond-reference operator for the training-data pipeline (the reference
  * engine has no data-selection stage); sits alongside the dedup/quality
  * family in `TextPipeline`.
  *
  * Scale design, in pipeline order:
  *   - feature extraction ([[hashedGrams]]) is a pure column expression
  *     (whole-stage codegen, md5-based so the DuckDB oracle reproduces it
  *     bit-for-bit) — a projection over the scan, no shuffle;
  *   - the two bucket-count aggregations shuffle at most `numBuckets` keys
  *     (default 4096) with map-side partial aggregation, so the shuffle
  *     volume is O(B) per task regardless of corpus size;
  *   - the ratio table is bounded at B rows by construction, so the
  *     per-document weight join broadcasts it — the only per-document
  *     shuffle is the final groupBy(doc id) sum;
  *   - selection is `orderBy(...).limit(k)` = TakeOrderedAndProject (per
  *     partition top-k + driver merge of k·P rows), never a global sort.
  */
object Dsir {

  /** Hashed n-gram features: unigrams + word bigrams, each mapped to a
    * bucket in `[0, numBuckets)` via the first 4 hex digits of its md5.
    * The size guard mirrors [[TextOps.shingles]]: `sequence(1, size-1)`
    * runs DESCENDING for a 1-token array and `element_at` would throw.
    *
    * Never pass a raw `tokenize(text)` subtree as `tokens`: an interpreted
    * HOF re-inlines it into every element access (O(tokens²) per doc).
    * The corpus pipelines let-bind it once per document
    * ([[gramBuckets]] via `ArrayOps.bindOnce`).
    */
  def hashedGrams(tokens: Column, numBuckets: Int): Column = {
    require(
      numBuckets > 0 && numBuckets <= 65536,
      s"numBuckets must be in [1, 65536] (4 md5 hex digits of entropy): $numBuckets")
    val bigrams =
      when(size(tokens) < 2, array().cast("array<string>"))
        .otherwise(
          transform(
            sequence(lit(1), size(tokens) - 1),
            i => concat_ws(" ", element_at(tokens, i), element_at(tokens, i + 1))
          ))
    transform(
      concat(tokens, bigrams),
      g => conv(substring(md5(g), 1, 4), 16, 10).cast("int") % numBuckets
    )
  }

  /** Relational gram-bucket stream: one row per unigram and bigram,
    * `(id, bucket)`. The tokenize split is let-bound once per document via
    * [[graft.functions.ArrayOps.bindOnce]] before [[hashedGrams]] runs, so
    * the whole stream is a shuffle-free explode-projection — the windowed
    * `lead` alternative ([[Dedup.duplicatedGramPositions]]) costs a
    * per-document sort shuffle PER CALL, and the DSIR pipelines stream
    * grams three times (raw counts, target counts, document weights);
    * measured 8.5 → 2.6 s on q_dsir_select at sf0.1.
    */
  private def gramBuckets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int
  ): DataFrame =
    df.select(
      col(idCol),
      explode(graft.functions.ArrayOps.bindOnce("toks" -> TextOps.tokenize(col(textCol))) {
        get => hashedGrams(get("toks"), numBuckets)
      }).as("bucket"))

  /** Per-bucket log-likelihood ratio `ln p̂_target(b) − ln p̂_raw(b)` of the
    * two Laplace-smoothed hashed-gram models. Output has one row per bucket
    * observed in `raw` (≤ `numBuckets` rows, bounded by construction — the
    * empty-frame totals window below is a single-partition pass over at
    * most B rows, not a scale concern).
    *
    * Buckets seen only in `target` cannot be hit by a raw-corpus document,
    * so they emit no output row — but their mass still counts in the
    * target-model normalizer `t_target` (computed from the unjoined target
    * counts), so log-ratios stay correct when target is not a subset of
    * raw. Smoothing covers target-absent buckets.
    */
  def bucketLogRatios(
      raw: DataFrame,
      target: DataFrame,
      textCol: String = "text",
      numBuckets: Int = 4096,
      alpha: Double = 0.5
  ): DataFrame = {
    def bucketCounts(df: DataFrame, name: String): DataFrame = {
      // any column works as the id carrier here; counts drop it
      val idCol = df.columns.head
      gramBuckets(df, idCol, textCol, numBuckets)
        .groupBy("bucket")
        .agg(count(lit(1)).cast("double").as(name))
    }
    val targetCounts = bucketCounts(target, "c_target")
    // Target total from the UNJOINED counts: buckets present only in target
    // still contribute to the normalizer (the general DSIR setting where
    // target is not a subset of raw). Single-row broadcast carrier.
    val tTarget = targetCounts.agg(
      coalesce(sum("c_target"), lit(0.0)).as("t_target"))
    val joined = bucketCounts(raw, "c_raw")
      .join(targetCounts, Seq("bucket"), "left")
      .na.fill(0.0, Seq("c_target"))
    val all = Window.partitionBy()
    joined
      .withColumn("t_raw", sum("c_raw").over(all))
      .crossJoin(broadcast(tTarget))
      .select(
        col("bucket"),
        (log((col("c_target") + alpha) / (col("t_target") + alpha * numBuckets))
          - log((col("c_raw") + alpha) / (col("t_raw") + alpha * numBuckets)))
          .as("log_ratio")
      )
  }

  /** Per-document importance weight: the sum of its grams' bucket log
    * ratios (= the log importance ratio of the document under the two
    * models). Documents with no grams in the ratio table (empty text)
    * weigh 0 — the empty-product convention. `docs` must be drawn from the
    * corpus `ratios` was fit on, the standard DSIR setup.
    */
  def importanceWeights(
      docs: DataFrame,
      ratios: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numBuckets: Int = 4096
  ): DataFrame = {
    // Broadcast-budget guard: the ratio table is ≤ numBuckets rows (~40 B
    // each) by construction, so the bound is provable statically. 2²² ≈ 4M
    // buckets ≈ 160 MiB is a generous ceiling; a caller hashing into more
    // buckets than that must restructure (the DSIR paper uses 10⁴),
    // not silently broadcast gigabytes.
    require(
      numBuckets <= (1 << 22),
      s"importanceWeights: numBuckets=$numBuckets would broadcast a " +
        s"~${numBuckets.toLong * 40 >> 20} MiB ratio table; cap is 2^22 buckets")
    val summed = gramBuckets(docs, idCol, textCol, numBuckets)
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(idCol)
      .agg(sum("log_ratio").as("weight"))
    docs
      .select(col(idCol))
      .join(summed, Seq(idCol), "left")
      .na.fill(0.0, Seq("weight"))
  }

  /** Gumbel-top-k resampling: adds `−ln(−ln u)` Gumbel noise to each log
    * weight and takes the k largest — equivalent to sampling k documents
    * without replacement with probability ∝ exp(weight). The uniform `u`
    * is derived from the md5 of the document id (deterministic, seedable,
    * engine-independent), so the draw is reproducible across runs and
    * engines. Ordering uses the UNROUNDED score: noise gaps are ~1e-3
    * while cross-engine float drift is ~1e-15.
    */
  def gumbelTopK(
      weights: DataFrame,
      k: Int,
      seed: String = "g",
      idCol: String = "doc_id"
  ): DataFrame = {
    val u =
      (conv(
        substring(md5(concat(lit(seed + ":"), col(idCol).cast("string"))), 1, 4),
        16,
        10
      ).cast("double") + 0.5) / 65536.0
    weights
      .withColumn("score", col("weight") - log(-log(u)))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("score"))
  }
}
