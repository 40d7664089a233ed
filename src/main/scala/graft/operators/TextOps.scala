package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column kernels for the large-scale training-data pipeline:
  * tokenization, shingling, MinHash signatures, SimHash, language
  * identification, quality scoring, fingerprinting.
  *
  * Everything here is a pure column expression (array higher-order
  * functions) — per-document work happens inside whole-stage codegen with NO
  * shuffle and NO UDF: a signature over 100 TB of documents is a single
  * projection over the scan.
  *
  * Hashes are md5-based so results are engine-independent (the DuckDB oracle
  * reproduces them bit-for-bit), unlike murmur3 `hash()` which is
  * Spark-private.
  */
object TextOps {

  /** Whitespace tokenization. */
  def tokenize(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingles over a token array. */
  def shingles(tokens: Column, n: Int = 3): Column =
    transform(
      sequence(lit(1), size(tokens) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(tokens, i + k)): _*)
    )

  /** MinHash signature: for each of `numHashes` seeds, the minimum md5 of the
    * seeded shingle. One projection, no shuffle.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int = 16): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      j =>
        array_min(
          transform(shingleCol, sh => md5(concat(lit("s"), j.cast("string"), lit(":"), sh)))
        )
    )

  /** LSH band hashes over a MinHash signature: `bands` hashes of
    * `rowsPerBand` consecutive signature entries. Documents sharing any band
    * hash are near-duplicate candidates.
    */
  def lshBands(signature: Column, bands: Int = 8, rowsPerBand: Int = 2): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b =>
        md5(
          concat(
            (1 to rowsPerBand).map(r => element_at(signature, b * rowsPerBand + r)): _*
          )
        )
    )

  /** 16-bit SimHash over a token array: bit b is the sign of the sum over
    * tokens of ±1 taken from the LSB of hex digit b+1 of the token's md5.
    * Near-identical documents land within small Hamming distance.
    */
  def simhash16(tokens: Column): Column =
    (0 until 16)
      .map { b =>
        val perToken: Column => Column =
          t => conv(substring(md5(t), b + 1, 1), 16, 10).cast("int") % 2 * 2 - 1
        val total = aggregate(tokens, lit(0), (acc, t) => acc + perToken(t))
        when(total >= 0, lit(1 << b)).otherwise(lit(0))
      }
      .reduce(_ + _)

  /** Language identification by stopword hit count with a fixed priority
    * order on ties (en > de > es > fr > zh). N-gram-free heuristic: counts
    * include repeated tokens.
    */
  val StopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我")
  )

  def stopwordHits(tokens: Column, stopwords: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(stopwords)))

  def langId(tokens: Column): Column = {
    val scores = StopwordsByLang.map { case (lang, sw) => lang -> stopwordHits(tokens, sw) }
    // Priority argmax: first language whose score >= all later ones.
    scores.zipWithIndex.foldRight(lit(StopwordsByLang.last._1)) {
      case (((lang, score), idx), elseCol) =>
        val later = scores.drop(idx + 1).map(_._2)
        if (later.isEmpty) elseCol
        else {
          val best = if (later.size == 1) later.head else greatest(later: _*)
          when(score >= best, lit(lang)).otherwise(elseCol)
        }
    }
  }

  /** Document fingerprint: the k smallest shingle md5s, comma-joined
    * (a k-min sketch — stable under small edits).
    */
  def fingerprint(shingleCol: Column, k: Int = 3): Column =
    concat_ws(",", slice(array_sort(transform(shingleCol, sh => md5(sh))), 1, k))

  /** BPE-ish token count: alpha runs, digit runs, single other symbols. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** C4-style composite quality predicate over a token array: token-count
    * band, mean-token-length band, minimum stopword ratio, minimum unique
    * ratio. Rows passing every gate are training-quality documents.
    */
  def qualityPredicate(
      tokens: Column,
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      minMeanTokenLen: Double = 2.0,
      maxMeanTokenLen: Double = 12.0,
      minStopwordRatio: Double = 0.01,
      minUniqueRatio: Double = 0.1
  ): Column = {
    val n = size(tokens).cast("double")
    val meanLen = aggregate(tokens, lit(0), (acc, t) => acc + length(t)) / n
    val stopRatio = stopwordHits(tokens, StopwordsByLang.toMap.apply("en")) / n
    val uniqRatio = size(array_distinct(tokens)) / n
    n.between(minTokens, maxTokens) &&
      meanLen.between(minMeanTokenLen, maxMeanTokenLen) &&
      (stopRatio >= minStopwordRatio) &&
      (uniqRatio >= minUniqueRatio)
  }
}
