package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RepetitionContaminationSpec extends SparkSpec {

  import spark.implicits._

  private def toks(text: String) =
    Seq(text).toDF("text").select(TextOps.tokenize(col("text")).as("toks"))

  test("duplicateNgramFraction: hand-computed fractions and the short-doc guard") {
    // tokens: a b a b a → 2-grams: [a b, b a, a b, b a] → 2 distinct of 4
    val dup2 = toks("a b a b a")
      .select(TextOps.duplicateNgramFraction(col("toks"), 2))
      .as[Double].head()
    assert(dup2 === 0.5)
    // all distinct 2-grams → 0
    val none = toks("a b c d")
      .select(TextOps.duplicateNgramFraction(col("toks"), 2))
      .as[Double].head()
    assert(none === 0.0)
    // doc shorter than n → defined 0, not null/negative
    val short = toks("a")
      .select(TextOps.duplicateNgramFraction(col("toks"), 3))
      .as[Double].head()
    assert(short === 0.0)
  }

  test("topTokenRatio equals max token count over total") {
    // 'x' appears 3 of 6 tokens
    val r = toks("x y x z x w").select(TextOps.topTokenRatio(col("toks")))
      .as[Double].head()
    assert(r === 0.5)
    // all unique → 1/n
    val u = toks("p q r s").select(TextOps.topTokenRatio(col("toks")))
      .as[Double].head()
    assert(u === 0.25)
  }

  test("contaminationScores: planted benchmark overlap is found, clean doc scores 0") {
    val docs = Seq(
      // 8 tokens → 4 distinct 5-grams; first 5 tokens replicate the benchmark
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val benchmark = Seq("alpha beta gamma delta epsilon").toDF("text")
    val got = TextOps.contaminationScores(docs, benchmark, n = 5)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_matched", "contamination")
      .as[(Long, Int, Int, Double)].collect().toSeq
    assert(got === Seq((1L, 4, 1, 0.25), (2L, 3, 0, 0.0)))
  }

  test("unigramNegLogProb matches hand-computed corpus probabilities") {
    // corpus: 4 tokens total — 'a' twice (p=1/2), 'b' and 'c' once (p=1/4)
    val docs = Seq((1L, "a a"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextOps.unigramNegLogProb(docs)
      .select("doc_id", "n_tokens", "avg_neglogp")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 === 2L)
    assert(math.abs(got(1L)._2 - math.log(2.0)) < 1e-12) // -ln(1/2)
    assert(math.abs(got(2L)._2 - math.log(4.0)) < 1e-12) // -ln(1/4)
    // the rarer-token doc scores strictly higher (less typical)
    assert(got(2L)._2 > got(1L)._2)
  }

  test("bigramNegLogProb matches hand-computed interpolated probabilities") {
    // corpus bigrams: (a,a) ×1 from doc 1; (a,b) ×1 from doc 2.
    // context 'a' count = 2; unigrams: a×3 (p=3/5), b×1, c×1 (p=1/5 each).
    val docs = Seq((1L, "a a"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val got = TextOps.bigramNegLogProb(docs, lambda = 0.75)
      .select("doc_id", "n_bigrams", "avg_neglogp")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val pAA = 0.75 * (1.0 / 2.0) + 0.25 * (3.0 / 5.0) // p(a|a) interp
    val pAB = 0.75 * (1.0 / 2.0) + 0.25 * (1.0 / 5.0) // p(b|a) interp
    assert(got(1L)._1 === 1L)
    assert(math.abs(got(1L)._2 - -math.log(pAA)) < 1e-12)
    assert(math.abs(got(2L)._2 - -math.log(pAB)) < 1e-12)
    // the single-token doc has no bigrams and drops out
    assert(!got.contains(3L))
    // rarer continuation scores strictly higher
    assert(got(2L)._2 > got(1L)._2)
  }

  test("groupTokenKl matches hand-computed divergences; identical slice scores 0") {
    // corpus: a×2, b×2 (total 4, p_c = 1/2 each). A: p_s = (2/3, 1/3); B: all-b.
    val docs = Seq(("A", "a a b"), ("B", "b")).toDF("source", "text")
    val got = TextOps.groupTokenKl(docs)
      .select("source", "n_tokens", "kl")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val klA = 2.0 / 3 * math.log((2.0 / 3) / 0.5) + 1.0 / 3 * math.log((1.0 / 3) / 0.5)
    assert(got("A")._1 === 3L)
    assert(math.abs(got("A")._2 - klA) < 1e-12)
    assert(math.abs(got("B")._2 - math.log(2.0)) < 1e-12) // 1·ln(1/(1/2))
    // a slice distributed exactly like the corpus diverges by 0
    val uniform = Seq(("X", "a b"), ("Y", "a b")).toDF("source", "text")
    val zero = TextOps.groupTokenKl(uniform)
      .select("kl").as[Double].collect()
    assert(zero.forall(math.abs(_) < 1e-12))
  }

  test("bm25Scores matches the hand-computed Okapi formula; absent terms and docs score 0") {
    val docs = Seq(
      (1L, "spark spark fast"),
      (2L, "fast query engine"),
      (3L, "spark QUERY")
    ).toDF("doc_id", "text")
    // 'Spark' exercises query-term lowercasing, doc 3 text lowercasing;
    // 'missing' (df = 0) must stay finite via the +1 idf smoothing.
    val got = TextOps.bm25Scores(docs, Seq("Spark", "missing"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    val k1 = 1.2; val b = 0.75
    val avgdl = 8.0 / 3.0
    val idfSpark = math.log(1.0 + (3 - 2 + 0.5) / 2.5)
    def okapi(tf: Double, dl: Double) =
      idfSpark * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    assert(math.abs(got(1L) - okapi(2, 3)) < 5e-6)
    assert(got(2L) === 0.0)
    assert(math.abs(got(3L) - okapi(1, 2)) < 5e-6)
    // rarity payoff: the doc with double tf scores above the single-tf doc
    // despite its longer length at these parameters
    assert(got(1L) > got(3L))
  }

  test("scrubPii redacts emails, IPs and phones and leaves clean text alone") {
    val got = Seq(
      "write to jane.doe+spam@mail.example.org today",
      "server at 192.168.0.1 responded",
      "call 25-989-741-2988 now",
      "version 1.2 beats 3.4 and no pii here",
      "multi: a@b.co and c@d.io"
    ).toDF("text").select(TextOps.scrubPii(col("text"))).as[String].collect().toSeq
    assert(got === Seq(
      "write to <EMAIL> today",
      "server at <IP> responded",
      "call <PHONE> now",
      "version 1.2 beats 3.4 and no pii here",
      "multi: <EMAIL> and <EMAIL>"))
  }

  test("contaminationScoresPerRow (the stream-safe shape) matches the batch variant") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven"),
      (3L, "tiny")
    ).toDF("doc_id", "text")
    val benchmark = Seq("alpha beta gamma delta epsilon").toDF("text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_grams", "n_matched", "contamination")
      .as[(Long, Int, Int, Double)].collect().sortBy(_._1).toSeq
    assert(rows(TextOps.contaminationScores(docs, benchmark, n = 5)) ===
      rows(TextOps.contaminationScoresPerRow(docs, benchmark, n = 5)))
  }

  test("contaminationScores keeps non-text columns and handles gram-less docs") {
    val docs = Seq((7L, "tiny", "keep-me")).toDF("doc_id", "text", "tag")
    val benchmark = Seq("alpha beta gamma delta epsilon").toDF("text")
    val row = TextOps.contaminationScores(docs, benchmark, n = 5)
      .select("doc_id", "tag", "n_grams", "contamination")
      .as[(Long, String, Int, Double)].head()
    assert(row === ((7L, "keep-me", 0, 0.0)))
  }

  test("blocklistFlags matches case-insensitively and reports sorted distinct terms") {
    val docs = Seq(
      (1L, "The QUANTUM leap and the quantum fox"),
      (2L, "perfectly clean prose")
    ).toDF("doc_id", "text")
    val got = TextOps.blocklistFlags(docs, Seq("Quantum", "THE"))
      .select("doc_id", "blocked", "matched_terms")
      .as[(Long, Boolean, Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((true, Seq("quantum", "the"))))
    assert(got(2L) === ((false, Seq.empty)))
  }

  test("chunkTokens windows overlap by window-stride and keep the final partial chunk") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "")).toDF("doc_id", "text")
    val got = TextOps.chunkTokens(docs, window = 4, stride = 3)
      .select("doc_id", "chunk_no", "n_tokens", "chunk_text")
      .as[(Long, Int, Int, String)].collect().sortBy(r => (r._1, r._2))
    // starts 0,3,6,9 → windows [1..4],[4..7],[7..10],[10]; the "" doc
    // tokenizes to a single empty token (split semantics shared with every
    // oracle) → one 1-token chunk
    assert(got.toSeq === Seq(
      (1L, 0, 4, "t1 t2 t3 t4"),
      (1L, 1, 4, "t4 t5 t6 t7"),
      (1L, 2, 4, "t7 t8 t9 t10"),
      (1L, 3, 1, "t10"),
      (2L, 0, 1, "")))
  }
}
