package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextPipelineSpec extends SparkSpec {

  import spark.implicits._

  private val goodText =
    "the quick brown fox jumps over a lazy dog and then runs back to " +
      "the old mill where a miller keeps sacks of golden wheat for winter"

  test("cleanCorpus assigns every gate's reason on planted documents") {
    val docs = Seq(
      (1L, goodText), // keeps
      // German: enough English stopwords to pass quality (2/26 > 0.02) but
      // der/die/das/und/ist outvote them in the language gate
      (2L, "der hund und die katze sehen das haus und der baum ist gross " +
        "the alte garten hat viele bunte blumen a schnelle maus lief weg"),
      // repetitive: passes quality (unique ratio ~0.6, one 'the') but the
      // top token takes 9/24 > 0.3 of the document
      (3L, "spam mail spam filter spam inbox spam folder spam rule spam " +
        "alert spam report spam block spam list the server queue works"),
      (4L, "too short"), // quality (min tokens)
      (5L, goodText), // exact duplicate of 1
      (6L, goodText + " extra trailing words of the very same story here") // near dup of 1
    ).toDF("doc_id", "text")
    val out = TextPipeline.cleanCorpus(docs)
      .select("doc_id", "keep", "reason")
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((true, None)))
    assert(out(2L) === ((false, Some("language"))))
    assert(out(3L) === ((false, Some("repetition"))))
    assert(out(4L) === ((false, Some("quality"))))
    assert(out(5L) === ((false, Some("exact_duplicate"))))
    assert(out(6L) === ((false, Some("near_duplicate"))))
  }

  test("stratifiedSample keeps full strata, drops unlisted ones, and is deterministic") {
    val docs = (1L to 400L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val out = TextPipeline.stratifiedSample(
      docs, Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0))
    val bySrc = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc.getOrElse("src0", 0L) === 100L, "fraction 1.0 keeps everything")
    assert(!bySrc.contains("src2"), "fraction 0.0 drops the stratum")
    assert(!bySrc.contains("src3"), "unlisted strata are dropped")
    val kept = bySrc.getOrElse("src1", 0L)
    assert(kept > 20 && kept < 80, s"src1 should keep about half, got $kept")
    // hash-based: identical on re-evaluation
    val again = TextPipeline.stratifiedSample(
      docs, Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again === bySrc)
  }

  test("packSequences: budget boundaries chunk the running count; oversized docs sit alone") {
    val docs = Seq(
      (1L, "a b c d", "s"),     // 4 tokens, cum 4  → seq 1
      (2L, "e f g", "s"),       // 3 tokens, cum 7  → seq 1
      (3L, "h i j k l m", "s"), // 6 tokens, cum 13 → seq 2
      (4L, Seq.fill(30)("x").mkString(" "), "s") // clamped to 10 → cum 23 → seq 3
    ).toDF("doc_id", "text", "source")
    val out = TextPipeline.packSequences(docs, tokenBudget = 10)
      .select("seq_no", "doc_ids", "token_total")
      .as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
    assert(out.map(r => r._1 -> r._2).toSeq ===
      Seq(1L -> Seq(1L, 2L), 2L -> Seq(3L), 3L -> Seq(4L)))
    // token_total reports the TRUE count even for clamped oversized docs
    assert(out.find(_._1 == 3L).get._3 === 30L)
  }

  test("cleanCorpus reason precedence: a failing early gate hides later ones") {
    // doc 8 is an exact duplicate of 7 but ALSO too short → quality wins,
    // and 7 survives because dedup only runs over gate survivors
    val docs = Seq((7L, "tiny text"), (8L, "tiny text")).toDF("doc_id", "text")
    val out = TextPipeline.cleanCorpus(docs)
      .select("doc_id", "reason").as[(Long, Option[String])].collect().toMap
    assert(out(7L) === Some("quality"))
    assert(out(8L) === Some("quality"))
  }

  test("paragraphDedup keeps the corpus-wide first occurrence and reassembles in order") {
    val docs = Seq(
      (1L, "alpha\n\nshared\n\nomega"),
      (2L, "shared\n\nbeta"), // "shared" already seen in doc 1
      (3L, "shared") // every paragraph duplicated → empty text
    ).toDF("doc_id", "text")
    val got = TextPipeline.paragraphDedup(docs)
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "alpha\n\nshared\n\nomega")
    assert(got(2L) === "beta")
    assert(got(3L) === "")
  }

  test("sampleToTokenBudget computes min(1, budget/available) fractions relationally") {
    val docs = (1 to 100).map { i =>
      val src = if (i % 2 == 0) "a" else "b"
      (i.toLong, src, "tok " * 10 + "end") // 11 tokens each
    }.toDF("doc_id", "source", "text")
    // a: 550 tokens available, budget 10000 → fraction 1 (all 50 docs kept)
    // b: 550 available, budget 110 → fraction 0.2 (≈10 docs expected)
    // c: no budget row → dropped entirely
    val got = TextPipeline.sampleToTokenBudget(docs, Map("a" -> 10000L, "b" -> 110L))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(got("a") === 50L)
    assert(got.getOrElse("c", 0L) === 0L)
    val bKept = got.getOrElse("b", 0L)
    assert(bKept > 0 && bKept < 50, s"expected a strict subset of b, got $bKept")
    // determinism
    val again = TextPipeline.sampleToTokenBudget(docs, Map("a" -> 10000L, "b" -> 110L))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again === got)
  }
}
