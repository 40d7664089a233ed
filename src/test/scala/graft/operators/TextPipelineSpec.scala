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

  test("cleanCorpus reason precedence: a failing early gate hides later ones") {
    // doc 8 is an exact duplicate of 7 but ALSO too short → quality wins,
    // and 7 survives because dedup only runs over gate survivors
    val docs = Seq((7L, "tiny text"), (8L, "tiny text")).toDF("doc_id", "text")
    val out = TextPipeline.cleanCorpus(docs)
      .select("doc_id", "reason").as[(Long, Option[String])].collect().toMap
    assert(out(7L) === Some("quality"))
    assert(out(8L) === Some("quality"))
  }
}
