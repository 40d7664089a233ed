package graft.operators

import graft.SparkSpec

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry date")
  ).toDF("doc_id", "text")

  test("tfidf matches the hand-computed smoothed formula") {
    val got = TextOps.tfidf(docs)
      .as[(Long, String, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    def idf(df: Long) = math.log(4.0 / (df + 1.0)) + 1.0
    assert(got((1L, "apple")) == ((2L, 1L, 2 * idf(1))))
    assert(got((2L, "banana")) == ((1L, 2L, 1 * idf(2))))
    assert(got((3L, "cherry")) == ((2L, 2L, 2 * idf(2))))
    assert(got.size == 6, "one row per (doc, distinct term)")
  }

  test("topTfidfTerms keeps k terms, ties broken by term; plan has no self-join") {
    val top1 = TextOps.topTfidfTerms(docs, 1)
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    // doc 2: banana and cherry tie on (tf=1, df=2) → term asc → banana
    assert(top1 == Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
    val doc2 = TextOps.topTfidfTerms(docs, 2).filter($"doc_id" === 2L)
      .orderBy($"term").as[(Long, String, Long, Long, Double)].collect().map(_._2)
    assert(doc2.toSeq == Seq("banana", "cherry"))
    val plan = TextOps.tfidf(docs).queryExecution.executedPlan.toString
    // df must be the map-side-combinable groupBy joined on term, never a
    // Window.partitionBy(term): a stopword term would buffer ~the whole
    // corpus in one task's window partition at scale.
    assert(!plan.contains("Window"), s"df must come from groupBy+join, not a window:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"df count must be partial-aggregated map-side:\n$plan")
  }

  test("sparseCosineTopK ranks the lexically-closest corpus doc first via the term join") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "red apple pie with red apples"),    // the query doc
      (1L, "red apple tart and red apples"),    // near doc
      (2L, "quantum flux capacitor manual"),    // unrelated
      (3L, "apple pie recipe")                  // related
    ).toDF("doc_id", "text")
    val got = TextOps.sparseCosineTopK(docs, col("doc_id") === 0L, k = 3)
      .as[(Long, Long, Double)].collect().sortBy(-_._3)
    assert(got.forall(_._1 == 0L))
    assert(got.map(_._2).head == 1L, s"nearest must be the near-duplicate: $got")
    assert(!got.map(_._2).contains(0L), "no self-match")
    assert(got.forall(r => r._3 > 0.0 && r._3 <= 1.0 + 1e-9))
    // doc 2 shares no term with the query -> never scored
    assert(!got.map(_._2).contains(2L), s"disjoint doc must be unscored: $got")
  }
}
