package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(sf("documents"))

  // Scala-side replica of the hashed-gram kernel for hand-computed pins.
  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def grams(text: String, numBuckets: Int): Seq[Int] = {
    val toks = text.trim.split("\\s+", -1).toSeq
    val bigrams = if (toks.size < 2) Seq.empty else toks.sliding(2).map(_.mkString(" ")).toSeq
    (toks ++ bigrams).map(g => Integer.parseInt(md5Hex(g).take(4), 16) % numBuckets)
  }

  test("hashedGrams matches the Scala replica (unigrams + bigrams, md5 buckets)") {
    import spark.implicits._
    val texts = Seq("the quick brown fox", "one", "  padded  text  ")
    val out = texts.toDF("text")
      .select(col("text"), Dsir.hashedGrams(TextOps.tokenize(col("text")), 64).as("b"))
      .as[(String, Seq[Int])]
      .collect()
      .toMap
    texts.foreach(t => assert(out(t) === grams(t.trim, 64), s"text '$t'"))
  }

  test("importanceWeights equals the hand-computed log-likelihood ratio sum") {
    import spark.implicits._
    val raw = Seq((0L, "aa bb"), (1L, "aa cc"), (2L, "bb bb")).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") === 0L)
    val b = 16
    val alpha = 0.5
    // replicate: bucket counts over raw and target, smoothed log ratios
    val rawGrams = Seq("aa bb", "aa cc", "bb bb").flatMap(grams(_, b))
    val tgtGrams = grams("aa bb", b)
    val cr = rawGrams.groupBy(identity).map { case (k, v) => k -> v.size.toDouble }
    val ct = tgtGrams.groupBy(identity).map { case (k, v) => k -> v.size.toDouble }
    def lr(bk: Int): Double =
      math.log((ct.getOrElse(bk, 0.0) + alpha) / (tgtGrams.size + alpha * b)) -
        math.log((cr(bk) + alpha) / (rawGrams.size + alpha * b))
    val expected = Map(
      0L -> grams("aa bb", b).map(lr).sum,
      1L -> grams("aa cc", b).map(lr).sum,
      2L -> grams("bb bb", b).map(lr).sum
    )
    val got = Dsir
      .importanceWeights(raw, Dsir.bucketLogRatios(raw, target, numBuckets = b, alpha = alpha),
        numBuckets = b)
      .as[(Long, Double)]
      .collect()
      .toMap
    expected.foreach { case (id, w) => assert(math.abs(got(id) - w) < 1e-9, s"doc $id") }
    // the target document must out-weigh the others under its own model
    assert(got(0L) > got(1L) && got(0L) > got(2L))
  }

  test("target == raw makes every weight exactly the zero log-ratio") {
    import spark.implicits._
    // ct == cr and tt == tr bucket-by-bucket → every log ratio is 0
    val w = Dsir
      .importanceWeights(docs, Dsir.bucketLogRatios(docs, docs))
      .as[(Long, Double)]
      .collect()
    assert(w.nonEmpty)
    w.foreach { case (id, v) => assert(math.abs(v) < 1e-9, s"doc $id weight $v") }
  }

  test("target-domain documents rank above the corpus median weight on average") {
    val target = docs.filter(col("source").isin("src0", "src1"))
    val weighted = Dsir.importanceWeights(docs, Dsir.bucketLogRatios(docs, target))
      .join(docs.select("doc_id", "source"), "doc_id")
    val med = weighted.stat.approxQuantile("weight", Array(0.5), 0.0).head
    val tgtMean = weighted
      .filter(col("source").isin("src0", "src1"))
      .agg(avg("weight"))
      .head()
      .getDouble(0)
    assert(tgtMean > med, f"target mean $tgtMean%.4f should exceed corpus median $med%.4f")
  }

  test("gumbelTopK is deterministic, k-bounded, and monotone in the weight") {
    import spark.implicits._
    val weights = (0L until 200L).map(i => (i, (i % 7).toDouble)).toDF("doc_id", "weight")
    val a = Dsir.gumbelTopK(weights, 20).as[(Long, Double)].collect()
    val b = Dsir.gumbelTopK(weights, 20).as[(Long, Double)].collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 20)
    // raising one doc's weight far above the rest always selects it
    val boosted = weights.withColumn(
      "weight", when(col("doc_id") === 137L, lit(1e6)).otherwise(col("weight")))
    assert(Dsir.gumbelTopK(boosted, 5).as[(Long, Double)].collect().map(_._1).contains(137L))
  }

  test("plan: ratio join broadcasts; selection is TakeOrdered, not a global sort") {
    val ratios = Dsir.bucketLogRatios(docs, docs.filter(col("source") === "src0"))
    val weights = Dsir.importanceWeights(docs, ratios)
    val wPlan = weights.queryExecution.executedPlan.toString
    assert(wPlan.contains("BroadcastHashJoin"), "bucket-ratio join must broadcast")
    val sPlan = Dsir.gumbelTopK(weights, 10).queryExecution.executedPlan.toString
    assert(sPlan.contains("TakeOrderedAndProject"), "top-k must avoid a global sort")
  }
}
