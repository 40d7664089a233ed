package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  // The q_bpe_tokens table (harness/TextQueries.bpeMergesTxt) — kept in
  // sync by the end-to-end oracle; here it pins the kernel directly.
  private val mergesTxt =
    """#version: 0.2 (graft hand-authored)
      |h e
      |l l
      |o w
      |e r
      |he ll
      |hell o
      |ow er
      |l o
      |lo w
      |n e
      |ne w
      |w o
      |wo r
      |wor l
      |worl d
      |Ġ world
      |Ġ hello""".stripMargin

  private lazy val ranks = Bpe.loadMergesFromString(mergesTxt)
  private lazy val enc = new Bpe.Encoder(ranks)

  test("loadMerges skips the #version header and ranks by line order") {
    assert(ranks.size === 17)
    assert(ranks.rank("h", "e") === 0)
    assert(ranks.rank("worl", "d") === 14)
    assert(ranks.rank("x", "y") === Int.MaxValue)
  }

  test("byte encoder maps space to Ġ (U+0120) and printables to themselves") {
    assert(Bpe.byteEncoder(' '.toInt) === 'Ġ')
    assert(Bpe.byteEncoder('a'.toInt) === 'a')
    assert(Bpe.byteEncoder('!'.toInt) === '!')
    assert(Bpe.byteEncoder(0) === 'Ā') // byte 0 is the first shifted value
  }

  test("hand-computed merge sequences (the q_bpe_tokens contract)") {
    // hello: he → ll → hell → hello
    assert(enc.encode("hello").toSeq === Seq("hello"))
    // " world": wo → wor → worl → world → Ġworld
    assert(enc.encode(" world").toSeq === Seq("Ġworld"))
    // " lower": ow (rank 2) fires before lo (rank 7), stranding the l
    assert(enc.encode(" lower").toSeq === Seq("Ġ", "l", "ower"))
    // " newer": er (rank 3) fires before ne (rank 9)
    assert(enc.encode(" newer").toSeq === Seq("Ġ", "new", "er"))
    assert(enc.encode(" hello").toSeq === Seq("Ġhello"))
    assert(enc.tokenCount("hello world lower newer") === 1 + 1 + 3 + 3)
  }

  test("pre-tokenizer splits contractions, digit runs and punctuation like GPT-2") {
    // "don't stop 12 go!" → don | 't | Ġstop | Ġ12 | Ġgo | !
    val m = Bpe.pretokenPattern.matcher("don't stop 12 go!")
    val pre = Iterator.continually(m).takeWhile(_.find()).map(_.group()).toSeq
    assert(pre === Seq("don", "'t", " stop", " 12", " go", "!"))
  }

  test("merges apply to ALL occurrences of the chosen pair in one pass") {
    // "hehe" → [h,e,h,e] → (h,e) rank 0 merges both at once → [he,he]
    val out = Bpe.applyMerges(Array("h", "e", "h", "e"), ranks)
    assert(out.toSeq === Seq("he", "he"))
  }

  test("train learns the most frequent pair first (classic BPE)") {
    // pre-tokens: "ab", " ab"×2, " abc"×2 → (a,b) freq 5 merges first,
    // then (Ġ,ab) freq 4 beats (ab,c) freq 2
    val learned = Bpe.train(Iterator("ab ab ab abc abc"), numMerges = 2)
    assert(learned.pairs.toSeq === Seq(("a", "b"), ("Ġ", "ab")))
    val e2 = new Bpe.Encoder(learned)
    assert(e2.encode("abc").toSeq === Seq("ab", "c"))
    assert(e2.encode(" ab").toSeq === Seq("Ġab"))
  }

  test("column surface: codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("hello world", " lower newer", "don't", "").toDF("text")
    def run(codegen: String): Seq[(Int, String)] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      // fallback=false makes a Janino compile failure THROW instead of
      // silently running interpreted — the codegen leg really is codegen
      spark.conf.set("spark.sql.codegen.fallback", "false")
      try df.select(
        Bpe.tokenCount(col("text"), ranks).as("n"),
        concat_ws("|", Bpe.tokens(col("text"), ranks)).as("t"))
        .as[(Int, String)].collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.fallback", "true")
      }
    }
    val on = run("true")
    val off = run("false")
    assert(on === off)
    assert(on.head === ((2, "hello|Ġworld")))
    assert(on.last === ((0, "")))
  }

  test("BPE expressions stay inside the whole-stage-codegen span (no ScalaUDF)") {
    // a real scan: a LocalRelation projection is constant-folded into a
    // LocalTableScan before any codegen question arises
    val df = spark.read.parquet(sf("documents"))
      .select(Bpe.tokenCount(col("text"), ranks).as("n"))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, df.queryExecution.executedPlan.toString)
    val hasUdf = df.queryExecution.analyzed.expressions.exists(_.exists {
      case _: org.apache.spark.sql.catalyst.expressions.ScalaUDF => true
      case _ => false
    })
    assert(!hasUdf)
  }

  test("packSequences accepts the BPE counter (pluggable token counting)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world", "web"),
      (2L, "hello world hello world", "web"),
      (3L, " lower newer", "web")
    ).toDF("doc_id", "text", "source")
    val packed = graft.operators.TextPipeline
      .packSequences(docs, tokenBudget = 4,
        tokenCounter = t => Bpe.tokenCount(t, ranks))
      .orderBy("seq_no")
      .select("seq_no", "token_total")
      .as[(Long, Long)].collect()
    // BPE counts: doc1 "hello world" = 2; doc2 = hello|Ġworld|Ġhello|Ġworld
    // = 4 (fills a sequence); doc3 " lower newer" = Ġ,l,ower,Ġ,new,er = 6 —
    // over budget, clamped for packing, occupies its own sequence with the
    // true total reported. Whitespace counting would give 2/4/2 and pack
    // doc3 WITH doc1 — the counter demonstrably drives the packing.
    assert(packed.toSeq === Seq((1L, 2L), (2L, 4L), (3L, 6L)))
  }

  test("deterministic vocab: byte ids for base symbols, 256+rank for merged") {
    import spark.implicits._
    val v = Bpe.vocab(ranks)
    assert(v.get("Ġ") === 32)   // space byte
    assert(v.get("l") === 'l'.toInt)
    assert(v.get("hello") === 256 + 5) // created by merge rank 5 (hell o)
    assert(v.get("Ġworld") === 256 + 15)
    val ids = Seq("hello lower").toDF("text")
      .select(concat_ws("|", Bpe.tokenIds(col("text"), ranks)).as("ids"))
      .as[String].head()
    assert(ids === "261|32|108|262")
  }

  test("tokenCount handles nulls (nullIntolerant) and UTF-8 multibyte input") {
    import spark.implicits._
    val got = Seq(Some("héllo"), None).toDF("text")
      .select(Bpe.tokenCount(col("text"), ranks).as("n"))
      .as[Option[Int]].collect().toSeq
    // é is 2 UTF-8 bytes → 2 symbols; no merges bridge them → h,é1,é2,l+l,o
    assert(got === Seq(Some(5), None))
  }
}
