package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Dsir, Similarity, TextOps}

/** Empirical scale-probe main: times the dedup/ANN family on sf0.1 and on a
  * 10×-derived corpus and prints the per-query scaling exponent
  * log10(t10/t1) — the "would this survive 100×?" argument as a measured
  * slope instead of plan-shape reasoning alone (results recorded in
  * BASELINE.md).
  *
  * The 10× corpus unions 10 deterministically-perturbed copies of the sf0.1
  * tables so it behaves like a genuinely larger corpus, not a
  * duplicate-heavy one:
  *   - documents: every token gets a per-copy suffix, so shingles (and
  *     hence MinHash signatures / LSH buckets) are distinct across copies —
  *     bucket COUNT grows ~10×, per-bucket occupancy stays put;
  *   - embeddings: dimensions are rotated by 7·copy positions, decorrelating
  *     the LSH signs / centroid assignments of copies.
  * IVF centroid sets follow the C ≈ √N sizing rule at each scale (the
  * documented build discipline); the PQ codebook stays fixed-size, as PQ
  * codebooks do not grow with the corpus.
  *
  * Usage: runMain graft.ScaleProbe [workDir]  (default target/scale10)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val workDir = args.headOption.getOrElse("target/scale10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val copies = 10
    val idOffset = 1000000000L

    // ---- build the derived 10x corpus (written once, read back so both
    // scales pay the same parquet-scan shape) -----------------------------
    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val docs10Path = s"$workDir/documents.parquet"
    val emb10Path = s"$workDir/embeddings.parquet"
    val docs10 = (0 until copies)
      .map { i =>
        docs1.select(
          (col("doc_id") + lit(i * idOffset)).as("doc_id"),
          array_join(
            transform(split(col("text"), " "), t => concat(t, lit("x"), lit(i))),
            " ").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      .reduce(_ unionByName _)
    docs10.repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(docs10Path)
    val dims = 64
    val emb10 = (0 until copies)
      .map { i =>
        val shift = (7 * i) % dims
        val rotated =
          if (shift == 0) col("embedding")
          else concat(
            slice(col("embedding"), shift + 1, dims - shift),
            slice(col("embedding"), 1, shift))
        emb1.select(
          (col("vec_id") + lit(i * idOffset)).as("vec_id"),
          rotated.as("embedding"),
          col("label"))
      }
      .reduce(_ unionByName _)
    emb10.repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(emb10Path)

    def parallel(df: DataFrame): DataFrame =
      df.repartition(spark.sparkContext.defaultParallelism)

    // ---- the probed family, parameterised by scale ----------------------
    // IVF sizing rule C ~= sqrt(N): N=2,000 -> modulus 44 (C~46);
    // N=20,000 -> modulus 141 (C~142).
    def queriesAt(docPath: String, embPath: String, ivfMod: Int, pqMod: Int)
        : Seq[(String, () => Long)] = {
      def docs = parallel(spark.read.parquet(docPath))
      def emb = parallel(spark.read.parquet(embPath))
      Seq(
        "lsh_pairs" -> (() => Dedup.candidatePairs(Dedup.signatures(docs)).count()),
        "near_dup" -> (() => Dedup.verifiedPairs(docs).count()),
        "dedup_components" -> (() =>
          Dedup.connectedComponents(
            Dedup.candidatePairs(Dedup.signatures(docs))
              .select(col("l_doc").as("l_id"), col("r_doc").as("r_id"))).count()),
        "ann_ivf" -> { () =>
          val cents = emb.filter(col("vec_id") % ivfMod === 0)
            .select(col("vec_id").as("centroid_id"), col("embedding"))
          Similarity.annTopK(
            Similarity.ivfAssign(emb, cents), col("vec_id") % idOffset < 30, k = 3).count()
        },
        "pq_adc" -> { () =>
          val cents = emb.filter(col("vec_id") % pqMod === 0)
            .select(col("vec_id").as("centroid_id"), col("embedding"))
          Similarity.pqAdcTopK(
            Similarity.pqEncode(emb, cents),
            emb.filter(col("vec_id") % idOffset < 20 && col("vec_id") < idOffset),
            cents, k = 5).count()
        },
        "semantic_dedup" -> { () =>
          val cents = emb.filter(col("vec_id") % ivfMod === 0)
            .select(col("vec_id").as("centroid_id"), col("embedding"))
          Similarity.semanticDedup(emb, cents, threshold = 0.2).count()
        },
        "bm25" -> (() =>
          TextOps.bm25Scores(docs, Seq("vector", "dup", "spark", "quantum")).count()),
        // the harness's DsirTarget source subset; the per-copy token suffix
        // grows the gram vocabulary ~10x while buckets stay capped at 4096
        "dsir_select" -> { () =>
          val target = docs.filter(col("source").isInCollection(Seq("src0", "src1", "src2", "src3")))
          Dsir.gumbelTopK(
            Dsir.importanceWeights(docs, Dsir.bucketLogRatios(docs, target)),
            k = 50).count()
        },
        "bigram_ppl" -> (() => TextOps.bigramNegLogProb(docs).count())
      )
    }

    def jstr(s: String): String = "\"" + s + "\""
    val runs = 2
    def time(fn: () => Long): (Double, Long) = {
      var rows = 0L
      val t = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        rows = fn()
        (System.nanoTime() - t0) / 1e9
      }.min
      (t, rows)
    }

    // PQ codebook fixed-size at both scales: modulus scales with N.
    val at1 = queriesAt(s"$sfDir/documents.parquet", s"$sfDir/embeddings.parquet", 44, 10)
    val at10 = queriesAt(docs10Path, emb10Path, 141, 100)
    val out = at1.zip(at10).map { case ((name, f1), (_, f10)) =>
      val (t1, r1) = time(f1)
      val (t10, r10) = time(f10)
      val exp = math.log(t10 / t1) / math.log(copies.toDouble)
      System.err.println(
        f"[probe] $name%-18s 1x=$t1%7.2fs ($r1%9d rows)  10x=$t10%7.2fs ($r10%9d rows)  exponent=$exp%5.2f")
      s"""${jstr(name)}:{"t1":$t1,"t10":$t10,"rows1":$r1,"rows10":$r10,"exponent":$exp}"""
    }
    println(s"""{"metric":"scale_probe","copies":$copies,"queries":{${out.mkString(",")}}}""")
    spark.stop()
  }
}
