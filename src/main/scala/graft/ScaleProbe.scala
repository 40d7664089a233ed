package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, IntegerType, StringType}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Colocalisation, Dedup, Dsir, LocusBreaker, OntologyClosure, Overlaps, Pics, Similarity, TextOps}
import graft.sources.UkbPpp

/** Empirical scale-probe main: times the dedup/ANN family (round 8) and the
  * genomic/relational family (round 9) on sf0.1-derived inputs and on a
  * 10×-derived corpus, printing the per-query scaling exponent
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
  *     the LSH signs / centroid assignments of copies;
  *   - credible sets: per-copy suffixes on BOTH studyLocusId and
  *     tagVariantId — the overlap self-join's (chromosome, tag) bucket
  *     count grows 10× while per-bucket occupancy (study density per
  *     variant, a property of the cohort design, not of corpus size) stays
  *     put. Chromosome count stays fixed at 8, as it does in reality.
  *   - summary stats: per-copy studyId suffix — corpus growth in genomics
  *     is MORE STUDIES over the same genome, so window-partition count
  *     grows 10× and per-partition row count stays put;
  *   - ontology: 10 disjoint copies of the same fixed-depth tree — a 10×
  *     bigger ontology forest is wider, not deeper (real ontology depth is
  *     bounded ~20), so BFS level count stays fixed and per-level work
  *     grows 10×;
  *   - harmonisation: per-copy position offset so the variant-annotation
  *     LUT grows 10× alongside the raw stats (an equi-join where both
  *     sides scale together, the realistic shape).
  * IVF centroid sets follow the C ≈ √N sizing rule at each scale (the
  * documented build discipline); the PQ codebook stays fixed-size, as PQ
  * codebooks do not grow with the corpus.
  *
  * Usage: runMain graft.ScaleProbe [workDir] [family]
  *   workDir default target/scale10; family in {all, text, genomic}.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val workDir = args.headOption.getOrElse("target/scale10")
    val family = args.drop(1).headOption.getOrElse("all")
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

    def parallel(df: DataFrame): DataFrame =
      df.repartition(spark.sparkContext.defaultParallelism)

    def write(df: DataFrame, path: String): Unit =
      df.repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(path)

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

    def report(pairs: Seq[((String, () => Long), (String, () => Long))]): Seq[String] =
      pairs.map { case ((name, f1), (_, f10)) =>
        val (t1, r1) = time(f1)
        val (t10, r10) = time(f10)
        val exp = math.log(t10 / t1) / math.log(copies.toDouble)
        System.err.println(
          f"[probe] $name%-18s 1x=$t1%7.2fs ($r1%9d rows)  10x=$t10%7.2fs ($r10%9d rows)  exponent=$exp%5.2f")
        s"""${jstr(name)}:{"t1":$t1,"t10":$t10,"rows1":$r1,"rows10":$r10,"exponent":$exp}"""
      }

    // =====================================================================
    // text / dedup / ANN family (round 8)
    // =====================================================================
    def textFamily(): Seq[String] = {
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
      write(docs10, docs10Path)
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
      write(emb10, emb10Path)

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

      // PQ codebook fixed-size at both scales: modulus scales with N.
      val at1 = queriesAt(s"$sfDir/documents.parquet", s"$sfDir/embeddings.parquet", 44, 10)
      val at10 = queriesAt(docs10Path, emb10Path, 141, 100)
      report(at1.zip(at10))
    }

    // =====================================================================
    // genomic / relational family (round 9)
    // =====================================================================
    def genomicFamily(): Seq[String] = {
      val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")

      // --- exploded credible sets (harness/ColocQueries.synthCredsets shape,
      // per-copy suffix on studyLocusId AND tagVariantId) -----------------
      def credsets(nCopies: Int): DataFrame = {
        val q = lit(1) + (col("l_orderkey") * 7 + col("l_partkey") * 31) % 97
        val perCopy = (0 until nCopies).map { c =>
          lineitem
            .filter(col("l_orderkey") % 4 === 0)
            .select(
              concat(lit("L"), col("l_orderkey").cast(StringType), lit("c"), lit(c))
                .as("studyLocusId"),
              when(col("l_orderkey") % 2 === 0, "gwas").otherwise("eqtl").as("studyType"),
              (col("l_partkey") % 8).cast(StringType).as("chromosome"),
              concat(lit("v"), col("l_partkey").cast(StringType), lit("c"), lit(c))
                .as("tagVariantId"),
              q.cast(IntegerType).as("q"))
            .distinct()
        }.reduce(_ unionByName _)
        perCopy
          .withColumn(
            "pp",
            col("q") / sum(col("q")).over(Window.partitionBy("studyLocusId")).cast("double"))
          .select(
            col("studyLocusId"), col("studyType"), col("chromosome"), col("tagVariantId"),
            lit(null).cast(StringType).as("studyId"), lit(null).cast(StringType).as("region"),
            (col("q") / 10.0).as("logBF"),
            col("pp").as("posteriorProbability"),
            (((col("q") % 21) - 10) / 10.0).as("beta"),
            (lit(1) + (col("q") % 89) / 10.0).cast(FloatType).as("pValueMantissa"),
            (-(lit(2) + col("q") % 30)).cast(IntegerType).as("pValueExponent"))
      }

      // --- synthetic GWAS sumstats (harness/GenomicQueries.synthSumstats
      // shape; corpus growth = MORE STUDIES via per-copy studyId suffix) --
      def sumstats(nCopies: Int): DataFrame = {
        val x = col("l_orderkey") * 8 + col("l_linenumber")
        val position = (x * lit(2654435761L)) % lit(1000000007L)
        (0 until nCopies).map { c =>
          lineitem.select(
            concat(lit("s"), (col("l_suppkey") % 10).cast(StringType), lit("c"), lit(c))
              .as("studyId"),
            concat(
              (lit(1) + col("l_partkey") % 4).cast(StringType), lit("_"),
              position.cast(StringType), lit("_A_T")).as("variantId"),
            (lit(1) + col("l_partkey") % 4).cast(StringType).as("chromosome"),
            position.cast(IntegerType).as("position"),
            ((position % 1000) / lit(1000.0) - lit(0.5)).as("beta"),
            (lit(1000) + position % 50).cast(IntegerType).as("sampleSize"),
            (lit(1.0) + (position % 700) / lit(100.0)).cast(FloatType).as("pValueMantissa"),
            (-(lit(4) + position % 13)).cast(IntegerType).as("pValueExponent"),
            (lit(0.01) + (position % 100) / lit(1000.0)).as("standardError")
          ).distinct()
        }.reduce(_ unionByName _)
      }

      // --- PICS loci (harness/MiscQueries.pics shape) ---------------------
      def picsLoci(nCopies: Int): DataFrame =
        (0 until nCopies).map { c =>
          orders.select(
            concat(lit("L"), col("o_orderkey").cast(StringType), lit("c"), lit(c))
              .as("studyLocusId"),
            (lit(5.0) + (col("o_orderkey") % 20)).as("neglogP"),
            array(
              struct(
                concat(lit("v"), (col("o_orderkey") % 97).cast(StringType)).as("tagVariantId"),
                ((col("o_orderkey") % 11) / 10.0).as("r2Overall")),
              struct(
                concat(lit("w"), (col("o_orderkey") % 89).cast(StringType)).as("tagVariantId"),
                ((col("o_orderkey") % 7) / 6.0).as("r2Overall"))).as("ldSet"))
        }.reduce(_ unionByName _)

      // --- ontology edges: disjoint copies of one fixed-depth tree --------
      // (harness/StudyQueries.biosamples hierarchy: is_a parent k/2, part_of
      // parent k/3 for k%5==0 — depth log2(nodes1), identical at both scales)
      val nodes1 = 50000L
      def edges(nCopies: Int): DataFrame = {
        val base = spark.range(2, nodes1 + 2).toDF("k")
        (0 until nCopies).map { c =>
          val off = lit(c * idOffset)
          val isA = base.select(
            concat(lit("N"), (col("k") + off).cast(StringType)).as("child"),
            concat(lit("N"), ((col("k") / 2).cast("long") + off).cast(StringType)).as("parent"))
          val partOf = base.filter(col("k") % 5 === 0).select(
            concat(lit("N"), (col("k") + off).cast(StringType)).as("child"),
            concat(lit("N"), ((col("k") / 3).cast("long") + off).cast(StringType)).as("parent"))
          isA.unionByName(partOf)
        }.reduce(_ unionByName _)
      }

      // --- harmoniser inputs (harness/SourceQueries.sumstatHarmonise shape;
      // per-copy position offset grows raw AND the variant LUT together) --
      def harmoniseInputs(nCopies: Int): (DataFrame, DataFrame) = {
        val letters = array(lit("A"), lit("C"), lit("G"), lit("T"))
        val frames = (0 until nCopies).map { c =>
          val base = lineitem.select(
            (col("l_orderkey") * 8 + col("l_linenumber")).as("k"),
            (col("l_suppkey") % 5).as("sid"))
          val k = col("k")
          val a0 = element_at(letters, (k % 4 + 1).cast(IntegerType))
          val a1 = element_at(letters, ((k / 4) % 4 + 1).cast(IntegerType))
          val rawChrom = (k % 23 + 1).cast(StringType)
          val pos = (k % 1000000 + lit(c * 2000000L)).cast(IntegerType)
          val raw = base.select(
            concat(lit("S"), col("sid").cast(StringType), lit("c"), lit(c)).as("studyId"),
            rawChrom.as("chromosome"),
            pos.cast("long").as("GENPOS"),
            a0.as("ALLELE0"),
            a1.as("ALLELE1"),
            ((k % 1000) / lit(1000.0)).as("A1FREQ"),
            (lit(0.7) + (k % 30) / lit(100.0)).as("INFO"),
            (((k % 21) - 10) / lit(10.0)).as("BETA"),
            (lit(0.01) + (k % 50) / lit(1000.0)).as("SE"),
            (lit(3.0) + (k % 40)).as("LOG10P"),
            (lit(1000) + k % 100).cast(IntegerType).as("N"))
          val normChrom = when(rawChrom === "23", "X").otherwise(rawChrom)
          val direct = k % 3 =!= 0
          val va = base.select(
            normChrom.as("vaChromosome"),
            concat_ws("_", normChrom, pos, a0, a1).as("summary_stats_id"),
            when(direct, concat_ws("_", normChrom, pos, a0, a1))
              .otherwise(concat_ws("_", normChrom, pos, a1, a0)).as("variantId"),
            when(direct, lit("direct")).otherwise(lit("flip")).as("direction")
          ).distinct()
          (raw, va)
        }
        (frames.map(_._1).reduce(_ unionByName _), frames.map(_._2).reduce(_ unionByName _))
      }

      // materialise every input to parquet so both scales pay the same
      // scan shape and the synthesis projection is NOT in the timed path
      val inputs = Seq[(String, Int => DataFrame)](
        "credsets" -> (credsets _),
        "gsumstats" -> (sumstats _),
        "picsloci" -> (picsLoci _),
        "ontoedges" -> (edges _),
        "hraw" -> (n => harmoniseInputs(n)._1),
        "hva" -> (n => harmoniseInputs(n)._2)
      )
      for ((name, gen) <- inputs; n <- Seq(1, copies))
        write(gen(n), s"$workDir/${name}$n.parquet")

      def queriesAt(n: Int): Seq[(String, () => Long)] = {
        def rd(name: String) = parallel(spark.read.parquet(s"$workDir/${name}$n.parquet"))
        Seq(
          "overlaps" -> (() => Overlaps.overlappingPeaks(rd("credsets")).count()),
          "coloc" -> { () =>
            val cred = rd("credsets")
            Colocalisation.coloc(
              Overlaps.alignOverlappingTags(cred, Overlaps.overlappingPeaks(cred))).count()
          },
          "pics" -> (() =>
            Pics.finemapStaged(rd("picsloci"), "ldSet", "neglogP", "locus").count()),
          "locus_breaker" -> (() =>
            LocusBreaker.locusBreaker(
              rd("gsumstats"),
              baselinePvalueCutoff = 1e-3,
              distanceCutoff = 50000,
              pvalueCutoff = 1e-6,
              flankingDistance = 10000).count()),
          "onto_closure" -> (() => OntologyClosure.ancestors(rd("ontoedges")).count()),
          "sumstat_harmonise" -> (() =>
            UkbPpp.harmoniseSummaryStats(rd("hraw"), rd("hva")).count())
        )
      }

      report(queriesAt(1).zip(queriesAt(copies)))
    }

    // =====================================================================
    // events / analytics family (round 10: asof, funnel, retention, bloom)
    // =====================================================================
    def eventsFamily(): Seq[String] = {
      import org.apache.spark.sql.types.{LongType, TimestampType}
      import graft.operators.{AsofJoin, EventAnalytics}

      val ev0 = spark.read.parquet(s"$sfDir/events.parquet")
      val sec = ev0.schema("ts").dataType match {
        case LongType => expr("ts div 1000")
        case TimestampType => unix_micros(col("ts"))
        case _ => unix_micros(col("ts").cast(TimestampType))
      }
      val base = ev0.select(
        col("event_id"), col("user_id"), col("event_type"), sec.as("t"), col("value"))

      // growth model = MORE USERS over the same observation window (traffic
      // growth): per-copy user offset keeps per-key event depth fixed, the
      // honest shape for per-user window/fold operators
      def evts(n: Int): DataFrame = (0 until n).map { c =>
        base.select(
          (col("event_id") + lit(c * idOffset)).as("event_id"),
          (col("user_id") + lit(c * idOffset)).as("user_id"),
          col("event_type"), col("t"), col("value"))
      }.reduce(_ unionByName _)

      // fact-side growth for the bloom probe: key-offset copies of lineitem
      // against a FIXED small key set (prune selectivity tightens with
      // scale, as it does in production)
      def facts(n: Int): DataFrame = {
        val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_orderkey", "l_partkey", "l_linenumber")
        (0 until n).map { c =>
          l.select(
            (col("l_orderkey") + lit(c * idOffset)).as("l_orderkey"),
            col("l_partkey"), col("l_linenumber"))
        }.reduce(_ unionByName _)
      }
      val bloomKeys = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("l_orderkey"))

      val inputs = Seq[(String, Int => DataFrame)](
        "evts" -> (evts _),
        "facts" -> (facts _)
      )
      for ((name, gen) <- inputs; n <- Seq(1, copies))
        write(gen(n), s"$workDir/${name}$n.parquet")

      def queriesAt(n: Int): Seq[(String, () => Long)] = {
        def rd(name: String) = parallel(spark.read.parquet(s"$workDir/${name}$n.parquet"))
        def sides() = {
          val e = rd("evts")
          (e.filter(col("event_type") === "click")
             .select("event_id", "user_id", "t", "value"),
           e.filter(col("event_type") === "view")
             .select(col("user_id"), col("t"), col("value").as("view_value")))
        }
        Seq(
          "asof" -> { () =>
            val (clicks, views) = sides()
            AsofJoin.asof(clicks, views, Seq("user_id"), "t", Seq("view_value"),
              tolerance = Some(3600L * 1000000L)).count()
          },
          "asof_bucketed" -> { () =>
            val (clicks, views) = sides()
            AsofJoin.asofBucketed(clicks, views, Seq("user_id"), "t", Seq("view_value"),
              bucketWidth = 21600L * 1000000L, direction = "forward").count()
          },
          "funnel" -> (() =>
            EventAnalytics.funnelStages(rd("evts"), "user_id", "event_type", "t",
              Seq("view", "click", "purchase")).count()),
          "retention" -> (() =>
            EventAnalytics.retentionMatrix(rd("evts"), "user_id", "t",
              periodLength = 604800000000L).count()),
          "bloom_prune" -> (() =>
            graft.functions.BloomOps.bloomSemiJoin(
              rd("facts"), bloomKeys, "l_orderkey", expectedItems = 4096).count())
        )
      }

      report(queriesAt(1).zip(queriesAt(copies)))
    }

    // =====================================================================
    // curation / maintenance family (round 10: pagerank, tfidf, scd2,
    // incremental agg, group sampling)
    // =====================================================================
    def curationFamily(): Seq[String] = {
      import graft.operators.{GraphOps, IncrementalAgg, Sampling, Scd2, TextOps}

      val ord = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      // growth = more orders from more customers; key offsets keep the
      // change-fraction and per-customer depth fixed
      def ords(n: Int): DataFrame = (0 until n).map { c =>
        ord.select(
          (col("o_orderkey") + lit(c * idOffset)).as("o_orderkey"),
          (col("o_custkey") + lit(c * idOffset)).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
      }.reduce(_ unionByName _)

      // growth = more pages: each copy is a node-disjoint subgraph (the web
      // grows in pages, not in per-page degree)
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
      def edges(n: Int): DataFrame = (0 until n).map { c =>
        li.select(
          ((col("l_orderkey") % 20000) + lit(c * 40000L)).as("src"),
          ((col("l_partkey") % 20000) + lit(c * 40000L) + lit(20000L)).as("dst"))
      }.reduce(_ unionByName _)

      // growth = more documents over a SHARED vocabulary: per-term document
      // frequency scales 10x, stressing the term-keyed df window
      val doc = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      def docs(n: Int): DataFrame = (0 until n).map { c =>
        doc.select((col("doc_id") + lit(c * idOffset)).as("doc_id"), col("text"))
      }.reduce(_ unionByName _)

      // copy-UNIQUE vocabulary for the set-similarity join: tokens carry the
      // copy id, so the duplicate rate stays fixed as the corpus grows (10
      // verbatim copies would instead inflate the true-pair count ×100)
      def docsUnique(n: Int): DataFrame = (0 until n).map { c =>
        doc.select(
          (col("doc_id") + lit(c * idOffset)).as("doc_id"),
          concat_ws(" ",
            transform(split(trim(col("text")), "\\s+"),
              t => concat(lit(s"c${c}_"), t))).as("text"))
      }.reduce(_ unionByName _)

      val inputs = Seq[(String, Int => DataFrame)](
        "ords" -> (ords _), "edges" -> (edges _), "docs" -> (docs _),
        "docsu" -> (docsUnique _))
      for ((name, gen) <- inputs; n <- Seq(1, copies))
        write(gen(n), s"$workDir/${name}$n.parquet")

      def queriesAt(n: Int): Seq[(String, () => Long)] = {
        def rd(name: String) = parallel(spark.read.parquet(s"$workDir/${name}$n.parquet"))
        def snapPair() = {
          val s1 = rd("ords")
          val k = col("o_orderkey")
          val s2 = s1
            .filter(k % 97 =!= 0)
            .withColumn("o_totalprice",
              when(k % 13 === 0, col("o_totalprice") + 1000.0).otherwise(col("o_totalprice")))
            .unionByName(s1.filter(k % 101 === 0)
              .withColumn("o_orderkey", k + lit(100L * idOffset)))
          (s1, s2)
        }
        Seq(
          "pagerank" -> (() => GraphOps.pageRank(rd("edges"), iterations = 3).count()),
          "tfidf_topk" -> (() => TextOps.topTfidfTerms(rd("docs"), 3).count()),
          "scd2_apply" -> { () =>
            val (s1, s2) = snapPair()
            Scd2.applySnapshot(
              Scd2.init(s1, lit(100L)), s2, Seq("o_orderkey"), lit(200L)).count()
          },
          "incr_agg" -> { () =>
            val (s1, _) = snapPair()
            val k = col("o_orderkey")
            val removed = s1.filter(k % 97 === 0 || k % 13 === 0)
            val added = s1.filter(k % 13 === 0 && k % 97 =!= 0)
              .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
              .unionByName(s1.filter(k % 101 === 0)
                .withColumn("o_orderkey", k + lit(100L * idOffset)))
            def wg(df: DataFrame) = df.withColumn("grp", col("o_custkey") % 100000)
            IncrementalAgg.merge(
              IncrementalAgg.initState(wg(s1), Seq("grp"), "o_totalprice"),
              IncrementalAgg.deltaFromRowSets(wg(removed), wg(added), Seq("grp"), "o_totalprice"),
              Seq("grp")).count()
          },
          "group_sample" -> (() =>
            Sampling.groupSample(rd("ords"), Seq("o_custkey"), col("o_orderkey"), 3).count()),
          "setsim_join" -> (() =>
            Dedup.setSimilarityJoin(rd("docsu"), theta = 0.8, shingle = 3).count()),
          // copy-unique vocab keeps each query inside its own copy's corpus
          // (shared vocab would grow scored pairs x100 at x10 by construction)
          "sparse_topk" -> (() =>
            TextOps.sparseCosineTopK(rd("docsu"), col("doc_id") % 50 === 0, k = 5).count())
        )
      }

      report(queriesAt(1).zip(queriesAt(copies)))
    }

    val out = family match {
      case "text" => textFamily()
      case "genomic" => genomicFamily()
      case "events" => eventsFamily()
      case "curation" => curationFamily()
      case _ => textFamily() ++ genomicFamily() ++ eventsFamily() ++ curationFamily()
    }
    println(s"""{"metric":"scale_probe","copies":$copies,"family":${jstr(family)},"queries":{${out.mkString(",")}}}""")
    spark.stop()
  }
}
