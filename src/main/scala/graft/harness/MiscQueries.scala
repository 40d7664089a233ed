package graft.harness

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.DfOps
import graft.operators.{Dedup, FineMapper, Multimodal, Pics, StudyDeconvolution}

/** Oracle-checked queries for PICS fine-mapping, min-max/neighbourhood
  * normalisation, and study deconvolution.
  */
object MiscQueries {
  import Tables._

  /** PICS posteriors over synthesized LD sets. No DuckDB oracle (requires the
    * normal survival function); golden-value doctests cover the kernel in
    * PicsSpec.
    */
  def pics(s: SparkSession, d: String): DataFrame = {
    // parallel read: the PICS per-tag kernels (chi2/normSf) otherwise run
    // on the fixture's single-row-group scan task (Tables.parallel scaladoc)
    val loci = Tables.parallel(s, orders(s, d)).select(
      concat(lit("L"), col("o_orderkey").cast(StringType)).as("studyLocusId"),
      (lit(5.0) + (col("o_orderkey") % 20)).as("neglogP"),
      array(
        struct(
          concat(lit("v"), (col("o_orderkey") % 97).cast(StringType)).as("tagVariantId"),
          ((col("o_orderkey") % 11) / 10.0).as("r2Overall")
        ),
        struct(
          concat(lit("w"), (col("o_orderkey") % 89).cast(StringType)).as("tagVariantId"),
          ((col("o_orderkey") % 7) / 6.0).as("r2Overall")
        )
      ).as("ldSet")
    )
    Pics
      .finemapStaged(loci, "ldSet", "neglogP", "locus")
      .select(col("studyLocusId"), explode(col("locus")).as("tag"))
      .select(
        col("studyLocusId"),
        col("tag.variantId").as("variantId"),
        round(col("tag.posteriorProbability"), 6).as("pp"),
        round(col("tag.standardError"), 6).as("se")
      )
  }

  /** Window min-max scaling + neighbourhood max (L2G feature normalisation). */
  def minmax(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_id"),
      round(DfOps.minMaxNormalize(col("value"), Seq(col("event_type"))), 6).as("value_norm"),
      round(
        col("value") / DfOps.neighbourhoodMax(col("value"), Seq(col("event_type"))), 6
      ).as("value_vs_max")
    )

  /** Study deconvolution: merge duplicated study rows across sources. */
  def deconvolute(s: SparkSession, d: String): DataFrame = {
    val studies = lineitem(s, d).select(
      concat(lit("d"), (col("l_orderkey") % 500).cast(StringType)).as("studyId"),
      array(concat(lit("t"), (col("l_partkey") % 20).cast(StringType))).as("traits"),
      col("l_quantity").cast(IntegerType).as("nSamples")
    )
    StudyDeconvolution
      .deconvolute(studies, arrayCols = Seq("traits"), scalarCols = Seq("nSamples"))
      .select(col("studyId"), concat_ws(",", col("traits")).as("traits_str"), col("nSamples"))
  }

  /** Multimodal plumbing: binary payloads decoded (stub) per partition,
    * frames sampled by byte-chunk. Dimensions/frame counts are
    * length-deterministic and oracle-checked; the embedding path is covered
    * by MultimodalSpec.
    */
  def multimodal(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.fromDocuments(documents(s, d))
    val decoded = Multimodal.decode(media)
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 2)
      .groupBy(col("media_id")).agg(count(lit(1)).as("n_frames"))
    decoded
      .select(col("media_id"), col("width"), col("height"), col("channels"), col("n_bytes"))
      .join(frames, Seq("media_id"), "left")
  }

  /** Distributed SuSiE-inf fine-mapping: loci fan out via flatMapGroups,
    * each group solves its own eigen problem. 40 loci x 60 variants with an
    * AR(1) LD structure (r = 0.9^|i-j|) and z decaying away from one causal
    * variant per locus — z and r are pure functions of (locusIdx, varIdx),
    * so the generator is idempotent under the sparse/duplicated orderkeys of
    * any scale factor. The oracle is the pinned 259-row golden (see
    * resourceSql below); exact-PIP golden parity lives in FineMapperSpec and
    * SusieInfSpec.
    */
  def finemap(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(
        (col("o_orderkey") % 40).cast(IntegerType).as("locusIdx"),
        (floor(col("o_orderkey") / 40) % 60).cast(IntegerType).as("varIdx")
      )
      .distinct()
    // two causal variants per locus (the second ~LD-independent at distance
    // 30): z ~ sum of r(causal_k, j) * z_k + small deterministic noise
    val causal1 = (col("locusIdx") * 7) % 60
    val causal2 = (col("locusIdx") * 7 + 30) % 60
    val sumstats = base.select(
      col("locusIdx"),
      col("varIdx"),
      concat(lit("FL"), col("locusIdx").cast(StringType)).as("studyLocusId"),
      concat(lit("v"), lpad(col("varIdx").cast(StringType), 3, "0")).as("variantId"),
      (lit(7.0) * pow(lit(0.9), abs(col("varIdx") - causal1)) +
        lit(5.5) * pow(lit(0.9), abs(col("varIdx") - causal2)) +
        lit(0.3) * sin(col("varIdx").cast("double"))).as("z")
    )
    val ld = sumstats.alias("a")
      .join(
        sumstats.alias("b"),
        col("a.locusIdx") === col("b.locusIdx") && col("a.varIdx") < col("b.varIdx")
      )
      .select(
        col("a.studyLocusId").as("studyLocusId"),
        col("a.variantId").as("vi"),
        col("b.variantId").as("vj"),
        pow(lit(0.9), col("b.varIdx") - col("a.varIdx")).as("r")
      )
    FineMapper.finemapLoci(
      s,
      sumstats.select(col("studyLocusId"), col("variantId"), col("z")),
      ld,
      n = 10000
    )
      .select(col("studyLocusId"), col("variantId"), col("credibleSetIndex"),
        round(col("pip"), 6).as("pip"))
  }

  /** Distributed CARMA shotgun search ([[graft.operators.Carma.carmaLoci]]):
    * 12 loci × 20 variants, AR(1) LD (r = 0.85^|i−j|), z decaying from one
    * causal variant per locus plus one deliberately LD-discordant variant
    * (a negative z amid high-LD positive neighbours — the shape the
    * Bayes-factor outlier test exists for). z and r are pure functions of
    * (locusIdx, varIdx), so the generator is idempotent under the sparse /
    * duplicated orderkeys of any scale factor; the seeded search makes the
    * output a pure function of the inputs. Oracle: pinned SF-dispatched
    * golden (tools/MakeGoldens); kernel-level reference parity lives in
    * CarmaSpec (PIP correlation + recovered outliers, the reference's own
    * test criterion).
    */
  def carmaQ(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(
        (col("o_orderkey") % 12).cast(IntegerType).as("locusIdx"),
        (floor(col("o_orderkey") / 12) % 20).cast(IntegerType).as("varIdx")
      )
      .distinct()
    val causal = (col("locusIdx") * 5) % 20
    val discord = (col("locusIdx") * 7 + 11) % 20
    val sumstats = base.select(
      col("locusIdx"),
      col("varIdx"),
      concat(lit("CL"), col("locusIdx").cast(StringType)).as("studyLocusId"),
      concat(lit("v"), lpad(col("varIdx").cast(StringType), 2, "0")).as("variantId"),
      when(col("varIdx") === discord, lit(-2.5)).otherwise(
        lit(6.5) * pow(lit(0.85), abs(col("varIdx") - causal)) +
          lit(0.25) * sin(col("varIdx") * 1.3 + col("locusIdx"))).as("z")
    )
    val ld = sumstats.alias("a")
      .join(
        sumstats.alias("b"),
        col("a.locusIdx") === col("b.locusIdx") && col("a.varIdx") < col("b.varIdx")
      )
      .select(
        col("a.studyLocusId").as("studyLocusId"),
        col("a.variantId").as("vi"),
        col("b.variantId").as("vj"),
        pow(lit(0.85), col("b.varIdx") - col("a.varIdx")).as("r")
      )
    graft.operators.Carma.carmaLoci(
      s, sumstats.select(col("studyLocusId"), col("variantId"), col("z")), ld)
      .select(col("studyLocusId"), col("variantId"),
        round(col("pip"), 6).as("pip"), col("isOutlier"))
  }

  /** Distributed RAISS imputation ([[graft.operators.Raiss.imputeLoci]]):
    * 30 loci × 40 variants on an AR(1) LD grid (r = 0.9^|i−j|), every
    * fourth variant withheld as the unknown set to impute from its typed
    * neighbours. Same pure-function-of-keys generator discipline as
    * q_carma/q_finemap; oracle is the pinned SF-dispatched golden, with
    * scipy-pinned kernel parity in RaissSpec.
    */
  def raissQ(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(
        (col("o_orderkey") % 30).cast(IntegerType).as("locusIdx"),
        (floor(col("o_orderkey") / 30) % 40).cast(IntegerType).as("varIdx")
      )
      .distinct()
    val causal = (col("locusIdx") * 3) % 40
    val all = base.select(
      col("locusIdx"),
      col("varIdx"),
      concat(lit("RL"), col("locusIdx").cast(StringType)).as("studyLocusId"),
      concat(lit("v"), lpad(col("varIdx").cast(StringType), 2, "0")).as("variantId"),
      (lit(5.8) * pow(lit(0.9), abs(col("varIdx") - causal)) +
        lit(0.2) * sin(col("varIdx") * 0.7 + col("locusIdx"))).as("z"),
      (col("varIdx") % 4 === 3).as("isUnknown")
    )
    val ld = all.alias("a")
      .join(
        all.alias("b"),
        col("a.locusIdx") === col("b.locusIdx") && col("a.varIdx") < col("b.varIdx")
      )
      .select(
        col("a.studyLocusId").as("studyLocusId"),
        col("a.variantId").as("vi"),
        col("b.variantId").as("vj"),
        pow(lit(0.9), col("b.varIdx") - col("a.varIdx")).as("r")
      )
    graft.operators.Raiss.imputeLoci(
      s,
      all.filter(!col("isUnknown"))
        .select(col("studyLocusId"), col("variantId"), col("z")),
      all.filter(col("isUnknown")).select(col("studyLocusId"), col("variantId")),
      ld)
      .select(
        col("studyLocusId"), col("variantId"),
        round(col("mu"), 6).as("mu"),
        round(col("variance"), 6).as("variance"),
        round(col("ldScore"), 6).as("ldScore"),
        round(col("imputationR2"), 6).as("imputationR2"))
  }

  /** Click and view event streams for the as-of join pair: integral event
    * time in epoch micros (ts is TIMESTAMP_NTZ since the 2026-08-13
    * testdata regeneration — cast through TimestampType, session tz UTC;
    * unix_micros keeps full resolution so the operator's units are the
    * same at any SF).
    */
  private def eventsMicros(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val ev = events(s, d)
    val sec = ev.schema("ts").dataType match {
      case LongType => expr("ts div 1000") // legacy nanos-as-long → micros
      case TimestampType => unix_micros(col("ts"))
      case _ => unix_micros(col("ts").cast(TimestampType))
    }
    ev.select(col("event_id"), col("user_id"), col("event_type"),
      sec.as("t"), col("value"))
  }

  private def asofSides(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val base = eventsMicros(s, d)
    val clicks = base.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("t"), col("value"))
    val views = base.filter(col("event_type") === "view")
      .select(col("user_id"), col("t"), col("value").as("view_value"))
    (clicks, views)
  }

  /** Backward as-of join with a 1-hour tolerance: each click picks up the
    * latest view by the same user at-or-before it (operators/AsofJoin —
    * union + single key-window pass, no range join).
    */
  def asofJoinQ(s: SparkSession, d: String): DataFrame = {
    val (clicks, views) = asofSides(s, d)
    graft.operators.AsofJoin.asof(
      clicks, views, Seq("user_id"), "t", Seq("view_value"),
      direction = "backward", tolerance = Some(3600L * 1000000L))
  }

  /** Forward as-of join via the skew-resistant bucketed two-phase plan
    * (6-hour buckets): identical semantics, `(key, bucket)` partitioning.
    */
  def asofBucketedQ(s: SparkSession, d: String): DataFrame = {
    val (clicks, views) = asofSides(s, d)
    graft.operators.AsofJoin.asofBucketed(
      clicks, views, Seq("user_id"), "t", Seq("view_value"),
      bucketWidth = 21600L * 1000000L, direction = "forward")
  }

  /** Ordered view→click→purchase funnel per user: one-shuffle sorted fold
    * (operators/EventAnalytics.funnelStages) vs the oracle's chained
    * min-after-predecessor joins — independent formulations on purpose.
    */
  def funnelQ(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.funnelStages(
      eventsMicros(s, d), "user_id", "event_type", "t",
      Seq("view", "click", "purchase"))

  /** Weekly cohort retention counts over the events stream. */
  def retentionQ(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.retentionMatrix(
      eventsMicros(s, d), "user_id", "t", periodLength = 604800000000L)

  /** Mergeable-sketch rollup (functions/SketchOps): per-(coarse, grp) HLL
    * sketches over a synthetic user key, rolled up to the coarse level by
    * sketch union, next to the direct per-grp estimates. Estimates are
    * deterministic for a fixed input multiset and lgK, so the sf0.01
    * output is a pinned golden (same pattern as q_finemap/q_pics — valid
    * at the driver's correctness SF only).
    */
  def hllRollupQ(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SketchOps
    val x = col("l_orderkey") * 8 + col("l_linenumber")
    val base = lineitem(s, d).select(
      concat(lit("u"), (x % 50021).cast(StringType)).as("user"),
      (col("l_partkey") % 8).cast(StringType).as("grp"),
      when(col("l_partkey") % 8 < 4, "A").otherwise("B").as("coarse"))
    val fine = SketchOps.distinctSketches(base, "user", Seq("coarse", "grp"))
    SketchOps.rollupEstimate(fine, Seq("coarse"))
      .select(lit("coarse").as("level"), col("coarse").as("key"), col("distinct_approx"))
      .unionByName(
        SketchOps.approxDistinct(base, "user", Seq("grp"))
          .select(lit("grp").as("level"), col("grp").as("key"), col("distinct_approx")))
  }

  /** Deterministic planted image container: a pure function of doc_id so
    * the DuckDB oracle can recompute every metadata field arithmetically.
    * doc_id % 7 selects the format — a real PNG (signature + IHDR + IEND),
    * a real JPEG (SOI + APP0 + COM + SOF0 + EOI, exercising the marker
    * walk), a real BMP (54-byte header), a raw byte blob (stub path), a
    * real GIF (signature + Logical Screen Descriptor + trailer), a real
    * WebP (RIFF/WEBP with doc_id%3 cycling the VP8 / VP8L / VP8X
    * bitstream headers), or a real TIFF (doc_id%2 cycling little/big
    * endian headers, IFD0 with width/length/bits/samples tags and an
    * out-of-line BitsPerSample array for multi-channel rows).
    */
  /** Deterministic luma in [1, 254] — never 0 or 255, so the planted
    * bit-flip below can always force a gradient comparison either way.
    */
  private def phashLuma(seed: String, r: Int, c: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$r:$c".getBytes("UTF-8"))
    1 + ((d(0) & 0xff) % 254)
  }

  /** 24-bit gray BMP: 54-byte header, bottom-up rows padded to 4 bytes. */
  private def phashBmp(px: Array[Array[Int]]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val h = px.length
    val w = px(0).length
    val stride = (w * 3 + 3) & ~3
    val size = 54 + stride * h
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var r = h - 1
    while (r >= 0) {
      var c = 0
      while (c < w) {
        val v = px(r)(c).toByte
        bb.put(v).put(v).put(v)
        c += 1
      }
      var p = w * 3
      while (p < stride) { bb.put(0.toByte); p += 1 }
      r -= 1
    }
    bb.array()
  }

  /** Binary PPM "P6": ASCII header, top-down RGB, no padding. */
  private def phashPpm(px: Array[Array[Int]]): Array[Byte] = {
    val h = px.length
    val w = px(0).length
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val v = px(r)(c).toByte
        out(i) = v; out(i + 1) = v; out(i + 2) = v
        i += 3
        c += 1
      }
      r += 1
    }
    out
  }

  /** Real non-interlaced 8-bit PNG of a gray plane: value replicated
    * across the color channels (alpha 255), so decoded luma equals the
    * input exactly for every color type (the BT.601 weights sum to 1000).
    * Row r carries filter type r % 5 (applied forward per RFC 2083), so a
    * multi-row fixture exercises ALL FIVE defilter paths of
    * [[graft.operators.Multimodal.grayPixels]] inside the oracle-checked
    * query, not just in unit tests. Chunks carry real CRC32s; the zlib
    * stream is split across two IDAT chunks to exercise chunk
    * reassembly.
    */
  private def phashPng(px: Array[Array[Int]], colorType: Int): Array[Byte] = {
    val h = px.length
    val w = px(0).length
    val ch = colorType match { case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4 }
    val stride = w * ch
    // reconstructed scanlines (no filter bytes yet)
    val recon = Array.tabulate(h, stride) { (r, i) =>
      val c = i / ch
      val k = i % ch
      val isAlpha = (colorType == 4 && k == 1) || (colorType == 6 && k == 3)
      if (isAlpha) 255 else px(r)(c)
    }
    val raw = new Array[Byte](h * (1 + stride))
    var r = 0
    while (r < h) {
      val ft = r % 5
      raw(r * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = recon(r)(i)
        val a = if (i >= ch) recon(r)(i - ch) else 0
        val u = if (r > 0) recon(r - 1)(i) else 0
        val c0 = if (r > 0 && i >= ch) recon(r - 1)(i - ch) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => u
          case 3 => (a + u) / 2
          case _ =>
            val p = a + u - c0
            val pa = math.abs(p - a); val pb = math.abs(p - u)
            val pc = math.abs(p - c0)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) u else c0
        }
        raw(r * (1 + stride) + 1 + i) = ((x - pred) & 0xff).toByte
        i += 1
      }
      r += 1
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val n = d.deflate(buf)
      d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = {
      val bb = java.nio.ByteBuffer.allocate(13)
      bb.putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte)
      bb.array()
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val split = deflated.length / 2
    sig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", deflated.take(split)) ++
      chunk("IDAT", deflated.drop(split)) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Pixel-level image fixture for the perceptual-hash join, 9×8 gray
    * (the dHash grid size, so the area-mean downsample is the identity
    * and every planted bit is arithmetically controlled). Groups of 3:
    *   - doc 3g   → the group's base pattern as a BMP;
    *   - doc 3g+1 → the SAME pixels as a PPM (g%4 in {0,1}) or a real
    *     PNG (g%4 in {2,3}; [[phashPng]]) — a format-crossing duplicate
    *     byte-level dedup cannot see (dHash Hamming 0) — and
    *     for odd g the last pixel of row 0 is adjusted to flip exactly
    *     dHash bit (0,7) (the only comparison that pixel feeds), making
    *     the pair's Hamming exactly g % 2;
    *   - doc 3g+2 → an independent per-doc pattern (no planted partner).
    * md5-derived pixels keep unrelated dHashes ~32 bits apart, so the
    * expected pair set is the arithmetic function the DuckDB oracle
    * recomputes (verified stray-free at sf0.001/0.01/0.1).
    */
  private[harness] def phashFixtureBytes(k: Long): Array[Byte] = {
    val g = k / 3
    val base = Array.tabulate(8, 9)((r, c) => phashLuma(s"ph$g", r, c))
    (k % 3).toInt match {
      case 0 => phashBmp(base)
      case 1 =>
        val px = base.map(_.clone())
        if (g % 2 == 1)
          px(0)(8) = if (px(0)(7) < px(0)(8)) 0 else 255
        // the twin container cycles PPM / PNG with g (PNG color type
        // cycling gray / RGB / gray+alpha / RGBA) — the pixels are
        // identical either way, so the oracle's doc-id arithmetic is
        // untouched while the oracle-checked pairs now cross BMP↔PNG
        // (with all five defilter types in play via phashPng's r%5 rows)
        if (g % 4 < 2) phashPpm(px)
        else phashPng(px, Seq(0, 2, 4, 6)(((g / 4) % 4).toInt))
      case _ =>
        val solo = Array.tabulate(8, 9)((r, c) => phashLuma(s"solo$k", r, c))
        if (g % 3 == 0) phashPng(solo, 2) else phashBmp(solo)
    }
  }

  /** Pixel-level image fixture for the 128-bit perceptual-hash join,
    * 17×8 gray (the dHash128 grid size, so the area-mean downsample is
    * the identity). Same planted group-of-3 scheme as
    * [[phashFixtureBytes]] with independent md5 streams (`pw`/`solo128`
    * seeds): docs 3g/3g+1 are one image in two containers, odd-g twins
    * flip exactly dHash128 bit (0,15) via the last pixel of row 0 —
    * Hamming exactly g % 2; doc 3g+2 stands alone. Unrelated 128-bit
    * hashes sit ~64 bits apart (verified stray-free at
    * sf0.001/0.01/0.1), so the oracle is the same doc-id arithmetic.
    */
  private[harness] def phash128FixtureBytes(k: Long): Array[Byte] = {
    val g = k / 3
    val base = Array.tabulate(8, 17)((r, c) => phashLuma(s"pw$g", r, c))
    (k % 3).toInt match {
      case 0 => phashBmp(base)
      case 1 =>
        val px = base.map(_.clone())
        if (g % 2 == 1)
          px(0)(16) = if (px(0)(15) < px(0)(16)) 0 else 255
        // same PPM/PNG container cycling as phashFixtureBytes — pixels
        // unchanged, so the planted pair arithmetic is container-blind
        if (g % 4 < 2) phashPpm(px)
        else phashPng(px, Seq(0, 2, 4, 6)(((g / 4) % 4).toInt))
      case _ =>
        val solo = Array.tabulate(8, 17)((r, c) => phashLuma(s"solo128$k", r, c))
        if (g % 3 == 0) phashPng(solo, 2) else phashBmp(solo)
    }
  }

  /** Mono 16-bit 16 kHz PCM WAV whose 65 constant-amplitude blocks (4
    * frames each) REALISE a given 64-bit energy-gradient pattern: block 0
    * at 1000, block k+1 at ±10 from block k per pattern bit k — so
    * [[graft.operators.Multimodal.audioFingerprint64]] of the payload is
    * exactly `pattern`. With `junk` the chunk list carries a JUNK chunk
    * before fmt (a container-layout variant byte-level dedup cannot
    * equate; the decoded samples are identical).
    */
  private def audioWavFromPattern(pattern: Long, junk: Boolean): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val amps = new Array[Int](65)
    amps(0) = 1000
    (0 until 64).foreach { k =>
      amps(k + 1) = if (((pattern >>> k) & 1L) == 1L) amps(k) + 10 else amps(k) - 10
    }
    val dataBytes = 65 * 4 * 2
    val junkBytes = if (junk) 8 + 4 else 0
    val bb = ByteBuffer.allocate(44 + junkBytes + dataBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + junkBytes + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    if (junk)
      bb.put("JUNK".getBytes("US-ASCII")).putInt(4).putInt(0)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(16000)
      .putInt(16000 * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    amps.foreach(a => (0 until 4).foreach(_ => bb.putShort(a.toShort)))
    bb.array()
  }

  /** Deterministic planted audio-content fixture, a pure function of
    * doc_id — the audio twin of [[phashFixtureBytes]]' group-of-3
    * scheme: docs 3g and 3g+1 realise md5-derived envelope pattern
    * p(g), the twin in a junk-chunk container layout and, for odd g,
    * with pattern bit 63 flipped (the walk construction localises the
    * flip to the last block) — fingerprint Hamming exactly g % 2, and
    * EXACT sample equality exactly when g is even; doc 3g+2 realises an
    * independent solo pattern (~32 bits from everything else, verified
    * stray-free at sf0.001/0.01/0.1).
    */
  private[harness] def audioPhashFixtureBytes(k: Long): Array[Byte] = {
    def pattern(seed: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(seed.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((acc, i) => acc | ((d(i) & 0xffL) << (8 * i)))
    }
    val g = k / 3
    (k % 3).toInt match {
      case 0 => audioWavFromPattern(pattern(s"au$g"), junk = false)
      case 1 =>
        val p = pattern(s"au$g") ^ ((g & 1L) << 63)
        audioWavFromPattern(p, junk = true)
      case _ => audioWavFromPattern(pattern(s"soloau$k"), junk = false)
    }
  }

  /** Deterministic planted video container, a pure function of doc_id:
    * doc_id % 4 selects a version-0 MP4 (u32 mvhd duration), a version-1
    * MP4 (u64 mvhd duration, v1 tkhd), a raw blob (stub path), or a
    * version-0 MP4 with `free` boxes planted at two levels (top level
    * and inside moov) to exercise the walk's skipping. Brand, movie
    * timescale, duration (always a whole (doc_id%50+1) seconds so the
    * ms conversion is exact for every timescale), 16.16 presentation
    * dims and the stsd codec fourcc are all doc_id arithmetic the
    * oracle recomputes.
    */
  private[harness] def videoFixtureBytes(k: Long): Array[Byte] = {
    import java.nio.ByteBuffer
    val f = (k % 4).toInt
    if (f == 2) return Array.fill((k % 50 + 1).toInt)('v'.toByte)
    val v1 = f == 1
    val brand = Seq("isom", "mp42", "avc1")((k % 3).toInt)
    val ts = Seq(1000L, 600L, 90000L, 48000L, 25L)((k % 5).toInt)
    val dur = ts * (k % 50 + 1)
    val w = (k % 1920 + 16).toInt
    val h = (k % 1080 + 16).toInt
    val codec =
      Seq("avc1", "hvc1", "vp09", "av01", "mp4v", "vp08", "hev1")((k % 7).toInt)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val mvhd = {
      val bb = ByteBuffer.allocate(if (v1) 112 else 100)
      bb.put((if (v1) 1 else 0).toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      if (v1) bb.putLong(0L).putLong(0L).putInt(ts.toInt).putLong(dur)
      else bb.putInt(0).putInt(0).putInt(ts.toInt).putInt(dur.toInt)
      bb.putInt(0x00010000).putShort(0x0100.toShort)
      bb.array() // reserved/matrix/predefined/next-track stay zero
    }
    val tkhd = {
      val bb = ByteBuffer.allocate(if (v1) 96 else 84)
      bb.put((if (v1) 1 else 0).toByte).put(0.toByte).put(0.toByte).put(7.toByte)
      if (v1) bb.putLong(0L).putLong(0L).putInt(1).putInt(0).putLong(dur)
      else bb.putInt(0).putInt(0).putInt(1).putInt(0).putInt(dur.toInt)
      bb.position(bb.position() + 8 + 2 + 2 + 2 + 2 + 36)
      bb.putInt(w << 16).putInt(h << 16)
      bb.array()
    }
    val stsdEntry = {
      val bb = ByteBuffer.allocate(16)
      bb.putInt(16).put(codec.getBytes("US-ASCII"))
      bb.array()
    }
    val stsd = box("stsd", {
      val hd = ByteBuffer.allocate(8); hd.putInt(0).putInt(1)
      hd.array() ++ stsdEntry
    })
    val mdia = box("mdia", box("minf", box("stbl", stsd)))
    val trak = box("trak", box("tkhd", tkhd) ++ mdia)
    val ftyp = box("ftyp", brand.getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0))
    if (f == 3) {
      val free = box("free", Array[Byte](0, 0, 0, 0))
      ftyp ++ free ++ box("moov", free ++ box("mvhd", mvhd) ++ trak)
    } else ftyp ++ box("moov", box("mvhd", mvhd) ++ trak)
  }

  private[harness] def imageFixtureBytes(k: Long): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val w = (k % 317 + 1).toInt
    val h = (k % 211 + 1).toInt
    (k % 7).toInt match {
      case 0 => // PNG: colorType cycles gray/rgb/palette/gray+a/rgba
        val ct = Array(0, 2, 3, 4, 6)((k % 5).toInt)
        val depth = if (ct == 3) 8 else if (k % 2 == 0) 8 else 16
        val bb = ByteBuffer.allocate(45)
        bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
        bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
          .putInt(w).putInt(h).put(depth.toByte).put(ct.toByte)
          .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
          .putInt(0)                                 // CRC (not validated)
        bb.putInt(0).put("IEND".getBytes("US-ASCII")).putInt(0)
        bb.array()
      case 1 => // JPEG: APP0 + COM segments precede the SOF0 frame header
        val n = if (k % 2 == 0) 3 else 1
        val bb = ByteBuffer.allocate(47 + 3 * n)
        bb.put(0xff.toByte).put(0xd8.toByte) // SOI
        bb.put(0xff.toByte).put(0xe0.toByte).putShort(16)
          .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
          .put(1.toByte).put(1.toByte).put(0.toByte)
          .putShort(1).putShort(1).put(0.toByte).put(0.toByte)
        bb.put(0xff.toByte).put(0xfe.toByte).putShort(13)
          .put("graft-cmt01".getBytes("US-ASCII")) // COM payload, 11 bytes
        bb.put(0xff.toByte).put(0xc0.toByte).putShort((8 + 3 * n).toShort)
          .put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(n.toByte)
        (1 to n).foreach(i =>
          bb.put(i.toByte).put(0x11.toByte).put(0.toByte))
        bb.put(0xff.toByte).put(0xd9.toByte) // EOI
        bb.array()
      case 2 => // BMP: 14-byte file header + 40-byte BITMAPINFOHEADER
        val bb = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
        bb.put('B'.toByte).put('M'.toByte).putInt(54)
          .putShort(0).putShort(0).putInt(54)
        bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        bb.array() // trailing header fields stay zero
      case 3 => // raw blob → stub metadata path
        Array.fill((k % 50 + 1).toInt)('x'.toByte)
      case 4 => // GIF: signature + Logical Screen Descriptor + trailer
        val depth = (k % 8 + 1).toInt // colour resolution bits, 1..8
        val ver = if (k % 2 == 0) '9' else '7'
        val bb = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
        bb.put(s"GIF8${ver}a".getBytes("US-ASCII"))
          .putShort(w.toShort).putShort(h.toShort)
          // packed: GCT flag | colour resolution (depth-1) | GCT size 7
          .put((0x80 | ((depth - 1) << 4) | 0x07).toByte)
          .put(0.toByte).put(0.toByte) // bg colour index, aspect ratio
          .put(0x3b.toByte)            // trailer
        bb.array()
      case 6 => // TIFF: II/MM header, IFD0 with the four dim/depth tags
        val ch = (k % 3 + 1).toInt
        val depth = if (k % 5 == 0) 16 else 8
        val le = k % 2 == 0
        val arrOff = 62 // 8 header + 2 count + 4×12 entries + 4 next-IFD
        val bb = ByteBuffer.allocate(arrOff + (if (ch > 1) 2 * ch else 0))
          .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
        bb.put((if (le) "II" else "MM").getBytes("US-ASCII"))
          .putShort(42).putInt(8) // magic + IFD0 offset
        bb.putShort(4) // entry count; tags ascending per spec
        def entry(tag: Int, cnt: Int, shortVal: Int, longVal: Int): Unit = {
          bb.putShort(tag.toShort).putShort(3).putInt(cnt) // type 3 = SHORT
          if (cnt == 1) bb.putShort(shortVal.toShort).putShort(0)
          else bb.putInt(longVal) // offset to the out-of-line SHORT array
        }
        entry(256, 1, w, 0)
        entry(257, 1, h, 0)
        if (ch == 1) entry(258, 1, depth, 0) else entry(258, ch, 0, arrOff)
        entry(277, 1, ch, 0)
        bb.putInt(0) // no next IFD
        if (ch > 1) (1 to ch).foreach(_ => bb.putShort(depth.toShort))
        bb.array()
      case _ => // WebP: RIFF/WEBP, k%3 cycles VP8 (lossy) / VP8L / VP8X
        val alpha = k % 2 == 0
        val (fourcc, payload) = (k % 3).toInt match {
          case 0 => // VP8: 3-byte frame tag, keyframe start code, 14-bit dims
            val p = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
            p.put(0.toByte).put(0.toByte).put(0.toByte)
              .put(0x9d.toByte).put(0x01.toByte).put(0x2a.toByte)
              .putShort(w.toShort).putShort(h.toShort)
            ("VP8 ", p.array())
          case 1 => // VP8L: 0x2F then width-1 | height-1<<14 | alpha<<28
            val bits = (w - 1) | ((h - 1) << 14) | ((if (alpha) 1 else 0) << 28)
            val p = ByteBuffer.allocate(5).order(ByteOrder.LITTLE_ENDIAN)
            p.put(0x2f.toByte).putInt(bits)
            ("VP8L", p.array())
          case _ => // VP8X: flags (alpha bit 0x10), 24-bit canvas dims minus one
            val p = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
            p.put((if (alpha) 0x10 else 0x00).toByte)
              .put(0.toByte).put(0.toByte).put(0.toByte)
              .put((w - 1).toByte).put(((w - 1) >> 8).toByte).put(((w - 1) >> 16).toByte)
              .put((h - 1).toByte).put(((h - 1) >> 8).toByte).put(((h - 1) >> 16).toByte)
            ("VP8X", p.array())
        }
        val bb = ByteBuffer.allocate(20 + payload.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + payload.length)
          .put("WEBP".getBytes("US-ASCII"))
          .put(fourcc.getBytes("US-ASCII")).putInt(payload.length)
          .put(payload)
        bb.array()
    }
  }

  /** Image-container metadata over planted PNG/JPEG/BMP/raw/GIF/WebP
    * payloads ([[graft.operators.Multimodal.imageMeta]]): format detection
    * plus dimensions / channels / per-channel bit depth from pure header
    * parses (PNG IHDR, JPEG SOF0 behind APP0+COM markers, BMP info header,
    * GIF Logical Screen Descriptor, WebP VP8/VP8L/VP8X bitstream headers).
    * The oracle recomputes every field arithmetically from doc_id.
    */
  def imageMetaQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", org.apache.spark.sql.types.StringType, nullable = false),
      StructField("content", BinaryType, nullable = false))))
    val media = documents(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val k = r.getLong(0)
        Row(k, "image/planted", imageFixtureBytes(k))
      }
    }(enc)
    Multimodal.imageMeta(media)
  }

  /** Deterministic planted audio container, a pure function of doc_id:
    * doc_id % 5 selects a real PCM WAV (RIFF chunk walk), a real FLAC
    * (fLaC magic + 34-byte STREAMINFO with the 20/3/5/36-bit packed
    * field), a raw blob (stub path), a real MP3 (MPEG1 Layer III frame
    * header; even ids carry a Xing frame count after the 32-byte stereo
    * side info, odd ids an ID3v2-prefixed mono frame with a VBRI header),
    * or a real Ogg Vorbis (BOS identification header + EOS page whose
    * granule position carries the total sample count).
    */
  private[harness] def audioFixtureBytes(k: Long): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    (k % 5).toInt match {
      case 0 => // PCM WAV: fmt (rate/channels/bits) + data (frame count)
        val rate = (8000 + (k % 4) * 8000).toInt
        val ch = (k % 2 + 1).toInt
        val frames = (k % 50 + 1).toInt
        val dataBytes = frames * ch * 2
        val bb = ByteBuffer.allocate(44 + dataBytes)
          .order(ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(ch.toShort).putInt(rate)
          .putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16)
          .put("data".getBytes("US-ASCII")).putInt(dataBytes)
        bb.array()
      case 1 => // FLAC: last-block STREAMINFO only, zeroed md5
        val rate = (16000 + (k % 5) * 8000).toInt
        val ch = (k % 2 + 1).toInt
        val bps = 16
        val total = k % 100000
        val bb = ByteBuffer.allocate(42)
        bb.put("fLaC".getBytes("US-ASCII"))
          .put(0x80.toByte) // last-metadata-block flag + type 0
          .put(0.toByte).put(0.toByte).put(34.toByte) // block length
          .putShort(4096).putShort(4096) // min/max block size
          .put(0.toByte).put(0.toByte).put(0.toByte) // min frame size
          .put(0.toByte).put(0.toByte).put(0.toByte) // max frame size
        bb.put((rate >> 12).toByte).put(((rate >> 4) & 0xff).toByte)
          .put((((rate & 0xf) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4)).toByte)
          .put(((((bps - 1) & 0xf) << 4) | ((total >> 32) & 0xf).toInt).toByte)
          .put(((total >> 24) & 0xff).toByte).put(((total >> 16) & 0xff).toByte)
          .put(((total >> 8) & 0xff).toByte).put((total & 0xff).toByte)
        bb.array() // 16 md5 bytes stay zero
      case 2 => // raw blob → stub metadata path
        Array.fill((k % 50 + 1).toInt)('a'.toByte)
      case 3 => // MP3: MPEG1 Layer III header + Xing (even k) / ID3+VBRI (odd)
        val sri = (k % 3).toInt // 44100 / 48000 / 32000
        val frames = (k % 9999 + 1).toInt
        if (k % 2 == 0) { // joint-stereo frame, Xing after 32-byte side info
          val bb = ByteBuffer.allocate(48)
          bb.put(0xff.toByte).put(0xfb.toByte) // sync + MPEG1 + Layer III
            .put((0x90 | (sri << 2)).toByte) // bitrate idx 9, no padding
            .put(0x40.toByte) // joint stereo
          bb.position(4 + 32) // zeroed side info
          bb.put("Xing".getBytes("US-ASCII"))
            .putInt(1) // flags: frames field present (big-endian)
            .putInt(frames)
          bb.array()
        } else { // ID3v2-prefixed mono frame with a VBRI header at +36
          val tagSize = ((k % 7) * 3).toInt // synchsafe, < 128
          val bb = ByteBuffer.allocate(10 + tagSize + 54)
          bb.put("ID3".getBytes("US-ASCII"))
            .put(3.toByte).put(0.toByte).put(0.toByte) // version + flags
            .put(0.toByte).put(0.toByte).put(0.toByte).put(tagSize.toByte)
          bb.position(10 + tagSize)
          val o = bb.position()
          bb.put(0xff.toByte).put(0xfb.toByte)
            .put((0x90 | (sri << 2)).toByte)
            .put(0xc0.toByte) // mono
          bb.position(o + 36) // VBRI sits 32 bytes after the 4-byte header
          bb.put("VBRI".getBytes("US-ASCII"))
            .putShort(1).putShort(0).putShort(0) // version, delay, quality
            .putInt(0) // total bytes (unused here)
            .putInt(frames)
          bb.array()
        }
      case _ => // Ogg Vorbis: BOS page w/ identification header + EOS page
        val ch = (k % 2 + 1).toInt
        val rate = (8000 + (k % 6) * 8000).toInt
        val total = k % 100000
        val bb = ByteBuffer.allocate(58 + 28).order(ByteOrder.LITTLE_ENDIAN)
        bb.put("OggS".getBytes("US-ASCII")).put(0.toByte).put(0x02.toByte)
          .putLong(0L) // granule
          .putInt(1).putInt(0).putInt(0) // serial, page seq, crc (unchecked)
          .put(1.toByte).put(30.toByte) // one 30-byte segment
        bb.put(0x01.toByte).put("vorbis".getBytes("US-ASCII"))
          .putInt(0) // vorbis version
          .put(ch.toByte).putInt(rate)
          .putInt(0).putInt(0).putInt(0) // bitrate max / nominal / min
          .put(0xb8.toByte).put(0x01.toByte) // blocksizes + framing bit
        bb.put("OggS".getBytes("US-ASCII")).put(0.toByte).put(0x04.toByte)
          .putLong(total) // EOS granule = total PCM samples
          .putInt(1).putInt(1).putInt(0)
          .put(1.toByte).put(0.toByte) // one empty segment
        bb.array()
    }
  }

  /** Audio-container metadata over planted WAV/FLAC/raw/MP3/Ogg payloads
    * ([[graft.operators.Multimodal.audioMeta]]): format detection plus
    * sample rate / channels / frame count from pure header parses (WAV
    * RIFF chunk walk, FLAC STREAMINFO packed field, MPEG frame header +
    * Xing/VBRI frame counts behind an ID3v2 skip, Ogg Vorbis identification
    * header + last-page granule position). The oracle recomputes every
    * field arithmetically from doc_id.
    */
  def audioMetaQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", org.apache.spark.sql.types.StringType, nullable = false),
      StructField("content", BinaryType, nullable = false))))
    val media = documents(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val k = r.getLong(0)
        Row(k, "audio/planted", audioFixtureBytes(k))
      }
    }(enc)
    Multimodal.audioMeta(media)
  }

  /** Streaming-funnel semantics under oracle: the live
    * [[graft.streaming.StreamingOps.funnelStream]] fold (the monotone
    * per-user k-slot state machine in `mapGroupsWithState`) executed in
    * BATCH mode — Spark runs the same state function once per key over the
    * key's full time-ordered event set with empty initial state, which is
    * exactly the single-batch delivery StreamingOpsSpec pins the live
    * stream's final rows to. The slot list is projected to columns so the
    * DuckDB oracle (sequential stage minima with a strict-progress bound)
    * can hash-compare field by field.
    */
  def funnelStreamTwin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = eventsMicros(s, d).select(
      col("user_id").as("userId"), col("event_type").as("eventType"), col("t"))
      .as[graft.streaming.StreamingOps.FunnelEvent]
    graft.streaming.StreamingOps
      .funnelStream(ev, Seq("view", "click", "purchase"))
      .toDF()
      .select(
        col("userId").as("user_id"),
        col("stageReached").as("stage_reached"),
        element_at(col("stageTs"), 1).as("stage_ts_1"),
        element_at(col("stageTs"), 2).as("stage_ts_2"),
        element_at(col("stageTs"), 3).as("stage_ts_3"))
  }

  /** Streaming attribution-join semantics under oracle: the live
    * [[graft.streaming.StreamingOps.attributionJoinStream]] watermarked
    * stream-stream time-range join executed on STATIC frames — Catalyst's
    * EliminateEventTimeWatermark strips the watermark nodes over batch
    * children, leaving exactly the time-range join a backfill of the live
    * pipeline would run (StreamingOpsSpec pins the live MemoryStream run,
    * late-data expiry included, to this same frame). Views attribute to
    * each same-user click within the preceding hour.
    */
  def attribStreamTwin(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    val ev = events(s, d).select(
      col("user_id"), col("ts").cast(TimestampType).as("ts"),
      col("value"), col("event_type"))
    graft.streaming.StreamingOps
      .attributionJoinStream(
        ev.filter(col("event_type") === "view").drop("event_type"),
        ev.filter(col("event_type") === "click").drop("event_type"),
        window = "1 hour", watermark = "30 minutes")
      .select(
        col("user_id"),
        unix_micros(col("view_ts")).as("view_t"),
        unix_micros(col("conv_ts")).as("conv_t"),
        col("view_value"), col("conv_value"))
  }

  /** Content-level image near-dup over the pixel fixtures: the planted
    * format-crossing duplicates (BMP vs PPM of one image) must surface at
    * their arithmetically-controlled Hamming distances.
    */
  def imagePHashQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false))))
    val media = documents(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val k = r.getLong(0)
        Row(k, phashFixtureBytes(k))
      }
    }(enc)
    Dedup.imagePHashPairs(media, maxHamming = 2)
      .select(
        col("l_doc").as("doc_a"),
        col("r_doc").as("doc_b"),
        col("hamming"))
  }

  /** 128-bit content-level image near-dup over the wide pixel fixtures —
    * the banding-saturation widening path (32-bit bands at maxHamming 3):
    * the same planted format-crossing duplicates must surface at their
    * arithmetically-controlled Hamming distances through the
    * [[graft.operators.Dedup.imagePHash128Pairs]] banded join.
    */
  def imagePHash128Q(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false))))
    val media = documents(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val k = r.getLong(0)
        Row(k, phash128FixtureBytes(k))
      }
    }(enc)
    Dedup.imagePHash128Pairs(media)
      .select(
        col("l_doc").as("doc_a"),
        col("r_doc").as("doc_b"),
        col("hamming"))
  }

  /** Content-level audio near-dup over the PCM fixtures: the planted
    * container-crossing duplicates (same samples, junk-chunk layout)
    * must surface at their arithmetically-controlled envelope Hamming
    * distances through [[graft.operators.Dedup.audioPHashPairs]]'
    * banded join.
    */
  def audioPHashQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false))))
    val media = documents(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val k = r.getLong(0)
        Row(k, audioPhashFixtureBytes(k))
      }
    }(enc)
    Dedup.audioPHashPairs(media)
      .select(
        col("l_doc").as("doc_a"),
        col("r_doc").as("doc_b"),
        col("hamming"))
  }

  /** Exact content-level audio dedup over the same PCM fixtures
    * ([[graft.operators.Dedup.audioSampleHashes]]): pairs whose DECODED
    * samples are identical — exactly the even-g planted twins, whose
    * byte payloads DIFFER (junk-chunk layout), so byte-level equality
    * would find nothing.
    */
  def audioExactQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false))))
    val media = documents(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val k = r.getLong(0)
        Row(k, audioPhashFixtureBytes(k))
      }
    }(enc)
    val h = Dedup.audioSampleHashes(media)
    h.select(col("media_id").as("doc_a"), col("sample_hash"))
      .join(
        h.select(col("media_id").as("doc_b"), col("sample_hash")),
        Seq("sample_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
  }

  // -- EBML (Matroska/WebM) fixture encoding -----------------------------

  /** Big-endian bytes of an EBML element ID exactly as stored (the ID
    * keeps its marker bit, so its byte length is implied by its value).
    */
  private def ebmlId(id: Long): Array[Byte] = {
    val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    Array.tabulate[Byte](n)(i => ((id >>> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  /** EBML size vint: marker bit in the first byte, 7·width data bits.
    * width 0 = minimal; a forced wider width exercises non-minimal vints
    * (legal per spec, and real muxers emit them for patchability).
    */
  private def ebmlSize(sz: Long, width: Int = 0): Array[Byte] = {
    var w = math.max(1, width)
    // minimal width avoiding the reserved all-ones (unknown-size) pattern
    while ((1L << (7 * w)) - 1 <= sz && w < 8) w += 1
    // byte i carries value bits [8(w-1-i), 8(w-i)); the top byte's value
    // bits fit under the marker because sz < 2^(7w)
    val out = new Array[Byte](w)
    var i = 0
    while (i < w) {
      out(i) = ((sz >>> (8 * (w - 1 - i))) & 0xff).toByte
      i += 1
    }
    out(0) = (out(0) | (0x80 >>> (w - 1))).toByte
    out
  }

  /** The reserved all-ones size vint: element of unknown size (runs to
    * the parent's end) — how real muxers write a live Segment.
    */
  private def ebmlUnknownSize(width: Int): Array[Byte] =
    Array.tabulate[Byte](width)(i =>
      if (i == 0) ((0x80 >>> (width - 1)) | (0x7f >>> (width - 1))).toByte
      else 0xff.toByte)

  /** Minimal big-endian unsigned-integer payload (≥ 1 byte). */
  private def ebmlUInt(v: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    Array.tabulate[Byte](n)(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  private def ebmlEl(id: Long, payload: Array[Byte], sizeWidth: Int = 0): Array[Byte] =
    ebmlId(id) ++ ebmlSize(payload.length.toLong, sizeWidth) ++ payload

  /** Deterministic planted Matroska/WebM fixture, a pure function of
    * doc_id — the EBML twin of [[videoFixtureBytes]]. doc_id % 3 picks
    * webm DocType / matroska DocType / a raw stub blob. Every metadata
    * field is doc_id arithmetic the oracle recomputes independently;
    * the encoding itself varies to exercise the vint walk: matroska rows
    * use non-minimal 2-byte size vints throughout, even rows write the
    * Segment with the reserved unknown-size vint (runs to EOF) and the
    * Duration as a 4-byte float (odd rows: sized Segment, 8-byte float),
    * doc_id % 4 == 0 rows OMIT TimestampScale (spec default 1,000,000),
    * and doc_id % 7 < 3 rows plant an audio TrackEntry BEFORE the video
    * one (video-track precedence). Durations are built so every
    * ticks↔ms conversion is integer-exact at all four planted scales.
    */
  private[harness] def mkvFixtureBytes(k: Long): Array[Byte] = {
    val f = (k % 3).toInt
    if (f == 2) {
      val n = (k % 50 + 1).toInt
      Array.tabulate[Byte](n)(i => ((k + i) % 97).toByte)
    } else {
      val wide = if (f == 1) 2 else 0
      val docType = if (f == 0) "webm" else "matroska"
      val scaleIdx = (k % 4).toInt
      val scale = Seq(1000000L, 2000000L, 500000L, 250000L)(scaleIdx)
      val ms = (k % 40 + 1) * 1000
      val ticks = ms * 1000000L / scale
      val wpx = (k % 1280 + 16).toInt
      val hpx = (k % 720 + 16).toInt
      val codec = Seq("V_VP8", "V_VP9", "V_AV1", "V_MPEG4/ISO/AVC",
        "V_THEORA")((k % 5).toInt)
      val durPayload =
        if (k % 2 == 0)
          java.nio.ByteBuffer.allocate(4)
            .putFloat(ticks.toFloat).array() // ticks ≤ 160000: float-exact
        else
          java.nio.ByteBuffer.allocate(8).putDouble(ticks.toDouble).array()
      val hdr = ebmlEl(0x1a45dfa3L,
        ebmlEl(0x4282L, docType.getBytes("US-ASCII"), wide), wide)
      val info = ebmlEl(0x1549a966L,
        (if (scaleIdx == 0) Array.empty[Byte]
         else ebmlEl(0x2ad7b1L, ebmlUInt(scale), wide)) ++
          ebmlEl(0x4489L, durPayload, wide),
        wide)
      val videoEl = ebmlEl(0xe0L,
        ebmlEl(0xb0L, ebmlUInt(wpx), wide) ++
          ebmlEl(0xbaL, ebmlUInt(hpx), wide), wide)
      val vTrack = ebmlEl(0xaeL,
        ebmlEl(0x83L, ebmlUInt(1L)) ++
          ebmlEl(0x86L, codec.getBytes("US-ASCII"), wide) ++ videoEl, wide)
      val aTrack =
        if (k % 7 < 3)
          ebmlEl(0xaeL,
            ebmlEl(0x83L, ebmlUInt(2L)) ++
              ebmlEl(0x86L, "A_OPUS".getBytes("US-ASCII"), wide), wide)
        else Array.empty[Byte]
      val tracks = ebmlEl(0x1654ae6bL, aTrack ++ vTrack, wide)
      val segPayload = info ++ tracks
      val seg =
        if (k % 2 == 0)
          ebmlId(0x18538067L) ++ ebmlUnknownSize(1) ++ segPayload
        else ebmlEl(0x18538067L, segPayload, wide)
      hdr ++ seg
    }
  }

  /** Matroska/WebM container metadata over planted EBML/raw payloads
    * ([[graft.operators.Multimodal.videoMeta]] via
    * [[graft.operators.Multimodal.StubDecoder.parseMkv]]): DocType brand,
    * TimestampScale (incl. the omitted-element spec default), float32/
    * float64 Duration, PixelWidth/Height and CodecID from the first
    * VIDEO TrackEntry with audio entries skipped, across minimal and
    * non-minimal size vints and unknown-size Segments. n_bytes is
    * excluded (the variable-length encoding makes it non-arithmetic);
    * the oracle recomputes every emitted field from doc_id.
    */
  def videoMetaMkvQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", org.apache.spark.sql.types.StringType, nullable = false),
      StructField("content", BinaryType, nullable = false))))
    val media = documents(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val k = r.getLong(0)
        Row(k, "video/planted-mkv", mkvFixtureBytes(k))
      }
    }(enc)
    Multimodal.videoMeta(media).select(
      col("media_id"), col("format"), col("brand"), col("timescale"),
      col("duration_ms"), col("width"), col("height"), col("codec"))
  }

  /** Video-container metadata over planted MP4/raw payloads
    * ([[graft.operators.Multimodal.videoMeta]]): format detection plus
    * brand / timescale / duration / dims / codec from the pure ISO-BMFF
    * box walk (ftyp brand, v0/v1 mvhd, v0/v1 tkhd 16.16 dims, stsd
    * first-entry fourcc, free-box skipping at two levels). The oracle
    * recomputes every field arithmetically from doc_id.
    */
  def videoMetaQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", org.apache.spark.sql.types.StringType, nullable = false),
      StructField("content", BinaryType, nullable = false))))
    val media = documents(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val k = r.getLong(0)
        Row(k, "video/planted", videoFixtureBytes(k))
      }
    }(enc)
    Multimodal.videoMeta(media)
  }

  /** Compact checksum twin of [[pics]], closing the one SF-dispatch golden
    * hole (q_pics at sf0.1 would be a ~300k-row VALUES literal — the r14
    * adjudication): per-variant tag count plus integer-µ sums of the
    * 6dp-rounded posteriors. The variant key space is fixed (mod 97 / mod
    * 89 ids), so the output is ≤186 rows at EVERY scale factor and sf0.1
    * gets a real pinned golden. Integer sums of floor(pp·1e6) are
    * order-independent — no distributed-double-summation nondeterminism,
    * and the DuckDB side is a pure BIGINT literal comparison.
    */
  def picsChecksum(s: SparkSession, d: String): DataFrame =
    pics(s, d)
      .groupBy(col("variantId"))
      .agg(
        count(lit(1)).as("n_tags"),
        sum(floor(col("pp") * 1e6).cast("long")).as("pp_sum_micro"),
        sum(floor(col("se") * 1e6).cast("long")).as("se_sum_micro"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel_stream_twin" -> (funnelStreamTwin _),
    "q_pics_checksum" -> (picsChecksum _),
    "q_attrib_stream_twin" -> (attribStreamTwin _),
    "q_hll_rollup" -> (hllRollupQ _),
    "q_image_meta" -> (imageMetaQ _),
    "q_image_phash" -> (imagePHashQ _),
    "q_image_phash128" -> (imagePHash128Q _),
    "q_audio_meta" -> (audioMetaQ _),
    "q_audio_phash" -> (audioPHashQ _),
    "q_audio_exact" -> (audioExactQ _),
    "q_video_meta" -> (videoMetaQ _),
    "q_video_meta_mkv" -> (videoMetaMkvQ _),
    "q_funnel" -> (funnelQ _),
    "q_retention" -> (retentionQ _),
    "q_finemap" -> (finemap _),
    "q_carma" -> (carmaQ _),
    "q_raiss" -> (raissQ _),
    "q_pics" -> (pics _),
    "q_minmax" -> (minmax _),
    "q_deconvolute" -> (deconvolute _),
    "q_multimodal" -> (multimodal _),
    "q_asof_join" -> (asofJoinQ _),
    "q_asof_bucketed" -> (asofBucketedQ _)
  )

  /** Pinned-golden oracles (tools/MakeGoldens.scala): kernels with no
    * DuckDB counterpart (SuSiE-inf, normal sf, chi² isf, Datasketches HLL)
    * get per-SF VALUES blocks dispatched by a corpus-size predicate inside
    * one static SQL string — the oracle passes at sf0.001 AND sf0.01 (and
    * sf0.1 for the 10-row outputs), not only the driver's correctness SF.
    * q_finemap's generator is a pure function of (locusIdx, varIdx) over a
    * 40×60 grid fully covered at every sf ≥ 0.01, so its big block is
    * unbounded above; kernel values are verified against FinucaneLab /
    * scipy goldens in FineMapperSpec, SusieInfSpec, PicsSpec, SumstatQCSpec.
    */
  private[harness] def resourceSql(name: String): String = {
    val in = getClass.getResourceAsStream(s"/goldens/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  val oracles: Map[String, String] = Map(
    "q_finemap" -> resourceSql("q_finemap_oracle.sql"),
    "q_pics_checksum" -> resourceSql("q_pics_checksum_oracle.sql"),
    "q_carma" -> resourceSql("q_carma_oracle.sql"),
    "q_raiss" -> resourceSql("q_raiss_oracle.sql"),
    // The planted perceptual-dup structure is a pure function of doc_id
    // (see phashFixtureBytes): docs 3g and 3g+1 are one image in two
    // containers, Hamming exactly g % 2 by the controlled bit flip; solo
    // docs have md5-independent patterns (~32 bits away — verified
    // stray-free at all three SFs). The oracle recomputes that expected
    // pair set arithmetically, fully independent of the decode/hash/join.
    "q_image_phash" ->
      """SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b,
        |       CAST(((d1.doc_id // 3) % 2) AS INTEGER) AS hamming
        |FROM documents d1
        |JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
        |WHERE d1.doc_id % 3 = 0""".stripMargin,
    // Same planted arithmetic as q_image_phash over the independent
    // 17×8 fixture stream (see phash128FixtureBytes): the 128-bit
    // widening must find exactly the same doc-id pair structure.
    "q_image_phash128" ->
      """SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b,
        |       CAST(((d1.doc_id // 3) % 2) AS INTEGER) AS hamming
        |FROM documents d1
        |JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
        |WHERE d1.doc_id % 3 = 0""".stripMargin,
    // Every field of the planted-container metadata is a pure function of
    // doc_id (see imageFixtureBytes): the oracle recomputes the expected
    // parse results arithmetically — an independent formulation of the
    // format spec, not of the parser.
    "q_image_meta" ->
      """WITH m AS (SELECT doc_id,
        |    doc_id % 7 AS f,
        |    CAST(doc_id % 317 + 1 AS INTEGER) AS w,
        |    CAST(doc_id % 211 + 1 AS INTEGER) AS h,
        |    doc_id % 50 + 1 AS n,
        |    doc_id % 5 AS ct,
        |    doc_id % 2 AS par,
        |    doc_id % 3 AS wv,
        |    doc_id % 8 AS gd,
        |    doc_id % 3 + 1 AS tc,
        |    doc_id % 5 AS td
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CASE f WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'bmp'
        |    WHEN 3 THEN 'stub' WHEN 4 THEN 'gif' WHEN 5 THEN 'webp'
        |    ELSE 'tiff' END AS format,
        |  CASE WHEN f = 3 THEN CAST(16 + n % 64 AS INTEGER) ELSE w END AS width,
        |  CASE WHEN f = 3 THEN CAST(16 + (n * 7) % 64 AS INTEGER) ELSE h END AS height,
        |  CAST(CASE
        |    WHEN f = 0 THEN CASE ct WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 1
        |      WHEN 3 THEN 2 ELSE 4 END
        |    WHEN f = 1 THEN CASE WHEN par = 0 THEN 3 ELSE 1 END
        |    WHEN f = 4 THEN 1
        |    WHEN f = 5 THEN CASE WHEN wv = 0 THEN 3
        |      WHEN par = 0 THEN 4 ELSE 3 END
        |    WHEN f = 6 THEN tc
        |    ELSE 3 END AS INTEGER) AS channels,
        |  CAST(CASE
        |    WHEN f = 0 THEN CASE WHEN ct = 2 THEN 8 WHEN par = 0 THEN 8 ELSE 16 END
        |    WHEN f = 4 THEN gd + 1
        |    WHEN f = 6 THEN CASE WHEN td = 0 THEN 16 ELSE 8 END
        |    ELSE 8 END AS INTEGER) AS bit_depth,
        |  CAST(CASE f WHEN 0 THEN 45
        |    WHEN 1 THEN 47 + 3 * (CASE WHEN par = 0 THEN 3 ELSE 1 END)
        |    WHEN 2 THEN 54
        |    WHEN 3 THEN n
        |    WHEN 4 THEN 14
        |    WHEN 5 THEN CASE WHEN wv = 1 THEN 25 ELSE 30 END
        |    ELSE 62 + CASE WHEN tc = 1 THEN 0 ELSE 2 * tc END
        |    END AS INTEGER) AS n_bytes
        |FROM m""".stripMargin,
    // Same planted arithmetic as q_image_phash over the PCM envelope
    // fixtures (see audioPhashFixtureBytes): docs 3g/3g+1 are one
    // recording in two container layouts, envelope Hamming g % 2.
    "q_audio_phash" ->
      """SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b,
        |       CAST(((d1.doc_id // 3) % 2) AS INTEGER) AS hamming
        |FROM documents d1
        |JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
        |WHERE d1.doc_id % 3 = 0""".stripMargin,
    // Decoded-sample equality holds exactly for the EVEN-g planted
    // twins (odd g flips envelope bit 63 → the last block's amplitudes
    // differ); byte equality holds for none (junk-chunk layout).
    "q_audio_exact" ->
      """SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b
        |FROM documents d1
        |JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
        |WHERE d1.doc_id % 3 = 0 AND (d1.doc_id // 3) % 2 = 0""".stripMargin,
    // Every field of the planted audio metadata is a pure function of
    // doc_id (see audioFixtureBytes) — the oracle recomputes the expected
    // WAV/FLAC/stub parses arithmetically.
    "q_audio_meta" ->
      """WITH m AS (SELECT doc_id,
        |    doc_id % 5 AS f,
        |    CAST(doc_id % 2 + 1 AS INTEGER) AS ch,
        |    doc_id % 50 + 1 AS n
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CASE f WHEN 0 THEN 'wav' WHEN 1 THEN 'flac' WHEN 2 THEN 'stub'
        |    WHEN 3 THEN 'mp3' ELSE 'ogg' END AS format,
        |  CAST(CASE f WHEN 0 THEN 8000 + (doc_id % 4) * 8000
        |    WHEN 1 THEN 16000 + (doc_id % 5) * 8000
        |    WHEN 3 THEN CASE doc_id % 3 WHEN 0 THEN 44100
        |      WHEN 1 THEN 48000 ELSE 32000 END
        |    WHEN 4 THEN 8000 + (doc_id % 6) * 8000
        |    ELSE 16000 END AS INTEGER) AS sample_rate,
        |  CASE f WHEN 2 THEN 1
        |    WHEN 3 THEN CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END
        |    ELSE ch END AS channels,
        |  CAST(CASE f WHEN 0 THEN n
        |    WHEN 1 THEN doc_id % 100000
        |    WHEN 3 THEN (doc_id % 9999 + 1) * 1152
        |    WHEN 4 THEN doc_id % 100000
        |    ELSE n // 2 END AS BIGINT) AS n_frames,
        |  CAST(CASE f WHEN 0 THEN 44 + n * ch * 2
        |    WHEN 1 THEN 42
        |    WHEN 3 THEN CASE WHEN doc_id % 2 = 0 THEN 48
        |      ELSE 64 + (doc_id % 7) * 3 END
        |    WHEN 4 THEN 86
        |    ELSE n END AS INTEGER) AS n_bytes
        |FROM m""".stripMargin,
    // Every field of the planted video metadata is a pure function of
    // doc_id (see videoFixtureBytes) — the oracle recomputes the expected
    // MP4 box-walk results (brand, timescale, whole-second duration,
    // 16.16 dims, stsd fourcc, per-branch byte size) arithmetically.
    "q_video_meta" ->
      """WITH m AS (SELECT doc_id, doc_id % 4 AS f, doc_id % 50 + 1 AS n
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CASE WHEN f = 2 THEN 'stub' ELSE 'mp4' END AS format,
        |  CASE WHEN f = 2 THEN '' ELSE CASE doc_id % 3 WHEN 0 THEN 'isom'
        |    WHEN 1 THEN 'mp42' ELSE 'avc1' END END AS brand,
        |  CAST(CASE WHEN f = 2 THEN 0 ELSE CASE doc_id % 5 WHEN 0 THEN 1000
        |    WHEN 1 THEN 600 WHEN 2 THEN 90000 WHEN 3 THEN 48000
        |    ELSE 25 END END AS BIGINT) AS timescale,
        |  CAST(CASE WHEN f = 2 THEN 0 ELSE n * 1000 END AS BIGINT) AS duration_ms,
        |  CAST(CASE WHEN f = 2 THEN 0 ELSE doc_id % 1920 + 16 END AS INTEGER) AS width,
        |  CAST(CASE WHEN f = 2 THEN 0 ELSE doc_id % 1080 + 16 END AS INTEGER) AS height,
        |  CASE WHEN f = 2 THEN '' ELSE CASE doc_id % 7 WHEN 0 THEN 'avc1'
        |    WHEN 1 THEN 'hvc1' WHEN 2 THEN 'vp09' WHEN 3 THEN 'av01'
        |    WHEN 4 THEN 'mp4v' WHEN 5 THEN 'vp08' ELSE 'hev1' END END AS codec,
        |  CAST(CASE f WHEN 0 THEN 288 WHEN 1 THEN 312 WHEN 2 THEN n
        |    ELSE 312 END AS INTEGER) AS n_bytes
        |FROM m""".stripMargin,
    // Every emitted field of the planted EBML metadata is a pure function
    // of doc_id (see mkvFixtureBytes) — the oracle recomputes the DocType,
    // timestamp-scale (incl. the omitted-element default), integer-exact
    // tick→ms conversion, pixel dims and first-video-track codec
    // arithmetically, independent of the vint walk.
    "q_video_meta_mkv" ->
      """WITH m AS (SELECT doc_id, doc_id % 3 AS f FROM documents)
        |SELECT doc_id AS media_id,
        |  CASE WHEN f = 2 THEN 'stub' ELSE 'mkv' END AS format,
        |  CASE WHEN f = 2 THEN '' WHEN f = 0 THEN 'webm'
        |    ELSE 'matroska' END AS brand,
        |  CAST(CASE WHEN f = 2 THEN 0 ELSE CASE doc_id % 4 WHEN 0 THEN 1000
        |    WHEN 1 THEN 500 WHEN 2 THEN 2000 ELSE 4000 END END AS BIGINT) AS timescale,
        |  CAST(CASE WHEN f = 2 THEN 0
        |    ELSE (doc_id % 40 + 1) * 1000 END AS BIGINT) AS duration_ms,
        |  CAST(CASE WHEN f = 2 THEN 0 ELSE doc_id % 1280 + 16 END AS INTEGER) AS width,
        |  CAST(CASE WHEN f = 2 THEN 0 ELSE doc_id % 720 + 16 END AS INTEGER) AS height,
        |  CASE WHEN f = 2 THEN '' ELSE CASE doc_id % 5 WHEN 0 THEN 'V_VP8'
        |    WHEN 1 THEN 'V_VP9' WHEN 2 THEN 'V_AV1'
        |    WHEN 3 THEN 'V_MPEG4/ISO/AVC' ELSE 'V_THEORA' END END AS codec
        |FROM m""".stripMargin,
    // q_pics needs the normal survival function, unavailable in DuckDB; the
    // oracle is the pinned deterministic output (scipy-verified in
    // PicsSpec), SF-dispatched sf0.001 + sf0.01 blocks (MakeGoldens).
    "q_pics" -> resourceSql("q_pics_oracle.sql"),
    "q_minmax" ->
      """WITH w AS (SELECT event_id, value,
        |    min(value) OVER (PARTITION BY event_type) AS mn,
        |    max(value) OVER (PARTITION BY event_type) AS mx
        |  FROM events)
        |SELECT event_id,
        |  round(CASE WHEN mx = mn THEN 0.5 ELSE (value - mn) / (mx - mn) END, 6) AS value_norm,
        |  round(value / mx, 6) AS value_vs_max
        |FROM w""".stripMargin,
    "q_deconvolute" ->
      """WITH b AS (SELECT 'd' || CAST(l_orderkey % 500 AS VARCHAR) AS studyId,
        |    't' || CAST(l_partkey % 20 AS VARCHAR) AS trait,
        |    CAST(l_quantity AS INTEGER) AS nSamples
        |  FROM lineitem)
        |SELECT studyId,
        |  array_to_string(list_sort(list_distinct(array_agg(trait))), ',') AS traits_str,
        |  min(nSamples) AS nSamples
        |FROM b GROUP BY studyId""".stripMargin,
    "q_multimodal" ->
      """WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT media_id,
        |  CAST(16 + n % 64 AS INTEGER) AS width,
        |  CAST(16 + (n * 7) % 64 AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS channels,
        |  CAST(n AS INTEGER) AS n_bytes,
        |  CAST(len(range(0, greatest(n // 32 - 1, 0) + 1, 2)) AS BIGINT) AS n_frames
        |FROM m""".stripMargin,
    // Independent formulation on purpose: DuckDB's native ASOF JOIN vs the
    // union+window (q_asof_join) and bucketed two-phase (q_asof_bucketed)
    // Spark plans.
    "q_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS t, value
        |    FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, epoch_us(ts) AS t, max(value) AS view_value
        |    FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |j AS (SELECT l.event_id, l.user_id, l.t, l.value, r.t AS rt, r.view_value
        |    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t >= r.t)
        |SELECT event_id, user_id, t, value,
        |  CASE WHEN t - rt <= 3600000000 THEN rt END AS asofTime,
        |  CASE WHEN t - rt <= 3600000000 THEN view_value END AS view_value
        |FROM j""".stripMargin,
    "q_asof_bucketed" ->
      """WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS t, value
        |    FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, epoch_us(ts) AS t, max(value) AS view_value
        |    FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.t, l.value, r.t AS asofTime, r.view_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t <= r.t""".stripMargin,
    // Pinned golden (Datasketches HLL register-max merge is order- and
    // partitioning-insensitive, so the estimate is a pure function of the
    // input multiset + lgK), SF-dispatched sf0.001/0.01/0.1 blocks
    // (MakeGoldens). Estimates sit inside the 5% band pinned in
    // SketchOpsSpec.
    "q_hll_rollup" -> resourceSql("q_hll_rollup_oracle.sql"),
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events
        |    WHERE event_type IN ('view', 'click', 'purchase')),
        |u AS (SELECT DISTINCT user_id FROM e),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.t) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
        |    WHERE e.event_type = 'click' AND e.t > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.t) AS t3 FROM e JOIN s2 ON e.user_id = s2.user_id
        |    WHERE e.event_type = 'purchase' AND e.t > s2.t2 GROUP BY 1)
        |SELECT u.user_id,
        |  CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
        |  t1 AS stage_ts_1, t2 AS stage_ts_2, t3 AS stage_ts_3
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)""".stripMargin,
    // Same relational formulation as q_funnel but over the STREAMING fold
    // (funnelUpdate, the mapGroupsWithState state machine run in batch
    // mode): sequential per-stage minima under a strict t > prev bound.
    "q_funnel_stream_twin" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events
        |    WHERE event_type IN ('view', 'click', 'purchase')),
        |u AS (SELECT DISTINCT user_id FROM e),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.t) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
        |    WHERE e.event_type = 'click' AND e.t > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.t) AS t3 FROM e JOIN s2 ON e.user_id = s2.user_id
        |    WHERE e.event_type = 'purchase' AND e.t > s2.t2 GROUP BY 1)
        |SELECT u.user_id,
        |  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS stage_reached,
        |  t1 AS stage_ts_1, t2 AS stage_ts_2, t3 AS stage_ts_3
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)""".stripMargin,
    // The attribution stream's backfill semantics: plain time-range join,
    // each view pairs with same-user clicks in the following hour.
    "q_attrib_stream_twin" ->
      """SELECT c.user_id, epoch_us(v.ts) AS view_t, epoch_us(c.ts) AS conv_t,
        |  v.value AS view_value, c.value AS conv_value
        |FROM events c JOIN events v ON c.user_id = v.user_id
        |WHERE c.event_type = 'click' AND v.event_type = 'view'
        |  AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 1 HOUR""".stripMargin,
    "q_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS period FROM events),
        |g AS (SELECT user_id, min(period) AS cohort FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, period FROM e)
        |SELECT g.cohort, a.period - g.cohort AS offset,
        |  CAST(count(*) AS BIGINT) AS active_users
        |FROM a JOIN g ON a.user_id = g.user_id GROUP BY 1, 2""".stripMargin
    // q_pics: no oracle (normal sf unavailable in DuckDB); PicsSpec carries
    // the reference doctest golden values.
  )
}
