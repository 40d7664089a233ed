package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata, plus the decode → feature-extract → resize plumbing a training
  * pipeline needs.
  *
  * The actual media decoding is STUBBED (no codec libraries in this
  * environment): [[StubDecoder]] produces deterministic pseudo-metadata from
  * the byte stream. Everything around it — the schema, the per-partition
  * batched execution (the Scala analogue of `mapInPandas`), the partitioning
  * and the feature shapes — is real and is what would carry over when a real
  * decoder is dropped in.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)
  ))

  /** Decoded-frame metadata appended by [[decode]]. */
  val decodedSchema: StructType = StructType(mediaSchema.fields ++ Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false)
  ))

  /** Decoder: REAL header parsing for the two trivial uncompressed
    * containers (BMP and binary PPM "P6"), deterministic pseudo-dimensions
    * for everything else. Compressed formats (JPEG/PNG/video) would slot in
    * at the same seam with a codec library; the signature (bytes in →
    * dimensions + planes out) and the per-partition batched execution are
    * the real contract either way.
    */
  object StubDecoder {

    private def leInt(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

    /** BMP: 'BM' magic, little-endian width/height at offsets 18/22 of the
      * BITMAPINFOHEADER, bits-per-pixel at 28 (negative height = top-down).
      */
    def parseBmp(b: Array[Byte]): Option[(Int, Int, Int)] =
      if (b.length >= 30 && b(0) == 'B' && b(1) == 'M') {
        val w = leInt(b, 18)
        val h = math.abs(leInt(b, 22))
        val bits = (b(28) & 0xff) | ((b(29) & 0xff) << 8)
        if (w > 0 && h > 0 && bits >= 8 && bits % 8 == 0) Some((w, h, bits / 8))
        else None
      } else None

    /** Binary PPM: "P6" magic, then ASCII width/height/maxval separated by
      * whitespace, '#' comments running to end-of-line.
      */
    def parsePpm(b: Array[Byte]): Option[(Int, Int, Int)] =
      if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
        var i = 2
        def nextInt(): Option[Int] = {
          while (i < b.length &&
            (Character.isWhitespace(b(i)) || b(i) == '#')) {
            if (b(i) == '#') while (i < b.length && b(i) != '\n') i += 1
            else i += 1
          }
          val start = i
          while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
          if (i > start && i - start <= 9)
            Some(new String(b, start, i - start, "US-ASCII").toInt)
          else None
        }
        for {
          w <- nextInt(); h <- nextInt(); maxval <- nextInt()
          if w > 0 && h > 0 && maxval > 0 && maxval < 65536
        } yield (w, h, 3)
      } else None

    private def beInt(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    private def beShort(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

    /** PNG: 8-byte signature then the (spec-mandated first) IHDR chunk —
      * width/height as big-endian ints at offsets 16/20, bit depth at 24,
      * color type at 25. Pure header parse, no codec: the IDAT pixel data is
      * never touched. Returns (width, height, channels, bitDepth).
      */
    def parsePng(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      if (b.length >= 26 && sig.indices.forall(i => b(i) == sig(i)) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = beInt(b, 16)
        val h = beInt(b, 20)
        val depth = b(24) & 0xff
        val channels = (b(25) & 0xff) match {
          case 0 => 1 // grayscale
          case 2 => 3 // truecolor
          case 3 => 1 // palette index
          case 4 => 2 // gray + alpha
          case 6 => 4 // truecolor + alpha
          case _ => -1
        }
        if (w > 0 && h > 0 && channels > 0 &&
          Set(1, 2, 4, 8, 16).contains(depth)) Some((w, h, channels, depth))
        else None
      } else None
    }

    /** JPEG: SOI then a marker walk (big-endian segment lengths; RSTn/TEM
      * are standalone) to the first frame header SOF0-SOF15 (excluding
      * DHT/JPG/DAC pseudo-markers) — sample precision, height, width,
      * component count live at fixed offsets inside it. Stops at SOS/EOI.
      * Returns (width, height, channels, bitDepth).
      */
    def parseJpeg(b: Array[Byte]): Option[(Int, Int, Int, Int)] =
      if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        var i = 2
        while (i + 1 < b.length) {
          if ((b(i) & 0xff) != 0xff) return None // desynced: not a marker
          // fill bytes: 0xFF may repeat before the marker id
          var j = i
          while (j + 1 < b.length && (b(j + 1) & 0xff) == 0xff) j += 1
          val m = b(j + 1) & 0xff
          if (m == 0xd9 || m == 0xda) return None // EOI / SOS before any SOF
          if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { // standalone
            i = j + 2
          } else {
            if (j + 4 > b.length) return None
            val len = beShort(b, j + 2)
            if (len < 2) return None
            val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof) {
              if (j + 10 > b.length || len < 8) return None
              val precision = b(j + 4) & 0xff
              val h = beShort(b, j + 5)
              val w = beShort(b, j + 7)
              val ncomp = b(j + 9) & 0xff
              return if (w > 0 && h > 0 && ncomp > 0 && ncomp <= 4 && precision >= 2)
                Some((w, h, ncomp, precision))
              else None
            }
            i = j + 2 + len
          }
        }
        None
      } else None

    /** PPM maxval (the third header int) → per-channel bit depth. */
    private def ppmDepth(b: Array[Byte]): Int = {
      // re-walk the ASCII header exactly like parsePpm
      var i = 2
      var seen = 0
      var last = 255
      while (i < b.length && seen < 3) {
        while (i < b.length && (Character.isWhitespace(b(i)) || b(i) == '#')) {
          if (b(i) == '#') while (i < b.length && b(i) != '\n') i += 1
          else i += 1
        }
        val start = i
        while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
        if (i > start) { seen += 1; if (seen == 3) last = new String(b, start, i - start, "US-ASCII").toInt }
        else return 8
      }
      if (last < 256) 8 else 16
    }

    private def leShort(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    /** GIF: 6-byte "GIF87a"/"GIF89a" signature, then the Logical Screen
      * Descriptor — canvas width/height as little-endian u16 at offsets
      * 6/8, packed fields at 10 (bits 4-6: color resolution = significant
      * bits per primary minus one). GIF pixels are palette indices, so
      * channels = 1, matching the PNG color-type-3 convention above.
      * Returns (width, height, channels, bitDepth).
      */
    def parseGif(b: Array[Byte]): Option[(Int, Int, Int, Int)] =
      if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
        val w = leShort(b, 6)
        val h = leShort(b, 8)
        val depth = ((b(10) >> 4) & 7) + 1
        if (w > 0 && h > 0) Some((w, h, 1, depth)) else None
      } else None

    /** WebP: RIFF container ("RIFF" + size + "WEBP"), first chunk fourcc
      * selects the bitstream — "VP8 " lossy (9D 01 2A keyframe start code,
      * then 14-bit little-endian width/height), "VP8L" lossless (0x2F
      * signature, then a 32-bit field packing width-1 [14 bits],
      * height-1 [14 bits], alpha [1 bit]), "VP8X" extended (alpha flag bit
      * 0x10, 24-bit little-endian canvas width/height minus one). Payload
      * starts at offset 20 (12-byte RIFF header + 8-byte chunk header).
      * Returns (width, height, channels, bitDepth); lossy VP8 carries no
      * alpha plane, so channels = 3 there.
      */
    def parseWebp(b: Array[Byte]): Option[(Int, Int, Int, Int)] =
      if (b.length >= 25 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') {
        new String(b, 12, 4, "US-ASCII") match {
          case "VP8 " if b.length >= 30 &&
            (b(23) & 0xff) == 0x9d && (b(24) & 0xff) == 0x01 &&
            (b(25) & 0xff) == 0x2a =>
            val w = leShort(b, 26) & 0x3fff
            val h = leShort(b, 28) & 0x3fff
            if (w > 0 && h > 0) Some((w, h, 3, 8)) else None
          case "VP8L" if b.length >= 25 && (b(20) & 0xff) == 0x2f =>
            val bits = leInt(b, 21)
            val w = (bits & 0x3fff) + 1
            val h = ((bits >>> 14) & 0x3fff) + 1
            val alpha = (bits >>> 28) & 1
            Some((w, h, 3 + alpha, 8))
          case "VP8X" if b.length >= 30 =>
            val alpha = if ((b(20) & 0x10) != 0) 1 else 0
            val w = ((b(24) & 0xff) | ((b(25) & 0xff) << 8) |
              ((b(26) & 0xff) << 16)) + 1
            val h = ((b(27) & 0xff) | ((b(28) & 0xff) << 8) |
              ((b(29) & 0xff) << 16)) + 1
            Some((w, h, 3 + alpha, 8))
          case _ => None
        }
      } else None

    /** TIFF: 8-byte header ("II"+42 little-endian or "MM"+42 big-endian,
      * then the IFD0 offset), then a walk of IFD0's 12-byte entries for
      * ImageWidth (256), ImageLength (257), BitsPerSample (258;
      * count > 1 means the value field holds an offset to the per-channel
      * SHORT array — all channels share one depth here, the first entry is
      * read) and SamplesPerPixel (277). SHORT values sit in the FIRST two
      * bytes of the 4-byte value field in both byte orders. Spec defaults
      * apply when a tag is absent: SamplesPerPixel 1, BitsPerSample 1
      * (bilevel). Returns (width, height, channels, bitDepth).
      */
    def parseTiff(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      val le = b.length >= 8 && b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0
      val be = b.length >= 8 && b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42
      if (!le && !be) None
      else {
        def u16(off: Int): Int =
          if (le) leShort(b, off) else beShort(b, off)
        def u32(off: Int): Int =
          if (le) leInt(b, off) else beInt(b, off)
        val ifd = u32(4)
        // bounds in Long: a crafted offset near Int.MaxValue overflows
        // `ifd + 2` to negative and would sail past an Int comparison
        // straight into an ArrayIndexOutOfBounds in u16
        if (ifd < 0 || ifd.toLong + 2 > b.length) None
        else {
          val n = u16(ifd)
          var w = -1; var h = -1; var spp = 1; var bps = 1
          var i = 0
          var ok = true
          while (i < n && ok) {
            val e = ifd + 2 + i * 12
            if (e.toLong + 12 > b.length) ok = false
            else {
              val tag = u16(e)
              val typ = u16(e + 2)
              val cnt = u32(e + 4)
              def inline: Int = typ match {
                case 3 => u16(e + 8) // SHORT
                case 4 => u32(e + 8) // LONG
                case _ => -1
              }
              tag match {
                case 256 => w = inline
                case 257 => h = inline
                case 277 => spp = inline
                case 258 =>
                  bps =
                    if (cnt == 1) inline
                    else {
                      val off = u32(e + 8)
                      if (off >= 0 && off.toLong + 2 <= b.length) u16(off) else -1
                    }
                case _ =>
              }
              i += 1
            }
          }
          if (ok && w > 0 && h > 0 && spp > 0 && bps > 0)
            Some((w, h, spp, bps))
          else None
        }
      }
    }

    /** Full image metadata: (format, width, height, channels, bitDepth).
      * Real header parses for PNG / JPEG / GIF / WebP / TIFF / BMP /
      * binary PPM; the deterministic stub shape for anything else
      * (format "stub").
      */
    def imageInfo(content: Array[Byte]): (String, Int, Int, Int, Int) =
      parsePng(content).map { case (w, h, c, d) => ("png", w, h, c, d) }
        .orElse(parseJpeg(content).map { case (w, h, c, d) => ("jpeg", w, h, c, d) })
        .orElse(parseGif(content).map { case (w, h, c, d) => ("gif", w, h, c, d) })
        .orElse(parseWebp(content).map { case (w, h, c, d) => ("webp", w, h, c, d) })
        .orElse(parseTiff(content).map { case (w, h, c, d) => ("tiff", w, h, c, d) })
        .orElse(parseBmp(content).map { case (w, h, c) => ("bmp", w, h, c, 8) })
        .orElse(parsePpm(content).map { case (w, h, c) => ("ppm", w, h, c, ppmDepth(content)) })
        .getOrElse {
          val n = content.length
          ("stub", 16 + n % 64, 16 + (n * 7) % 64, 3, 8)
        }

    def dimensions(content: Array[Byte]): (Int, Int, Int) = {
      val (_, w, h, c, _) = imageInfo(content)
      (w, h, c)
    }

    /** WAV (RIFF/WAVE, PCM): walk the chunk list for `fmt ` (channels at
      * +2, sample rate at +4, bits-per-sample at +14) and `data` (payload
      * size → frame count). Returns (sampleRate, channels, nFrames).
      */
    def parseWav(b: Array[Byte]): Option[(Int, Int, Long)] =
      if (b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
        var i = 12
        var rate = 0
        var channels = 0
        var bitsPerSample = 0
        var dataBytes = -1L
        while (i + 8 <= b.length && (rate == 0 || dataBytes < 0)) {
          val id = new String(b, i, 4, "US-ASCII")
          val size = leInt(b, i + 4).toLong & 0xffffffffL
          if (id == "fmt " && i + 24 <= b.length) {
            channels = (b(i + 10) & 0xff) | ((b(i + 11) & 0xff) << 8)
            rate = leInt(b, i + 12)
            bitsPerSample = (b(i + 22) & 0xff) | ((b(i + 23) & 0xff) << 8)
          } else if (id == "data") {
            dataBytes = size
          }
          // Bounded advance (chunks are 2-byte aligned): a corrupt chunk
          // size ≥ 2^31 would turn `size.toInt` negative and drive `i`
          // backwards/negative — end the walk instead of throwing, so the
          // Option contract (None → stub fallback) holds on garbage input.
          val next = i.toLong + 8L + size + (size & 1L)
          i = if (next > b.length) b.length else next.toInt
        }
        if (rate > 0 && channels > 0 && bitsPerSample >= 8 && dataBytes >= 0)
          Some((rate, channels, dataBytes / (channels * (bitsPerSample / 8))))
        else None
      } else None

    /** FLAC: "fLaC" magic then the spec-mandated first metadata block,
      * STREAMINFO (type 0, 34 bytes). The packed field at offsets 18-25
      * carries sample rate (20 bits), channels−1 (3 bits), bits-per-
      * sample−1 (5 bits) and total samples (36 bits). Pure header parse —
      * the frame stream is never touched. Returns
      * (sampleRate, channels, totalSamples).
      */
    def parseFlac(b: Array[Byte]): Option[(Int, Int, Long)] =
      if (b.length >= 42 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
        b(3) == 'C' && (b(4) & 0x7f) == 0 && // first block must be STREAMINFO
        (((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)) == 34) {
        val rate = ((b(18) & 0xff) << 12) | ((b(19) & 0xff) << 4) |
          ((b(20) & 0xff) >> 4)
        val channels = ((b(20) >> 1) & 0x7) + 1
        val bps = (((b(20) & 0x1) << 4) | ((b(21) & 0xff) >> 4)) + 1
        val totalSamples = ((b(21) & 0xfL) << 32) |
          ((b(22) & 0xffL) << 24) | ((b(23) & 0xffL) << 16) |
          ((b(24) & 0xffL) << 8) | (b(25) & 0xffL)
        if (rate > 0 && bps >= 4) Some((rate, channels, totalSamples))
        else None
      } else None

    /** MPEG-1/2/2.5 Layer I-III sample-rate tables, indexed by the header's
      * 2-bit version field (0 = MPEG2.5, 2 = MPEG2, 3 = MPEG1; 1 reserved).
      */
    private val Mp3Rates: Map[Int, Array[Int]] = Map(
      3 -> Array(44100, 48000, 32000),
      2 -> Array(22050, 24000, 16000),
      0 -> Array(11025, 12000, 8000))

    /** MPEG-1 Layer III bitrate table (kbps), indexed by the 4-bit bitrate
      * field — used only for the CBR frame-count estimate when neither a
      * Xing/Info nor a VBRI header is present. MPEG-2/2.5 Layer III column.
      */
    private val Mp3BitrateV1L3 =
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    private val Mp3BitrateV2L3 =
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

    /** MP3 (MPEG audio, Layer III): optional ID3v2 skip (synchsafe size),
      * then the 4-byte frame header — version / sample-rate index / channel
      * mode. The total sample count comes from the VBR headers when present
      * (Xing/Info after the version+mode-sized side info, VBRI at the fixed
      * +36 offset — both big-endian frame counts), else from the CBR
      * estimate payload/frameLength. Pure header parse: the MDCT bitstream
      * is never touched. Returns (sampleRate, channels, totalSamples).
      */
    def parseMp3(b: Array[Byte]): Option[(Int, Int, Long)] = {
      val off: Long =
        if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
          10L + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
            ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)).toLong
        else 0L
      // Long guard: a crafted synchsafe size near 2^28 must not overflow
      if (off + 4 > b.length) None
      else {
        val o = off.toInt
        val sync = (b(o) & 0xff) == 0xff && (b(o + 1) & 0xe0) == 0xe0
        val version = (b(o + 1) >> 3) & 0x3
        val layer = (b(o + 1) >> 1) & 0x3 // 1 = Layer III
        val bri = (b(o + 2) >> 4) & 0xf
        val sri = (b(o + 2) >> 2) & 0x3
        val padding = (b(o + 2) >> 1) & 0x1
        val mode = (b(o + 3) >> 6) & 0x3 // 3 = mono
        if (!sync || layer != 1 || sri == 3 || !Mp3Rates.contains(version)) None
        else {
          val rate = Mp3Rates(version)(sri)
          val channels = if (mode == 3) 1 else 2
          val samplesPerFrame = if (version == 3) 1152L else 576L
          def tagAt(p: Int, t: String): Boolean =
            p >= 0 && p.toLong + t.length <= b.length &&
              t.indices.forall(i => b(p + i) == t.charAt(i))
          // Xing/Info sits after the side info, whose size is a function of
          // version and channel mode (MPEG1: 17 mono / 32 stereo; MPEG2/2.5:
          // 9 / 17); flags bit 0 = the frames field is present.
          val sideInfo =
            if (version == 3) { if (mode == 3) 17 else 32 }
            else { if (mode == 3) 9 else 17 }
          val xo = o + 4 + sideInfo
          val xingFrames =
            if ((tagAt(xo, "Xing") || tagAt(xo, "Info")) &&
              xo + 12 <= b.length && (beInt(b, xo + 4) & 1) == 1)
              Some(beInt(b, xo + 8).toLong & 0xffffffffL)
            else None
          // VBRI (Fraunhofer): fixed 32 bytes after the header; the frame
          // count is the big-endian int at +14.
          val vo = o + 36
          val vbriFrames =
            if (tagAt(vo, "VBRI") && vo + 18 <= b.length)
              Some(beInt(b, vo + 14).toLong & 0xffffffffL)
            else None
          val frames = xingFrames.orElse(vbriFrames).orElse {
            // CBR estimate: frameLen = coef·bitrate/rate (+padding), count
            // whole frames in the payload after the tag prefix.
            val table = if (version == 3) Mp3BitrateV1L3 else Mp3BitrateV2L3
            val kbps = table(bri)
            if (kbps == 0) None
            else {
              val coef = if (version == 3) 144000L else 72000L
              val frameLen = coef * kbps / rate + padding
              Some((b.length - o) / frameLen)
            }
          }
          frames.map(f => (rate, channels, f * samplesPerFrame))
        }
      }
    }

    /** Ogg Vorbis: the BOS page ("OggS", version 0, header-type BOS bit)
      * carries the Vorbis identification header as its first packet
      * (0x01 "vorbis", channels u8 at +11, sample rate u32 LE at +12); the
      * stream's total PCM sample count is the granule position of the LAST
      * page — found by scanning backwards for the final "OggS" capture
      * pattern, exactly how players compute duration without decoding.
      * Page headers only, no packet decode. Returns
      * (sampleRate, channels, totalSamples).
      */
    def parseOgg(b: Array[Byte]): Option[(Int, Int, Long)] =
      if (b.length >= 58 && b(0) == 'O' && b(1) == 'g' && b(2) == 'g' &&
        b(3) == 'S' && b(4) == 0 && (b(5) & 0x02) != 0) {
        val nSegs = b(26) & 0xff
        val packetStart = 27 + nSegs
        if (packetStart + 16 > b.length || nSegs < 1) None
        else if (b(packetStart) == 0x01 && b(packetStart + 1) == 'v' &&
          b(packetStart + 2) == 'o' && b(packetStart + 3) == 'r' &&
          b(packetStart + 4) == 'b' && b(packetStart + 5) == 'i' &&
          b(packetStart + 6) == 's') {
          val channels = b(packetStart + 11) & 0xff
          val rate = leInt(b, packetStart + 12)
          // last page's granule position = total PCM samples
          var i = b.length - 14 // need 6 header bytes + 8 granule bytes
          var granule = -1L
          while (i >= 0 && granule < 0) {
            if (b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' &&
              b(i + 3) == 'S' && b(i + 4) == 0) {
              granule = (0 until 8).map(k =>
                (b(i + 6 + k) & 0xffL) << (8 * k)).reduce(_ | _)
            }
            i -= 1
          }
          if (rate > 0 && channels > 0 && granule >= 0)
            Some((rate, channels, granule))
          else None
        } else None
      } else None

    /** Audio metadata: real for WAV and FLAC payloads, deterministic
      * pseudo-values otherwise (16 kHz mono, 16-bit → nFrames = bytes/2).
      */
    def audioInfo(content: Array[Byte]): (Int, Int, Long) =
      parseWav(content)
        .orElse(parseFlac(content))
        .orElse(parseMp3(content))
        .orElse(parseOgg(content))
        .getOrElse((16000, 1, content.length.toLong / 2))

    /** Audio metadata plus the detected container:
      * (format, sampleRate, channels, nFrames).
      */
    def audioMetaInfo(content: Array[Byte]): (String, Int, Int, Long) =
      parseWav(content).map { case (r, c, f) => ("wav", r, c, f) }
        .orElse(parseFlac(content).map { case (r, c, f) => ("flac", r, c, f) })
        .orElse(parseMp3(content).map { case (r, c, f) => ("mp3", r, c, f) })
        .orElse(parseOgg(content).map { case (r, c, f) => ("ogg", r, c, f) })
        .getOrElse(("stub", 16000, 1, content.length.toLong / 2))

    /** MP4/ISO-BMFF container metadata from a pure box walk — the video
      * twin of the image/audio marker walks; no bitstream decode, so it
      * runs at scan speed on arbitrarily large payloads. Walks top-level
      * boxes for `ftyp` (major brand) and `moov`, then moov → `mvhd`
      * (version 0: u32 timescale/duration; version 1: u32 timescale,
      * u64 duration), moov → `trak` → `tkhd` (16.16 fixed width/height
      * at version-dependent offsets; the first trak with nonzero
      * presentation size wins — audio traks carry 0×0) and trak →
      * `mdia` → `minf` → `stbl` → `stsd` (first sample-entry fourcc =
      * codec). Box sizes are read as unsigned into Long (size 1 → u64
      * largesize at +8, size 0 → to end of enclosing range); any size
      * that is non-sensical (< 8, or past the enclosing range) ends
      * that level's walk — a corrupt shard degrades to None / partial
      * fields, never throws. Returns
      * (brand, timescale, durationMs, width, height, codec); None
      * unless both ftyp and mvhd parse.
      */
    def parseMp4(b: Array[Byte]): Option[(String, Long, Long, Int, Int, String)] = {
      def u32(off: Int): Long =
        ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
          ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
      def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
      def u16(off: Int): Int = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
      def fourcc(off: Int): String = new String(b, off, 4, "US-ASCII")
      /** Children of [start, end): (type, payloadStart, payloadEnd). */
      def boxes(start: Long, end: Long): Seq[(String, Long, Long)] = {
        val out = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
        var i = start
        var ok = true
        while (ok && i + 8 <= end) {
          val size0 = u32(i.toInt)
          val tpe = fourcc(i.toInt + 4)
          val (boxEnd, payloadStart) =
            if (size0 == 0L) (end, i + 8) // box extends to the range end
            else if (size0 == 1L) {
              if (i + 16 > end) (end + 1, i + 16) // truncated largesize
              else (i + u64(i.toInt + 8), i + 16)
            } else (i + size0, i + 8)
          if (size0 != 0L && size0 != 1L && size0 < 8L) ok = false // desync
          else if (boxEnd > end || payloadStart > boxEnd) ok = false // overrun
          else {
            out += ((tpe, payloadStart, boxEnd))
            i = boxEnd
          }
        }
        out.toSeq
      }
      if (b.length < 16) return None
      // sniff: the first box must be a known top-level type (ftyp
      // canonically first) — cheap rejection of non-ISO-BMFF payloads
      if (fourcc(4) != "ftyp") return None
      val top = boxes(0L, b.length.toLong)
      val brand = top.collectFirst {
        case ("ftyp", s, e) if s + 4 <= e => fourcc(s.toInt)
      }
      val moov = top.collectFirst { case ("moov", s, e) => (s, e) }
      val mvhd = moov.flatMap { case (s, e) =>
        boxes(s, e).collectFirst {
          case ("mvhd", ms, me) if ms + 4 <= me =>
            val v = b(ms.toInt) & 0xff
            if (v == 1 && ms + 4 + 28 <= me)
              (u32(ms.toInt + 4 + 16), u64(ms.toInt + 4 + 20))
            else if (v == 0 && ms + 4 + 16 <= me)
              (u32(ms.toInt + 4 + 8), u32(ms.toInt + 4 + 12))
            else (0L, 0L)
        }
      }
      if (brand.isEmpty || mvhd.isEmpty) return None
      val traks = moov.toSeq.flatMap { case (s, e) =>
        boxes(s, e).collect { case ("trak", ts, te) => (ts, te) }
      }
      // first trak with a nonzero 16.16 presentation size (video)
      val dims = traks.iterator.flatMap { case (ts, te) =>
        boxes(ts, te).collectFirst {
          case ("tkhd", hs, he) if hs + 4 <= he =>
            val v = b(hs.toInt) & 0xff
            val wOff = if (v == 1) hs + 4 + 84 else hs + 4 + 72
            if (wOff + 8 <= he) (u16(wOff.toInt), u16(wOff.toInt + 4))
            else (0, 0)
        }.filter { case (w, h) => w > 0 && h > 0 }
      }.toSeq.headOption.getOrElse((0, 0))
      val codec = traks.iterator.flatMap { case (ts, te) =>
        for {
          (ms, me) <- boxes(ts, te).collectFirst { case ("mdia", x, y) => (x, y) }
          (ns, ne) <- boxes(ms, me).collectFirst { case ("minf", x, y) => (x, y) }
          (ss, se) <- boxes(ns, ne).collectFirst { case ("stbl", x, y) => (x, y) }
          (ds, de) <- boxes(ss, se).collectFirst { case ("stsd", x, y) => (x, y) }
          // stsd payload: ver/flags(4) + entry_count(4) + first entry
          // (size(4) + fourcc(4) + …)
          if ds + 16 <= de
        } yield fourcc(ds.toInt + 12)
      }.toSeq.headOption.getOrElse("")
      val (timescale, duration) = mvhd.get
      val durationMs =
        if (timescale > 0) duration * 1000L / timescale else 0L
      Some((brand.get, timescale, durationMs, dims._1, dims._2, codec))
    }

    /** Matroska/WebM (EBML) metadata — the second dominant crawl video
      * container, same marker-walk family as [[parseMp4]]'s box walk but
      * with variable-length integers: an element is an ID vint (marker
      * bit KEPT, ≤ 4 bytes) + a size vint (marker bit STRIPPED, ≤ 8
      * bytes, all-ones data = unknown size, legal for Segment-like
      * masters: the element runs to its parent's end) + payload. Walks
      * EBML header → DocType, Segment → Info (TimestampScale default
      * 1,000,000 ns — elements are OPTIONAL with spec defaults —
      * Duration as a 4- or 8-byte float in scale ticks) and Tracks →
      * first VIDEO TrackEntry (TrackType 1; audio entries before it are
      * skipped, the trak-precedence rule of the MP4 walk) for
      * CodecID + PixelWidth/PixelHeight, falling back to the first
      * track's codec when no video track exists.
      *
      * Same bounded-advance hardening as the box walk: every vint and
      * payload bound is checked against the parent range, malformed
      * lengths end the walk (desync discipline), truncation never
      * throws. Returns (docType, timescale ticks/s = 1e9 /
      * TimestampScale, durationMs, width, height, codecId).
      */
    def parseMkv(b: Array[Byte]): Option[(String, Long, Long, Int, Int, String)] = {
      // vint total length from the first byte's leading zeros; -1 = no
      // marker bit in 8 positions (malformed)
      def vlen(first: Int): Int = {
        var m = 0x80; var n = 1
        while (m != 0 && (first & m) == 0) { m >>= 1; n += 1 }
        if (m == 0) -1 else n
      }
      /** Children of [start, end): (id, payloadStart, payloadEnd). */
      def children(start: Int, end: Int): Seq[(Long, Int, Int)] = {
        val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Int)]()
        var i = start
        var ok = true
        while (ok && i < end) {
          val il = vlen(b(i) & 0xff)
          if (il < 0 || il > 4 || i + il > end) ok = false
          else {
            var id = 0L
            var k = 0
            while (k < il) { id = (id << 8) | (b(i + k) & 0xff); k += 1 }
            val so = i + il
            if (so >= end) ok = false
            else {
              val sl = vlen(b(so) & 0xff)
              if (sl < 0 || sl > 8 || so + sl > end) ok = false
              else {
                var sz = (b(so) & 0xff & (0xff >>> sl)).toLong
                var allOnes = sz == (0xffL >>> sl)
                k = 1
                while (k < sl) {
                  val v = b(so + k) & 0xff
                  sz = (sz << 8) | v
                  if (v != 0xff) allOnes = false
                  k += 1
                }
                val ps = so + sl
                // unknown size: element extends to the parent's end (and
                // is necessarily the last sibling)
                val peL = if (allOnes) end.toLong else ps.toLong + sz
                if (peL > end || peL < ps) ok = false
                else {
                  out += ((id, ps, peL.toInt))
                  i = peL.toInt
                }
              }
            }
          }
        }
        out.toSeq
      }
      def uint(s: Int, e: Int): Long = {
        var v = 0L
        var i = s
        while (i < e && i - s < 8) { v = (v << 8) | (b(i) & 0xff); i += 1 }
        v
      }
      def float(s: Int, e: Int): Double = (e - s) match {
        case 4 => java.lang.Float.intBitsToFloat(uint(s, e).toInt).toDouble
        case 8 => java.lang.Double.longBitsToDouble(uint(s, e))
        case _ => 0.0
      }
      def str(s: Int, e: Int): String = new String(b, s, e - s, "US-ASCII")

      // sniff: the stream must open with the EBML header element
      if (b.length < 4 || (b(0) & 0xff) != 0x1a || (b(1) & 0xff) != 0x45 ||
        (b(2) & 0xff) != 0xdf || (b(3) & 0xff) != 0xa3) return None
      val top = children(0, b.length)
      val ebml = top.collectFirst { case (0x1a45dfa3L, s, e) => (s, e) }
      val seg = top.collectFirst { case (0x18538067L, s, e) => (s, e) }
      if (ebml.isEmpty || seg.isEmpty) return None
      val docType = children(ebml.get._1, ebml.get._2)
        .collectFirst { case (0x4282L, s, e) => str(s, e) }
        .getOrElse("matroska") // spec default
      val segKids = children(seg.get._1, seg.get._2)
      val info = segKids.collectFirst { case (0x1549a966L, s, e) => (s, e) }
      val tsScale = info.flatMap { case (s, e) =>
        children(s, e).collectFirst { case (0x2ad7b1L, ds, de) => uint(ds, de) }
      }.getOrElse(1000000L) // spec default: 1 ms ticks
      val durTicks = info.flatMap { case (s, e) =>
        children(s, e).collectFirst { case (0x4489L, ds, de) => float(ds, de) }
      }.getOrElse(0.0)
      val entries = segKids.collectFirst { case (0x1654ae6bL, s, e) => (s, e) }
        .toSeq.flatMap { case (s, e) =>
          children(s, e).collect { case (0xaeL, ts, te) => children(ts, te) }
        }
      def codecOf(kids: Seq[(Long, Int, Int)]): String =
        kids.collectFirst { case (0x86L, s, e) => str(s, e) }.getOrElse("")
      val video = entries.find(kids =>
        kids.collectFirst { case (0x83L, s, e) => uint(s, e) }.contains(1L))
      val (w, h) = video.flatMap { kids =>
        kids.collectFirst { case (0xe0L, s, e) =>
          val v = children(s, e)
          (v.collectFirst { case (0xb0L, ws, we) => uint(ws, we).toInt }.getOrElse(0),
            v.collectFirst { case (0xbaL, hs, he) => uint(hs, he).toInt }.getOrElse(0))
        }
      }.getOrElse((0, 0))
      val codec = video.map(codecOf)
        .orElse(entries.headOption.map(codecOf)).getOrElse("")
      val timescale = if (tsScale > 0) 1000000000L / tsScale else 0L
      val durationMs = math.rint(durTicks * tsScale / 1e6).toLong
      Some((docType, timescale, durationMs, w, h, codec))
    }

    /** Video metadata plus the detected container:
      * (format, brand, timescale, durationMs, width, height, codec).
      * MKV/WebM rows report the EBML DocType as the brand.
      */
    def videoMetaInfo(content: Array[Byte])
        : (String, String, Long, Long, Int, Int, String) =
      parseMp4(content)
        .map { case (br, ts, ms, w, h, c) => ("mp4", br, ts, ms, w, h, c) }
        .orElse(parseMkv(content)
          .map { case (dt, ts, ms, w, h, c) => ("mkv", dt, ts, ms, w, h, c) })
        .getOrElse(("stub", "", 0L, 0L, 0, 0, ""))

    /** Deterministic fake embedding: a rolling byte checksum folded into
      * `dims` buckets — stands in for a vision encoder's output shape.
      */
    def embed(content: Array[Byte], dims: Int): Array[Float] = {
      val acc = new Array[Float](dims)
      var i = 0
      while (i < content.length) {
        acc(i % dims) += (content(i) & 0xff) / 255.0f
        i += 1
      }
      acc
    }
  }

  /** Decode payloads per partition — batched iterator processing, the Scala
    * analogue of `mapInPandas`: one decoder instance per partition, rows
    * streamed through it (no per-row setup cost, no driver round trip).
    */
  def decode(media: DataFrame): DataFrame = {
    val outSchema = decodedSchema
    val enc = Encoders.row(outSchema)
    media.mapPartitions { rows =>
      // per-partition decoder setup would go here (codec contexts etc.)
      rows.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        val (w, h, c) = StubDecoder.dimensions(content)
        Row.fromSeq(r.toSeq ++ Seq(w, h, c, content.length))
      }
    }(enc)
  }

  /** Image-metadata row emitted by [[imageMeta]]. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false)
  ))

  /** Container-level image metadata (format, dimensions, channels, per-
    * channel bit depth) from pure header parses — PNG IHDR, JPEG SOF,
    * BMP BITMAPINFOHEADER, binary PPM; no pixel decode, so it runs at scan
    * speed on arbitrarily large payloads. Same per-partition batched shape
    * as [[decode]].
    */
  def imageMeta(media: DataFrame): DataFrame = {
    val enc = Encoders.row(imageMetaSchema)
    // positional access: upstream mapPartitions rows carry no field schema
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val content = r.getAs[Array[Byte]](contentIdx)
        val (fmt, w, h, c, d) = StubDecoder.imageInfo(content)
        Row(r.getLong(idIdx), fmt, w, h, c, d, content.length)
      }
    }(enc)
  }

  /** Row-major top-down 8-bit grayscale decode of the containers decodable
    * without a codec library — 24-bit BMP (BITMAPINFOHEADER, bottom-up
    * rows unless biHeight < 0, each row padded to a 4-byte boundary, BGR
    * byte order, pixel-array offset from the file header), binary PPM "P6"
    * with maxval < 256 (RGB, top-down, no padding), and non-interlaced
    * 8-bit PNG via [[pngPixels]] (JDK zlib inflate + the five PNG
    * defilters — gray/RGB/gray+alpha/RGBA). Luma = (299·R + 587·G +
    * 114·B) / 1000 in integer arithmetic (BT.601 weights, exact for gray
    * pixels, identical across all three containers). Returns (width,
    * height, luma row-major top-down) or None for any other container or
    * a truncated payload — the perceptual-hash operators SKIP such rows
    * rather than hash garbage (JPEG/video would slot in at the same seam
    * with a codec library, exactly like [[decode]]'s contract).
    */
  def grayPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def leInt(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    StubDecoder.parseBmp(b) match {
      case Some((w, h, 3)) =>
        val off = leInt(10)
        val topDown = leInt(22) < 0
        // stride and the payload bound in LONG: parseBmp only requires
        // w > 0, so an adversarial header width near 2^31/3 would make an
        // Int `w * 3` wrap negative, pass the bound check, and then throw
        // (NegativeArraySizeException / AIOOBE) — a corrupt shard must be
        // SKIPPED, not kill the task (the WAV parser's bounded-advance
        // discipline, applied here)
        val stride = (w.toLong * 3 + 3) & ~3L
        if (off < 54 || w.toLong * h > Int.MaxValue ||
          off.toLong + stride * h > b.length) None
        else {
          val strideI = stride.toInt // stride * h <= b.length fits Int
          val out = new Array[Int](w * h)
          var r = 0
          while (r < h) {
            val srcRow = if (topDown) r else h - 1 - r
            var i = off + srcRow * strideI
            var c = 0
            while (c < w) {
              val bl = b(i) & 0xff
              val gr = b(i + 1) & 0xff
              val rd = b(i + 2) & 0xff
              out(r * w + c) = (299 * rd + 587 * gr + 114 * bl) / 1000
              c += 1
              i += 3
            }
            r += 1
          }
          Some((w, h, out))
        }
      case _ =>
        StubDecoder.parsePpm(b) match {
          case Some((w, h, _)) =>
            // re-walk the ASCII header for the pixel-data offset: three
            // ints, '#' comments to end-of-line, then EXACTLY ONE
            // whitespace byte before the binary payload (PPM spec)
            var i = 2
            var seen = 0
            var maxval = 255
            while (i < b.length && seen < 3) {
              while (i < b.length &&
                (Character.isWhitespace(b(i)) || b(i) == '#')) {
                if (b(i) == '#') while (i < b.length && b(i) != '\n') i += 1
                else i += 1
              }
              val start = i
              while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
              if (i > start) {
                seen += 1
                if (seen == 3)
                  maxval = new String(b, start, i - start, "US-ASCII").toInt
              } else return None
            }
            val off = i + 1 // the single post-maxval whitespace byte
            if (seen < 3 || maxval > 255 ||
              off.toLong + 3L * w * h > b.length) None
            else {
              val out = new Array[Int](w * h)
              var k = 0
              var j = off
              while (k < w * h) {
                val rd = b(j) & 0xff
                val gr = b(j + 1) & 0xff
                val bl = b(j + 2) & 0xff
                out(k) = (299 * rd + 587 * gr + 114 * bl) / 1000
                k += 1
                j += 3
              }
              Some((w, h, out))
            }
          case _ => pngPixels(b)
        }
    }
  }

  /** Full PNG pixel decode for the dominant lossless web container —
    * non-interlaced 8-bit-per-sample images, color types 0 (gray),
    * 2 (RGB), 4 (gray+alpha) and 6 (RGBA). Unlike JPEG/video this needs
    * no codec library: zlib inflate ([[java.util.zip.Inflater]], in the
    * JDK) plus the five PNG defilter types (None/Sub/Up/Average/Paeth,
    * RFC 2083 §6) IS the complete decoder for this subset. Alpha is
    * ignored for luma (hashes must not change when an opaque alpha plane
    * is added); RGB luma uses the same BT.601 integer weights as the
    * BMP/PPM paths, so the same pixels stored as PNG, BMP or PPM decode
    * to the IDENTICAL plane and land at dHash Hamming 0 — the
    * format-crossing duplicate byte-level dedup cannot see.
    *
    * Skip-not-throw discipline (the corrupt-shard rule of [[grayPixels]]):
    * palette/16-bit/interlaced images, truncated chunk walks, short or
    * malformed deflate streams, filter bytes > 4 and adversarial
    * dimensions all return None. Decoded size is bounded BEFORE any
    * allocation (≤ 1 GiB raw), so a hostile IHDR cannot OOM a task.
    */
  private def pngPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val hdr = StubDecoder.parsePng(b)
    if (hdr.isEmpty || b.length < 33) return None
    val (w, h, ch, depth) = hdr.get
    val colorType = b(25) & 0xff
    // IHDR layout: depth@24, color@25, compression@26, filter@27, interlace@28
    if (depth != 8 || colorType == 3 || (b(26) & 0xff) != 0 ||
      (b(27) & 0xff) != 0 || (b(28) & 0xff) != 0) return None
    val stride = w.toLong * ch
    val rawLen = h.toLong * (1L + stride)
    if (w.toLong * h > Int.MaxValue || rawLen > (1L << 30)) return None
    // chunk walk: collect every IDAT payload (the zlib stream may be split
    // across chunks at arbitrary byte positions) until IEND; any overrun
    // of a declared length is a truncated shard -> skip
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8
    var done = false
    while (!done) {
      if (off + 8 > b.length) return None // ran out before IEND
      val len = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
      val typ = new String(b, off + 4, 4, "US-ASCII")
      if (len < 0 || off + 12L + len > b.length) return None
      if (typ == "IDAT") idat.write(b, off + 8, len)
      if (typ == "IEND") done = true
      off += 12 + len
    }
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      var stalled = false
      while (got < raw.length && !inf.finished() && !stalled) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
        got += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    if (got < raw.length) return None // short pixel stream
    // defilter in place, row by row: prev = reconstructed previous row
    val out = new Array[Int](w * h)
    val strideI = stride.toInt
    val cur = new Array[Int](strideI)
    val prev = new Array[Int](strideI)
    var r = 0
    while (r < h) {
      val base = r * (1 + strideI)
      val ft = raw(base) & 0xff
      if (ft > 4) return None
      var i = 0
      while (i < strideI) {
        val x = raw(base + 1 + i) & 0xff
        val a = if (i >= ch) cur(i - ch) else 0
        val u = if (r > 0) prev(i) else 0
        val c = if (r > 0 && i >= ch) prev(i - ch) else 0
        cur(i) = ft match {
          case 0 => x
          case 1 => (x + a) & 0xff
          case 2 => (x + u) & 0xff
          case 3 => (x + (a + u) / 2) & 0xff
          case _ => // Paeth predictor (RFC 2083)
            val p = a + u - c
            val pa = math.abs(p - a); val pb = math.abs(p - u)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) u else c
            (x + pred) & 0xff
        }
        i += 1
      }
      var col = 0
      while (col < w) {
        val j = col * ch
        out(r * w + col) = colorType match {
          case 0 | 4 => cur(j) // gray (alpha ignored)
          case _ => (299 * cur(j) + 587 * cur(j + 1) + 114 * cur(j + 2)) / 1000
        }
        col += 1
      }
      System.arraycopy(cur, 0, prev, 0, strideI)
      r += 1
    }
    Some((w, h, out))
  }

  /** Area-mean downsample of a decoded luma plane to a gw×gh grid: cell
    * (r,c) is the integer mean over pixel block rows [r·h/gh, (r+1)·h/gh)
    * × cols [c·w/gw, (c+1)·w/gw). Deterministic integer arithmetic — no
    * float resampling, so two decodes of the same pixels always hash
    * identically. None when the image is smaller than the grid.
    */
  private def lumaGrid(
      w: Int, h: Int, px: Array[Int], gw: Int, gh: Int): Option[Array[Int]] =
    if (w < gw || h < gh) None
    else Some {
      val g = new Array[Int](gw * gh)
      var r = 0
      while (r < gh) {
        val r0 = r * h / gh
        val r1 = (r + 1) * h / gh
        var c = 0
        while (c < gw) {
          val c0 = c * w / gw
          val c1 = (c + 1) * w / gw
          // Long accumulator: a legitimately decodable ~540M+ pixel image
          // puts >8.4M pixels (×255) in one cell — an Int sum overflows
          // SILENTLY there, corrupting a hash documented as EXACT
          var s = 0L
          var i = r0
          while (i < r1) {
            var j = c0
            while (j < c1) { s += px(i * w + j); j += 1 }
            i += 1
          }
          g(r * gw + c) = (s / ((r1 - r0).toLong * (c1 - c0))).toInt
          c += 1
        }
        r += 1
      }
      g
    }

  /** 64-bit difference hash (dHash): [[grayPixels]] → 9×8 area-mean luma
    * grid → bit (r,c) set iff grid(r,c) < grid(r,c+1) (8 horizontal
    * gradient comparisons × 8 rows). Content-level — the same pixels
    * stored as BMP and as PPM hash IDENTICALLY, which is exactly what
    * byte-level dedup cannot see. None for undecodable or sub-grid
    * payloads.
    */
  def dHash64(b: Array[Byte]): Option[Long] =
    grayPixels(b).flatMap { case (w, h, px) =>
      lumaGrid(w, h, px, 9, 8).map { g =>
        var bits = 0L
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            if (g(r * 9 + c) < g(r * 9 + c + 1)) bits |= 1L << (r * 8 + c)
            c += 1
          }
          r += 1
        }
        bits
      }
    }

  /** 64-bit average hash (aHash): 8×8 area-mean luma grid, bit k set iff
    * cell k exceeds the integer grid mean. Coarser than [[dHash64]]
    * (global threshold vs local gradients) but cheap and
    * illumination-shift tolerant; same exactness/skip contract.
    */
  def aHash64(b: Array[Byte]): Option[Long] =
    grayPixels(b).flatMap { case (w, h, px) =>
      lumaGrid(w, h, px, 8, 8).map { g =>
        var sum = 0L
        var k = 0
        while (k < 64) { sum += g(k); k += 1 }
        val mean = sum / 64
        var bits = 0L
        k = 0
        while (k < 64) {
          if (g(k) > mean) bits |= 1L << k
          k += 1
        }
        bits
      }
    }

  /** 128-bit difference hash: [[grayPixels]] → 17×8 area-mean luma grid →
    * bit (r,c) set iff grid(r,c) < grid(r,c+1) (16 horizontal gradient
    * comparisons × 8 rows). The wide twin of [[dHash64]] for corpora past
    * the 64-bit banding saturation: at maxHamming 3 the banded join
    * splits 128 bits into four 32-BIT bands (vs 16-bit at 64 bits), so
    * band-value collisions between unrelated images stay negligible to
    * ~10^9+ images instead of saturating near 67M. Packing: element 0
    * carries rows 0–3 (bit (r%4)·16+c), element 1 rows 4–7 — band b of
    * width 32 is a contiguous slice of the logical 128-bit value. Same
    * exactness/skip contract as [[dHash64]].
    */
  def dHash128(b: Array[Byte]): Option[Array[Long]] =
    grayPixels(b).flatMap { case (w, h, px) =>
      lumaGrid(w, h, px, 17, 8).map { g =>
        val words = new Array[Long](2)
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 16) {
            if (g(r * 17 + c) < g(r * 17 + c + 1))
              words(r / 4) |= 1L << ((r % 4) * 16 + c)
            c += 1
          }
          r += 1
        }
        words
      }
    }

  /** Decoded PCM samples from the one audio container decodable without a
    * codec library — WAV (RIFF/WAVE, format tag 1, 8- or 16-bit PCM), the
    * audio twin of [[grayPixels]]' BMP/PPM role (compressed codecs slot
    * in at the same seam). Returns (sampleRate, channels, interleaved
    * samples normalised to the signed 16-bit range: 8-bit unsigned
    * storage decodes as `(v − 128) · 256`, so the same recording stored
    * at either width decodes identically) or None for any other
    * container, a non-PCM format tag, or a payload whose declared data
    * chunk overruns the bytes actually present — content-hash operators
    * SKIP such rows rather than hash garbage. Same bounded-advance Long
    * chunk walk as the metadata parser: corrupt sizes end the walk, never
    * throw.
    */
  def pcmSamples(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (!(b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E')) return None
    def le16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def le32(off: Int): Int = le16(off) | (le16(off + 2) << 16)
    var i = 12
    var fmtTag = -1
    var rate = 0
    var channels = 0
    var bps = 0
    var dataOff = -1
    var dataBytes = -1L
    while (i + 8 <= b.length && (fmtTag < 0 || dataOff < 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = le32(i + 4).toLong & 0xffffffffL
      if (id == "fmt " && i + 24 <= b.length) {
        fmtTag = le16(i + 8)
        channels = le16(i + 10)
        rate = le32(i + 12)
        bps = le16(i + 22)
      } else if (id == "data") {
        dataOff = i + 8
        dataBytes = size
      }
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > b.length) b.length else next.toInt
    }
    if (fmtTag != 1 || rate <= 0 || channels <= 0 ||
      (bps != 8 && bps != 16) || dataOff < 0 ||
      dataOff.toLong + dataBytes > b.length) None
    else {
      val bytesPerSample = bps / 8
      val frames = dataBytes / (channels.toLong * bytesPerSample)
      val n = frames * channels
      if (n > Int.MaxValue / 4) None // implausible for an in-row payload
      else {
        val out = new Array[Int](n.toInt)
        var k = 0
        var j = dataOff
        if (bps == 16) {
          while (k < out.length) {
            out(k) = ((b(j) & 0xff) | (b(j + 1) << 8)).toShort.toInt
            k += 1; j += 2
          }
        } else {
          while (k < out.length) {
            out(k) = ((b(j) & 0xff) - 128) * 256
            k += 1; j += 1
          }
        }
        Some((rate, channels, out))
      }
    }
  }

  /** 64-bit audio energy-envelope fingerprint (the audio dHash):
    * [[pcmSamples]] → mono mix (integer mean across channels) → 65 equal
    * time blocks (the [[lumaGrid]] boundary arithmetic in one dimension)
    * → bit k set iff energy(block k) < energy(block k+1), energy = sum of
    * squared samples in Long. Content-level: the same recording stored
    * with different chunk layout, channel count or sample width
    * fingerprints identically where byte-level dedup sees nothing.
    * Deterministic integer arithmetic; None for undecodable payloads or
    * recordings shorter than 65 frames.
    */
  def audioFingerprint64(b: Array[Byte]): Option[Long] =
    pcmSamples(b).flatMap { case (_, channels, px) =>
      val frames = px.length / channels
      if (frames < 65) None
      else Some {
        val energy = new Array[Long](65)
        var blk = 0
        while (blk < 65) {
          val f0 = blk.toLong * frames / 65
          val f1 = (blk + 1).toLong * frames / 65
          var e = 0L
          var f = f0
          while (f < f1) {
            var ch = 0
            var s = 0
            while (ch < channels) { s += px(f.toInt * channels + ch); ch += 1 }
            val mono = (s / channels).toLong
            e += mono * mono
            f += 1
          }
          energy(blk) = e
          blk += 1
        }
        var bits = 0L
        var k = 0
        while (k < 64) {
          if (energy(k) < energy(k + 1)) bits |= 1L << k
          k += 1
        }
        bits
      }
    }

  /** Exact content hash of the DECODED audio: FNV-1a 64 over the sample
    * rate, channel count and every interleaved normalised sample from
    * [[pcmSamples]]. Two WAVs of one recording hash identically whatever
    * the container layout (chunk order, junk chunks, 8- vs 16-bit
    * storage of the same levels) — the exact-dedup complement of
    * [[audioFingerprint64]]'s near-dup envelope. None when undecodable.
    */
  def audioContentHash64(b: Array[Byte]): Option[Long] =
    pcmSamples(b).map { case (rate, channels, px) =>
      var h = 0xcbf29ce484222325L
      def mix(v: Int): Unit = {
        var i = 0
        while (i < 4) {
          h ^= (v >>> (8 * i)) & 0xff
          h *= 0x100000001b3L
          i += 1
        }
      }
      mix(rate)
      mix(channels)
      var k = 0
      while (k < px.length) { mix(px(k)); k += 1 }
      h
    }

  /** Audio-metadata row emitted by [[audioMeta]]. */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false)
  ))

  /** Container-level audio metadata (format, sample rate, channels, frame
    * count) from pure header parses — WAV RIFF chunk walk, FLAC STREAMINFO;
    * no sample decode, so it runs at scan speed on arbitrarily large
    * payloads. The audio twin of [[imageMeta]], same per-partition batched
    * shape.
    */
  def audioMeta(media: DataFrame): DataFrame = {
    val enc = Encoders.row(audioMetaSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val content = r.getAs[Array[Byte]](contentIdx)
        val (fmt, rate, ch, frames) = StubDecoder.audioMetaInfo(content)
        Row(r.getLong(idIdx), fmt, rate, ch, frames, content.length)
      }
    }(enc)
  }

  /** Video-metadata row emitted by [[videoMeta]]. */
  val videoMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("brand", StringType, nullable = false),
    StructField("timescale", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("codec", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false)
  ))

  /** Container-level video metadata (major brand, movie timescale /
    * duration, presentation dimensions, first sample-entry codec fourcc)
    * from a pure MP4/ISO-BMFF box walk — the third modality of the
    * [[imageMeta]] / [[audioMeta]] family, same per-partition batched
    * shape, no bitstream decode, adversarial-input hardened (see
    * [[StubDecoder.parseMp4]]).
    */
  def videoMeta(media: DataFrame): DataFrame = {
    val enc = Encoders.row(videoMetaSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val content = r.getAs[Array[Byte]](contentIdx)
        val (fmt, brand, ts, ms, w, h, codec) =
          StubDecoder.videoMetaInfo(content)
        Row(r.getLong(idIdx), fmt, brand, ts, ms, w, h, codec, content.length)
      }
    }(enc)
  }

  /** Audio-decoded metadata appended by [[decodeAudio]]. */
  val audioDecodedSchema: StructType = StructType(mediaSchema.fields ++ Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false)
  ))

  /** Decode audio payloads per partition — same batched-iterator shape as
    * [[decode]]; WAV headers are parsed for real, other containers get the
    * deterministic stub metadata.
    */
  def decodeAudio(media: DataFrame): DataFrame = {
    val enc = Encoders.row(audioDecodedSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        val (rate, ch, frames) = StubDecoder.audioInfo(content)
        // Seq[Any]: a bare mixed Int/Long Seq would widen the Ints to Long
        Row.fromSeq(r.toSeq ++ Seq[Any](rate, ch, frames, content.length))
      }
    }(enc)
  }

  /** Feature extraction per partition: binary → fixed-size float vector. */
  def featurize(media: DataFrame, dims: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)
    ))
    val enc = Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        Row(r.getAs[Long]("media_id"), StubDecoder.embed(content, dims).toSeq)
      }
    }(enc)
  }

  /** Resize decoded media to a target (width, height) — per-partition
    * batched like [[decode]]. The STUB resamples the byte stream to exactly
    * `width*height*channels` bytes by periodic tiling/truncation; a real
    * implementation would do the pixel-space interpolation here with the
    * same contract (payload in → fixed-size payload out, dims columns
    * updated). Downstream batch shape — fixed row payload size — is what
    * training-data writers rely on, and that part is real.
    */
  def resize(decoded: DataFrame, width: Int, height: Int, channels: Int = 3): DataFrame = {
    require(
      width > 0 && height > 0 && channels > 0 &&
        width.toLong * height * channels <= Int.MaxValue,
      s"target payload ${width}x${height}x$channels overflows the Int n_bytes column")
    val enc = Encoders.row(decodedSchema)
    val target = width * height * channels
    // positional access: upstream mapPartitions rows carry no field schema
    val contentIdx = decodedSchema.fieldIndex("content")
    decoded.mapPartitions { rows =>
      rows.map { r =>
        val content = r.getAs[Array[Byte]](contentIdx)
        val out = new Array[Byte](target)
        if (content.nonEmpty) {
          var i = 0
          while (i < target) { out(i) = content(i % content.length); i += 1 }
        }
        Row.fromSeq(r.toSeq.zipWithIndex.map {
          case (_, idx) if decodedSchema.fieldNames(idx) == "content" => out
          case (_, idx) if decodedSchema.fieldNames(idx) == "width" => width
          case (_, idx) if decodedSchema.fieldNames(idx) == "height" => height
          case (_, idx) if decodedSchema.fieldNames(idx) == "channels" => channels
          case (_, idx) if decodedSchema.fieldNames(idx) == "n_bytes" => target
          case (v, _) => v
        })
      }
    }(enc)
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size chunk
    * of the stream, exploded to one row per frame. Pure column expressions —
    * chunking is a slice over the byte array, no UDF.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn(
        "frame_idx",
        sequence(lit(0), greatest((length(col("content")) / frameBytes).cast("int") - 1, lit(0)),
          lit(stride))
      )
      .select(
        col("media_id"),
        explode(col("frame_idx")).as("frame_no"),
        expr(s"substring(content, frame_no * $frameBytes + 1, $frameBytes)").as("frame")
      )

  /** Wrap a text corpus as synthetic media rows (the test environment has no
    * real image bytes; payload = UTF-8 text).
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image/stub").as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      map(lit("source"), col("source")).as("meta")
    )
}
