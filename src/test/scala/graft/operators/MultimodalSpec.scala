package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.fromDocuments(spark.read.parquet(sf("documents")))

  test("decode appends deterministic dimensions per payload") {
    import spark.implicits._
    val rows = Multimodal.decode(media)
      .select("media_id", "width", "height", "channels", "n_bytes")
      .as[(Long, Int, Int, Int, Int)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, w, h, c, n) =>
      assert(w === 16 + n % 64)
      assert(h === 16 + (n * 7) % 64)
      assert(c === 3)
    }
  }

  test("decode parses real BMP and PPM headers; stub only as fallback") {
    import org.apache.spark.sql.Row
    import spark.implicits._
    // minimal 24-bit BMP: 'BM' magic, LE width=2 at 18, height=-3 at 22
    // (top-down), bpp=24 at 28
    val bmp = new Array[Byte](54)
    bmp(0) = 'B'; bmp(1) = 'M'
    def putLe(off: Int, v: Int): Unit = (0 to 3).foreach { i =>
      bmp(off + i) = ((v >> (8 * i)) & 0xff).toByte
    }
    putLe(18, 2); putLe(22, -3)
    bmp(28) = 24
    val ppm = "P6\n# a comment\n640 480\n255\n".getBytes("US-ASCII")
    val opaque = Array[Byte](1, 2, 3, 4, 5)
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "image", bmp, null),
        Row(2L, "image", ppm, null),
        Row(3L, "blob", opaque, null)),
      Multimodal.mediaSchema)
    val got = Multimodal.decode(df)
      .select("media_id", "width", "height", "channels")
      .as[(Long, Int, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3, r._4)))
      .toMap
    assert(got(1L) === ((2, 3, 3))) // BMP header, abs(height)
    assert(got(2L) === ((640, 480, 3))) // PPM header, comment skipped
    assert(got(3L) === ((16 + 5 % 64, 16 + 35 % 64, 3))) // stub fallback
  }

  private def pngBytes(w: Int, h: Int, depth: Int, colorType: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(45)
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
      .put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).putInt(0)
    bb.putInt(0).put("IEND".getBytes("US-ASCII")).putInt(0)
    bb.array()
  }

  private def jpegBytes(w: Int, h: Int, ncomp: Int, precision: Int = 8): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(47 + 3 * ncomp)
    bb.put(0xff.toByte).put(0xd8.toByte)
    bb.put(0xff.toByte).put(0xe0.toByte).putShort(16)
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      .put(1.toByte).put(1.toByte).put(0.toByte)
      .putShort(1).putShort(1).put(0.toByte).put(0.toByte)
    bb.put(0xff.toByte).put(0xfe.toByte).putShort(13)
      .put("comment-11b".getBytes("US-ASCII"))
    bb.put(0xff.toByte).put(0xc0.toByte).putShort((8 + 3 * ncomp).toShort)
      .put(precision.toByte).putShort(h.toShort).putShort(w.toShort).put(ncomp.toByte)
    (1 to ncomp).foreach(i => bb.put(i.toByte).put(0x11.toByte).put(0.toByte))
    bb.put(0xff.toByte).put(0xd9.toByte)
    bb.array()
  }

  test("parsePng reads IHDR dimensions, bit depth and channels per color type") {
    import Multimodal.StubDecoder._
    assert(parsePng(pngBytes(640, 480, 8, 2)) === Some((640, 480, 3, 8)))
    assert(parsePng(pngBytes(1, 1, 16, 6)) === Some((1, 1, 4, 16)))
    assert(parsePng(pngBytes(100, 50, 8, 0)) === Some((100, 50, 1, 8)))
    assert(parsePng(pngBytes(100, 50, 8, 3)) === Some((100, 50, 1, 8))) // palette
    assert(parsePng(pngBytes(100, 50, 8, 4)) === Some((100, 50, 2, 8))) // gray+a
    // invalid color type / bit depth / dimensions → None
    assert(parsePng(pngBytes(100, 50, 8, 7)) === None)
    assert(parsePng(pngBytes(100, 50, 3, 2)) === None)
    assert(parsePng(pngBytes(0, 50, 8, 2)) === None)
    // truncated signature / short buffer
    assert(parsePng(pngBytes(640, 480, 8, 2).take(20)) === None)
    assert(parsePng("notapng".getBytes) === None)
  }

  test("parseJpeg walks APP0/COM markers to SOF0 and survives adversarial input") {
    import Multimodal.StubDecoder._
    assert(parseJpeg(jpegBytes(320, 200, 3)) === Some((320, 200, 3, 8)))
    assert(parseJpeg(jpegBytes(65535, 1, 1)) === Some((65535, 1, 1, 8)))
    assert(parseJpeg(jpegBytes(320, 200, 3, precision = 12)) === Some((320, 200, 3, 12)))
    // SOS/EOI before any SOF → None (dims genuinely absent)
    assert(parseJpeg(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) === None)
    // desynced stream (non-marker byte where a marker must be) → None
    assert(parseJpeg(Array(0xff, 0xd8, 0x00, 0x01).map(_.toByte)) === None)
    // segment length pointing past the buffer → None, no exception
    assert(parseJpeg(Array(0xff, 0xd8, 0xff, 0xe0, 0x7f, 0xff).map(_.toByte)) === None)
    assert(parseJpeg(jpegBytes(320, 200, 3).take(25)) === None)
  }

  test("parseGif reads the Logical Screen Descriptor; rejects non-GIF input") {
    import Multimodal.StubDecoder._
    def gif(w: Int, h: Int, colorRes: Int, ver: Char = '9'): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(14)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(s"GIF8${ver}a".getBytes("US-ASCII"))
        .putShort(w.toShort).putShort(h.toShort)
        .put((0x80 | ((colorRes - 1) << 4) | 0x07).toByte)
        .put(0.toByte).put(0.toByte).put(0x3b.toByte)
      bb.array()
    }
    assert(parseGif(gif(320, 200, 8)) === Some((320, 200, 1, 8)))
    assert(parseGif(gif(1, 1, 1, ver = '7')) === Some((1, 1, 1, 1)))
    assert(parseGif(gif(65500, 3, 5)) === Some((65500, 3, 1, 5)))
    assert(parseGif(gif(0, 200, 8)) === None) // zero width
    assert(parseGif(gif(320, 200, 8).take(10)) === None) // truncated LSD
    assert(parseGif("GIF88a".getBytes ++ new Array[Byte](8)) === None)
    assert(parseGif("notagif".getBytes) === None)
  }

  test("parseWebp reads VP8 / VP8L / VP8X headers; rejects WAV and garbage") {
    import Multimodal.StubDecoder._
    def riff(fourcc: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(20 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + payload.length)
        .put("WEBP".getBytes("US-ASCII"))
        .put(fourcc.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      bb.array()
    }
    def vp8(w: Int, h: Int): Array[Byte] = {
      val p = java.nio.ByteBuffer.allocate(10)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      p.put(0.toByte).put(0.toByte).put(0.toByte)
        .put(0x9d.toByte).put(0x01.toByte).put(0x2a.toByte)
        .putShort(w.toShort).putShort(h.toShort)
      riff("VP8 ", p.array())
    }
    def vp8l(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
      val bits = (w - 1) | ((h - 1) << 14) | ((if (alpha) 1 else 0) << 28)
      val p = java.nio.ByteBuffer.allocate(5)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      p.put(0x2f.toByte).putInt(bits)
      riff("VP8L", p.array())
    }
    def vp8x(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
      val p = java.nio.ByteBuffer.allocate(10)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      p.put((if (alpha) 0x10 else 0x00).toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte)
        .put((w - 1).toByte).put(((w - 1) >> 8).toByte).put(((w - 1) >> 16).toByte)
        .put((h - 1).toByte).put(((h - 1) >> 8).toByte).put(((h - 1) >> 16).toByte)
      riff("VP8X", p.array())
    }
    assert(parseWebp(vp8(640, 480)) === Some((640, 480, 3, 8)))
    assert(parseWebp(vp8l(12, 34, alpha = false)) === Some((12, 34, 3, 8)))
    assert(parseWebp(vp8l(16383, 16383, alpha = true)) ===
      Some((16383, 16383, 4, 8)))
    assert(parseWebp(vp8x(70000, 2, alpha = false)) === Some((70000, 2, 3, 8)))
    assert(parseWebp(vp8x(1, 1, alpha = true)) === Some((1, 1, 4, 8)))
    // VP8 payload without the keyframe start code → None
    assert(parseWebp(riff("VP8 ", new Array[Byte](10))) === None)
    // unknown first chunk fourcc → None
    assert(parseWebp(riff("ALPH", new Array[Byte](10))) === None)
    // RIFF/WAVE must not be claimed as an image
    val wavish = riff("VP8 ", vp8(2, 2).drop(20))
    wavish(8) = 'A'.toByte // RIFF...AEBP — not WEBP
    assert(parseWebp(wavish) === None)
    assert(parseWebp(vp8(640, 480).take(24)) === None) // truncated
    assert(parseWebp("noawebp".getBytes) === None)
  }

  private def tiffBytes(
      w: Int, h: Int, ch: Int, depth: Int, le: Boolean): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val arrOff = 62
    val bb = ByteBuffer.allocate(arrOff + (if (ch > 1) 2 * ch else 0))
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    bb.put((if (le) "II" else "MM").getBytes("US-ASCII"))
      .putShort(42).putInt(8)
    bb.putShort(4)
    def entry(tag: Int, cnt: Int, shortVal: Int, longVal: Int): Unit = {
      bb.putShort(tag.toShort).putShort(3).putInt(cnt)
      if (cnt == 1) bb.putShort(shortVal.toShort).putShort(0)
      else bb.putInt(longVal)
    }
    entry(256, 1, w, 0); entry(257, 1, h, 0)
    if (ch == 1) entry(258, 1, depth, 0) else entry(258, ch, 0, arrOff)
    entry(277, 1, ch, 0)
    bb.putInt(0)
    if (ch > 1) (1 to ch).foreach(_ => bb.putShort(depth.toShort))
    bb.array()
  }

  test("parseTiff walks IFD0 in both byte orders; defaults and garbage handled") {
    import Multimodal.StubDecoder._
    assert(parseTiff(tiffBytes(320, 200, 3, 8, le = true)) === Some((320, 200, 3, 8)))
    assert(parseTiff(tiffBytes(320, 200, 3, 8, le = false)) === Some((320, 200, 3, 8)))
    assert(parseTiff(tiffBytes(1, 1, 1, 16, le = true)) === Some((1, 1, 1, 16)))
    assert(parseTiff(tiffBytes(65535, 2, 2, 16, le = false)) ===
      Some((65535, 2, 2, 16)))
    // missing BitsPerSample/SamplesPerPixel take the spec defaults (1, 1):
    // hand-build an IFD carrying only width/length
    val bb = java.nio.ByteBuffer.allocate(8 + 2 + 24 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("II".getBytes).putShort(42).putInt(8).putShort(2)
      .putShort(256).putShort(3).putInt(1).putShort(12).putShort(0)
      .putShort(257).putShort(3).putInt(1).putShort(34).putShort(0)
      .putInt(0)
    assert(parseTiff(bb.array()) === Some((12, 34, 1, 1)))
    // IFD offset past the buffer → None, no exception
    val bad = tiffBytes(12, 34, 1, 8, le = true).clone()
    bad(4) = 0x7f.toByte
    assert(parseTiff(bad) === None)
    // IFD offset near Int.MaxValue: `ifd + 2` overflows Int — the bounds
    // check must run in Long and fall through, not throw out of u16
    val ovf = tiffBytes(12, 34, 1, 8, le = true).clone()
    ovf(4) = 0xfe.toByte; ovf(5) = 0xff.toByte
    ovf(6) = 0xff.toByte; ovf(7) = 0x7f.toByte
    assert(parseTiff(ovf) === None)
    // same overflow on an out-of-line BitsPerSample offset: multi-channel
    // layout (cnt > 1) with the value field forced to 0x7FFFFFFE → depth
    // unreadable → None, no exception
    val bpsOvf = tiffBytes(12, 34, 3, 8, le = true).clone()
    val bpsEntry = (0 until 4).map(i => 8 + 2 + i * 12)
      .find(e => (bpsOvf(e) & 0xff) + ((bpsOvf(e + 1) & 0xff) << 8) == 258).get
    bpsOvf(bpsEntry + 8) = 0xfe.toByte; bpsOvf(bpsEntry + 9) = 0xff.toByte
    bpsOvf(bpsEntry + 10) = 0xff.toByte; bpsOvf(bpsEntry + 11) = 0x7f.toByte
    assert(parseTiff(bpsOvf) === None)
    assert(parseTiff(tiffBytes(320, 200, 3, 8, le = true).take(20)) === None)
    assert(parseTiff("II+notiff".getBytes) === None)
  }

  private def flacBytes(rate: Int, ch: Int, bps: Int, total: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(42)
    bb.put("fLaC".getBytes("US-ASCII"))
      .put(0x80.toByte).put(0.toByte).put(0.toByte).put(34.toByte)
      .putShort(4096).putShort(4096)
      .put(new Array[Byte](6))
    bb.put((rate >> 12).toByte).put(((rate >> 4) & 0xff).toByte)
      .put((((rate & 0xf) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4)).toByte)
      .put(((((bps - 1) & 0xf) << 4) | ((total >> 32) & 0xf).toInt).toByte)
      .put(((total >> 24) & 0xff).toByte).put(((total >> 16) & 0xff).toByte)
      .put(((total >> 8) & 0xff).toByte).put((total & 0xff).toByte)
    bb.array()
  }

  test("parseFlac reads the STREAMINFO packed field; rejects non-FLAC input") {
    import Multimodal.StubDecoder._
    assert(parseFlac(flacBytes(44100, 2, 16, 100L)) === Some((44100, 2, 100L)))
    assert(parseFlac(flacBytes(8000, 1, 16, 0L)) === Some((8000, 1, 0L)))
    // 20-bit rate ceiling and a >32-bit total-sample count survive the pack
    assert(parseFlac(flacBytes(655350, 8, 32, 0x2FFFFFFFFL)) ===
      Some((655350, 8, 0x2FFFFFFFFL)))
    assert(parseFlac(flacBytes(44100, 2, 16, 100L).take(30)) === None)
    // first metadata block not STREAMINFO (type 4 = VORBIS_COMMENT) → None
    val wrongType = flacBytes(44100, 2, 16, 100L).clone()
    wrongType(4) = 0x84.toByte
    assert(parseFlac(wrongType) === None)
    assert(parseFlac("fLaX-not-flac".getBytes) === None)
  }

  private def mp3Xing(sri: Int, frames: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(48)
    bb.put(0xff.toByte).put(0xfb.toByte)
      .put((0x90 | (sri << 2)).toByte).put(0x40.toByte)
    bb.position(36)
    bb.put("Xing".getBytes("US-ASCII")).putInt(1).putInt(frames)
    bb.array()
  }

  private def mp3Vbri(tagSize: Int, frames: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(10 + tagSize + 54)
    bb.put("ID3".getBytes("US-ASCII")).put(3.toByte).put(0.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).put(tagSize.toByte)
    bb.position(10 + tagSize)
    val o = bb.position()
    bb.put(0xff.toByte).put(0xfb.toByte).put(0x90.toByte).put(0xc0.toByte)
    bb.position(o + 36)
    bb.put("VBRI".getBytes("US-ASCII")).putShort(1).putShort(0).putShort(0)
      .putInt(0).putInt(frames)
    bb.array()
  }

  private def oggVorbis(rate: Int, ch: Int, granule: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(86)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("OggS".getBytes("US-ASCII")).put(0.toByte).put(0x02.toByte)
      .putLong(0L).putInt(1).putInt(0).putInt(0)
      .put(1.toByte).put(30.toByte)
    bb.put(0x01.toByte).put("vorbis".getBytes("US-ASCII")).putInt(0)
      .put(ch.toByte).putInt(rate).putInt(0).putInt(0).putInt(0)
      .put(0xb8.toByte).put(0x01.toByte)
    bb.put("OggS".getBytes("US-ASCII")).put(0.toByte).put(0x04.toByte)
      .putLong(granule).putInt(1).putInt(1).putInt(0)
      .put(1.toByte).put(0.toByte)
    bb.array()
  }

  test("parseMp3 reads the MPEG header + Xing/VBRI counts; CBR estimate; rejects garbage") {
    import Multimodal.StubDecoder._
    // Xing after the 32-byte MPEG1-stereo side info; 1152 samples/frame
    assert(parseMp3(mp3Xing(0, 100)) === Some((44100, 2, 115200L)))
    assert(parseMp3(mp3Xing(1, 1)) === Some((48000, 2, 1152L)))
    assert(parseMp3(mp3Xing(2, 9999)) === Some((32000, 2, 9999L * 1152)))
    // ID3v2 synchsafe skip → mono frame → VBRI at the fixed +36 offset
    assert(parseMp3(mp3Vbri(0, 7)) === Some((44100, 1, 7L * 1152)))
    assert(parseMp3(mp3Vbri(100, 7)) === Some((44100, 1, 7L * 1152)))
    // no VBR header → CBR estimate: 128 kbps @ 44100 → 417-byte frames
    val cbr = new Array[Byte](417 * 3)
    Array(0xff, 0xfb, 0x90, 0x40).zipWithIndex.foreach { case (v, i) =>
      cbr(i) = v.toByte
    }
    assert(parseMp3(cbr) === Some((44100, 2, 3L * 1152)))
    // MPEG2 (version bits 10): half-rate table, 576 samples per frame
    val v2 = mp3Xing(0, 10)
    v2(1) = 0xf3.toByte // sync + MPEG2 + Layer III
    // MPEG2 stereo side info = 17 bytes → the Xing tag planted at +36 is
    // not found and the free-bitrate path can't estimate → None is wrong;
    // bri=9 → 96 kbps, frameLen = 72000*96/22050 = 313 → 48/313 = 0 frames
    assert(parseMp3(v2) === Some((22050, 2, 0L)))
    // free bitrate (bri = 0) and no VBR header → no estimate possible
    val free = Array(0xff.toByte, 0xfb.toByte, 0x00.toByte, 0x40.toByte)
    assert(parseMp3(free) === None)
    // reserved sample-rate index / Layer I / garbage / truncation → None
    val badSri = Array(0xff.toByte, 0xfb.toByte, 0x9c.toByte, 0x40.toByte)
    assert(parseMp3(badSri) === None)
    val layer1 = Array(0xff.toByte, 0xff.toByte, 0x90.toByte, 0x40.toByte)
    assert(parseMp3(layer1) === None)
    assert(parseMp3("not audio at all".getBytes) === None)
    assert(parseMp3(Array[Byte]('I', 'D', '3')) === None)
    // ID3 size pointing past the end must not throw
    val idOnly = mp3Vbri(0, 7).take(10)
    assert(parseMp3(idOnly) === None)
  }

  test("parseOgg reads the Vorbis id header and last-page granule; rejects non-Vorbis") {
    import Multimodal.StubDecoder._
    assert(parseOgg(oggVorbis(44100, 2, 123456L)) === Some((44100, 2, 123456L)))
    assert(parseOgg(oggVorbis(8000, 1, 0L)) === Some((8000, 1, 0L)))
    // non-BOS first page → None
    val nonBos = oggVorbis(44100, 2, 5L).clone()
    nonBos(5) = 0x00.toByte
    assert(parseOgg(nonBos) === None)
    // an Opus stream (different id packet magic) must not parse as Vorbis
    val opus = oggVorbis(44100, 2, 5L).clone()
    opus(28) = 'O'.toByte // first packet byte != 0x01
    assert(parseOgg(opus) === None)
    assert(parseOgg(oggVorbis(44100, 2, 5L).take(40)) === None)
    assert(parseOgg("OggS but truncated".getBytes) === None)
  }

  test("audioMeta end-to-end: mp3 + ogg formats route through the real parsers") {
    import org.apache.spark.sql.Row
    import spark.implicits._
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "audio", mp3Xing(1, 50), null),
        Row(2L, "audio", mp3Vbri(21, 3), null),
        Row(3L, "audio", oggVorbis(16000, 1, 999L), null)),
      Multimodal.mediaSchema)
    val got = Multimodal.audioMeta(df)
      .as[(Long, String, Int, Int, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "mp3", 48000, 2, 57600L, 48)))
    assert(got(2L) === ((2L, "mp3", 44100, 1, 3456L, 85)))
    assert(got(3L) === ((3L, "ogg", 16000, 1, 999L, 86)))
  }

  test("audioMeta end-to-end: wav + flac + stub formats") {
    import org.apache.spark.sql.Row
    import spark.implicits._
    // minimal WAV reused from the decodeAudio test shape
    val nDataBytes = 400
    val buf = java.nio.ByteBuffer.allocate(44 + nDataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + nDataBytes).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
      .putInt(44100).putInt(44100 * 4).putShort(4).putShort(16)
      .put("data".getBytes).putInt(nDataBytes)
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "audio", buf.array(), null),
        Row(2L, "audio", flacBytes(32000, 1, 16, 77L), null),
        Row(3L, "blob", Array[Byte](1, 2, 3, 4, 5), null)),
      Multimodal.mediaSchema)
    val got = Multimodal.audioMeta(df)
      .as[(Long, String, Int, Int, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "wav", 44100, 2, 100L, 444)))
    assert(got(2L) === ((2L, "flac", 32000, 1, 77L, 42)))
    assert(got(3L) === ((3L, "stub", 16000, 1, 2L, 5)))
  }

  test("imageMeta end-to-end over mixed planted containers") {
    import org.apache.spark.sql.Row
    import spark.implicits._
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "image", pngBytes(12, 34, 16, 2), null),
        Row(2L, "image", jpegBytes(56, 78, 1), null),
        Row(3L, "blob", Array[Byte](9, 9, 9), null)),
      Multimodal.mediaSchema)
    val got = Multimodal.imageMeta(df)
      .as[(Long, String, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "png", 12, 34, 3, 16, 45)))
    assert(got(2L) === ((2L, "jpeg", 56, 78, 1, 8, 50)))
    assert(got(3L) === ((3L, "stub", 16 + 3, 16 + 21, 3, 8, 3)))
  }

  test("decodeAudio parses real WAV headers; stub for other payloads") {
    import org.apache.spark.sql.Row
    import spark.implicits._
    // minimal PCM WAV: RIFF/WAVE + fmt (stereo, 44100 Hz, 16-bit) + data
    val nDataBytes = 400 // 100 stereo 16-bit frames
    val buf = java.nio.ByteBuffer
      .allocate(44 + nDataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + nDataBytes)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(2) // stereo
    buf.putInt(44100)
    buf.putInt(44100 * 2 * 2) // byte rate
    buf.putShort(4) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(nDataBytes)
    val wav = buf.array()
    val opaque = Array[Byte](1, 2, 3, 4, 5, 6)
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, "audio", wav, null), Row(2L, "blob", opaque, null)),
      Multimodal.mediaSchema)
    val got = Multimodal.decodeAudio(df)
      .select("media_id", "sample_rate", "channels", "n_frames")
      .as[(Long, Int, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4)))
      .toMap
    assert(got(1L) === ((44100, 2, 100L))) // 400 bytes / (2 ch × 2 bytes)
    assert(got(2L) === ((16000, 1, 3L))) // stub fallback: len/2 frames
  }

  test("parseWav survives corrupt/adversarial chunk sizes (falls back, never throws)") {
    // RIFF/WAVE container whose first chunk claims a size ≥ 2^31: a naive
    // `size.toInt` advance would go negative and throw
    // StringIndexOutOfBoundsException instead of honouring the Option
    // (None → stub metadata) contract
    def riffWith(chunkId: String, claimedSize: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer
        .allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(56)
      buf.put("WAVE".getBytes("US-ASCII"))
      buf.put(chunkId.getBytes("US-ASCII")).putInt(claimedSize)
      buf.array()
    }
    // chunk size with the sign bit set (unsigned 0x80000010)
    assert(Multimodal.StubDecoder.parseWav(riffWith("junk", 0x80000010)) === None)
    // chunk size far past the buffer end (truncated file)
    assert(Multimodal.StubDecoder.parseWav(riffWith("junk", 1000000)) === None)
    // audioInfo falls back to the deterministic stub on both
    assert(
      Multimodal.StubDecoder.audioInfo(riffWith("junk", 0x80000010)) ===
        ((16000, 1, 32L)))
  }

  test("featurize yields fixed-dim deterministic embeddings") {
    import spark.implicits._
    val e1 = Multimodal.featurize(media, dims = 16)
      .as[(Long, Seq[Float])].collect().toMap
    val e2 = Multimodal.featurize(media.repartition(7), dims = 16)
      .as[(Long, Seq[Float])].collect().toMap
    assert(e1.values.forall(_.length == 16))
    // partitioning must not change the result
    assert(e1 === e2)
  }

  test("sampleFrames chunks the payload with the configured stride") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 2)
      .select("media_id", "frame_no", "frame")
      .as[(Long, Int, Array[Byte])]
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_._3.length <= 32))
    assert(frames.forall(_._2 % 2 == 0))
  }

  // -- pixel decode + perceptual hashes --------------------------------

  /** Independent BMP writer (bottom-up unless topDown, 4-byte padded, BGR,
    * gray) — a separate formulation of the format from both the decoder
    * and the harness fixture generator.
    */
  private def grayBmp(px: Array[Array[Int]], topDown: Boolean = false): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val h = px.length
    val w = px(0).length
    val stride = (w * 3 + 3) & ~3
    val bb = ByteBuffer.allocate(54 + stride * h).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(if (topDown) -h else h)
      .putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(0).putInt(0).putInt(0).putInt(0)
    val rowOrder = if (topDown) 0 until h else (h - 1) to 0 by -1
    rowOrder.foreach { r =>
      px(r).foreach { v => bb.put(v.toByte).put(v.toByte).put(v.toByte) }
      (w * 3 until stride).foreach(_ => bb.put(0.toByte))
    }
    bb.array()
  }

  private def grayPpm(px: Array[Array[Int]]): Array[Byte] = {
    val h = px.length
    val w = px(0).length
    val header = s"P6\n# c\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ px.flatMap(_.flatMap(v => Seq(v.toByte, v.toByte, v.toByte)))
  }

  test("grayPixels: BMP bottom-up, BMP top-down and PPM decode to the same plane") {
    // 5 wide forces real row padding (15 → stride 16); distinct per-cell
    // values catch any row/column transposition or flip
    val px = Array.tabulate(3, 5)((r, c) => 10 * r + c + 7)
    val want = px.flatten.toSeq
    Seq(grayBmp(px), grayBmp(px, topDown = true), grayPpm(px)).foreach { bytes =>
      val Some((w, h, luma)) = Multimodal.grayPixels(bytes)
      assert((w, h) === (5, 3))
      assert(luma.toSeq === want, s"container ${bytes.take(2).toSeq}")
    }
  }

  test("grayPixels: luma applies BT.601 integer weights to color pixels") {
    val header = "P6\n1 1\n255\n".getBytes("US-ASCII")
    val bytes = header ++ Array[Byte](200.toByte, 100, 50)
    val Some((_, _, luma)) = Multimodal.grayPixels(bytes)
    assert(luma.toSeq === Seq((299 * 200 + 587 * 100 + 114 * 50) / 1000))
  }

  test("grayPixels: truncated payloads and other containers return None") {
    val px = Array.tabulate(3, 5)((r, c) => r + c)
    assert(Multimodal.grayPixels(grayBmp(px).dropRight(1)).isEmpty)
    assert(Multimodal.grayPixels(grayPpm(px).dropRight(1)).isEmpty)
    assert(Multimodal.grayPixels("P6\n5 3\n70000\n".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.grayPixels(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.grayPixels(Array.empty[Byte]).isEmpty)
  }

  test("dHash64: gradient bits match a brute-force 9×8 area-mean downsample") {
    // 18×16 image: every dHash grid cell is a 2×2 pixel block — the
    // downsample is exercised for real, and the expectation recomputed
    // here from first principles
    val px = Array.tabulate(16, 18)((r, c) => (r * 31 + c * 17 + 3) % 251)
    val grid = Array.tabulate(8, 9) { (gr, gc) =>
      val vals = for (r <- 2 * gr until 2 * gr + 2; c <- 2 * gc until 2 * gc + 2)
        yield px(r)(c)
      vals.sum / 4
    }
    var want = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (grid(r)(c) < grid(r)(c + 1)) want |= 1L << (r * 8 + c)
    assert(Multimodal.dHash64(grayBmp(px)) === Some(want))
    // format crossing: identical pixels in the other container, same hash
    assert(Multimodal.dHash64(grayPpm(px)) === Some(want))
    // sub-grid images cannot be hashed
    assert(Multimodal.dHash64(grayBmp(Array.tabulate(8, 8)((r, c) => r + c))).isEmpty)
  }

  test("dHash128: gradient bits match a brute-force 17×8 area-mean downsample") {
    // 34×16 image: every dHash128 grid cell is a 2×2 pixel block — the
    // wide downsample is exercised for real, and the expectation
    // recomputed here from first principles with the documented packing
    // (word r/4, bit (r%4)*16+c)
    val px = Array.tabulate(16, 34)((r, c) => (r * 37 + c * 13 + 5) % 251)
    val grid = Array.tabulate(8, 17) { (gr, gc) =>
      val vals = for (r <- 2 * gr until 2 * gr + 2; c <- 2 * gc until 2 * gc + 2)
        yield px(r)(c)
      vals.sum / 4
    }
    val want = new Array[Long](2)
    for (r <- 0 until 8; c <- 0 until 16)
      if (grid(r)(c) < grid(r)(c + 1)) want(r / 4) |= 1L << ((r % 4) * 16 + c)
    assert(Multimodal.dHash128(grayBmp(px)).map(_.toSeq) === Some(want.toSeq))
    // format crossing: identical pixels in the other container, same hash
    assert(Multimodal.dHash128(grayPpm(px)).map(_.toSeq) === Some(want.toSeq))
    // sub-grid images cannot be hashed
    assert(Multimodal.dHash128(grayBmp(Array.tabulate(8, 16)((r, c) => r + c))).isEmpty)
    // word sign bits: monotone rows set every gradient bit — both words
    // must round-trip as NEGATIVE longs for the unsigned band split
    val asc = Array.tabulate(8, 17)((_, c) => 5 + 14 * c)
    assert(Multimodal.dHash128(grayBmp(asc)).map(_.toSeq) ===
      Some(Seq(0xFFFFFFFFFFFFFFFFL, 0xFFFFFFFFFFFFFFFFL)))
  }

  test("aHash64: mean-threshold bits, and both hashes survive a 64th set bit") {
    // top half dark, bottom half bright → aHash = 32 high bits set
    val px = Array.tabulate(8, 8)((r, _) => if (r < 4) 10 else 200)
    assert(Multimodal.aHash64(grayBmp(px)) === Some(0xFFFFFFFF00000000L))
    // a hash with bit 63 set must round-trip as a NEGATIVE long — guards
    // the unsigned band-split downstream
    val desc = Array.tabulate(8, 9)((_, c) => 250 - 25 * c)
    assert(Multimodal.dHash64(grayBmp(desc)) === Some(0L))
    val asc = Array.tabulate(8, 9)((_, c) => 5 + 25 * c)
    assert(Multimodal.dHash64(grayBmp(asc)) === Some(-1L))
  }

  /** Minimal PNG writer with a forced per-row filter type — an
    * independent forward-filter formulation (the decoder inverts, this
    * applies) used to pin each defilter path and to build corrupt
    * variants (bad depth/interlace/filter byte) no real encoder emits.
    */
  private def pngOf(
      px: Array[Array[Int]],
      colorType: Int,
      filterOf: Int => Int,
      depth: Int = 8,
      interlace: Int = 0,
      mangleFilterByte: Boolean = false): Array[Byte] = {
    val h = px.length
    val w = px(0).length
    val ch = colorType match { case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => 1 }
    val stride = w * ch
    val recon = Array.tabulate(h, stride) { (r, i) =>
      val isAlpha = (colorType == 4 && i % ch == 1) || (colorType == 6 && i % ch == 3)
      if (isAlpha) 200 + (i % 37) else px(r)(i / ch) // non-constant alpha: must be ignored
    }
    val raw = new Array[Byte](h * (1 + stride))
    for (r <- 0 until h) {
      val ft = if (mangleFilterByte && r == h - 1) 9 else filterOf(r)
      raw(r * (1 + stride)) = ft.toByte
      for (i <- 0 until stride) {
        val a = if (i >= ch) recon(r)(i - ch) else 0
        val u = if (r > 0) recon(r - 1)(i) else 0
        val c0 = if (r > 0 && i >= ch) recon(r - 1)(i - ch) else 0
        val pred = (ft: @unchecked) match {
          case 0 | 9 => 0
          case 1 => a
          case 2 => u
          case 3 => (a + u) / 2
          case 4 =>
            val p = a + u - c0
            val pa = math.abs(p - a); val pb = math.abs(p - u); val pc = math.abs(p - c0)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) u else c0
        }
        raw(r * (1 + stride) + 1 + i) = ((recon(r)(i) - pred) & 0xff).toByte
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 128)
    val n = d.deflate(buf); d.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte).array()
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", java.util.Arrays.copyOf(buf, n)) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("grayPixels: PNG written by ImageIO (independent encoder) matches BMP pixels") {
    // javax.imageio is a completely independent PNG implementation: gray
    // and RGB images written by it must decode to the identical luma
    // plane as the same pixels in a BMP
    import java.awt.image.BufferedImage
    val px = Array.tabulate(12, 17)((r, c) => (r * 19 + c * 7 + 11) % 256)
    def viaImageIO(imgType: Int): Array[Byte] = {
      val img = new BufferedImage(17, 12, imgType)
      for (r <- 0 until 12; c <- 0 until 17) {
        val v = px(r)(c)
        if (imgType == BufferedImage.TYPE_BYTE_GRAY)
          // raster write: setRGB on a gray image does an sRGB->gray
          // colorspace conversion that would change the stored value
          img.getRaster.setSample(c, r, 0, v)
        else img.setRGB(c, r, (0xff << 24) | (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val want = Multimodal.grayPixels(grayBmp(px)).get._3.toSeq
    for (t <- Seq(BufferedImage.TYPE_BYTE_GRAY, BufferedImage.TYPE_INT_RGB,
      BufferedImage.TYPE_INT_ARGB)) {
      val Some((w, h, luma)) = Multimodal.grayPixels(viaImageIO(t))
      assert((w, h) === (17, 12), s"type $t")
      assert(luma.toSeq === want, s"type $t")
    }
  }

  test("grayPixels: every PNG defilter type and color type reconstructs exactly") {
    val px = Array.tabulate(10, 9)((r, c) => (r * 23 + c * 29 + 3) % 256)
    val want = px.flatten.toSeq
    for (ct <- Seq(0, 2, 4, 6); ft <- 0 to 4) {
      val Some((w, h, luma)) = Multimodal.grayPixels(pngOf(px, ct, _ => ft))
      assert((w, h) === (9, 10), s"ct=$ct ft=$ft")
      assert(luma.toSeq === want, s"ct=$ct ft=$ft")
    }
    // mixed filters per row (the realistic encoder output)
    assert(Multimodal.grayPixels(pngOf(px, 2, r => r % 5)).get._3.toSeq === want)
    // format crossing at the hash level: PNG twin of a BMP hashes identically
    val wide = Array.tabulate(16, 18)((r, c) => (r * 31 + c * 17 + 3) % 251)
    assert(Multimodal.dHash64(pngOf(wide, 6, r => (r + 2) % 5)) ===
      Multimodal.dHash64(grayBmp(wide)))
  }

  test("grayPixels: PNG skip cases — palette/16-bit/interlace/corrupt/truncated") {
    val px = Array.tabulate(10, 9)((r, c) => (r + c) % 256)
    val good = pngOf(px, 2, r => r % 5)
    assert(Multimodal.grayPixels(good).nonEmpty)
    assert(Multimodal.grayPixels(pngOf(px, 3, _ => 0)).isEmpty) // palette
    assert(Multimodal.grayPixels(pngOf(px, 0, _ => 0, depth = 16)).isEmpty)
    assert(Multimodal.grayPixels(pngOf(px, 2, _ => 0, interlace = 1)).isEmpty)
    assert(Multimodal.grayPixels(pngOf(px, 2, _ => 0, mangleFilterByte = true)).isEmpty)
    // corrupt deflate stream: garbage mid-IDAT must skip, not throw
    val corrupt = good.clone()
    for (i <- 45 until math.min(60, corrupt.length)) corrupt(i) = 0x55
    assert(Multimodal.grayPixels(corrupt).isEmpty)
    // every-byte truncation sweep: never throws, never mis-decodes
    for (n <- 0 until good.length)
      assert(Multimodal.grayPixels(java.util.Arrays.copyOf(good, n)).isEmpty, s"len $n")
  }

  /** Minimal WAV builder for the PCM-decode tests: 16-bit LE or 8-bit
    * unsigned storage, optional JUNK chunk before fmt, optional declared
    * data size override for truncation cases.
    */
  private def wav(
      samples: Array[Int], channels: Int, bps: Int = 16,
      junk: Boolean = false, fmtTag: Int = 1,
      declaredDataBytes: Int = -1): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val bytesPer = bps / 8
    val dataBytes = samples.length * bytesPer
    val declared = if (declaredDataBytes >= 0) declaredDataBytes else dataBytes
    val junkBytes = if (junk) 12 else 0
    val bb = ByteBuffer.allocate(44 + junkBytes + dataBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + junkBytes + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    if (junk) bb.put("JUNK".getBytes("US-ASCII")).putInt(4).putInt(0)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(fmtTag.toShort).putShort(channels.toShort).putInt(16000)
      .putInt(16000 * channels * bytesPer)
      .putShort((channels * bytesPer).toShort).putShort(bps.toShort)
      .put("data".getBytes("US-ASCII")).putInt(declared)
    if (bps == 16) samples.foreach(s => bb.putShort(s.toShort))
    else samples.foreach(s => bb.put((s / 256 + 128).toByte))
    bb.array()
  }

  test("pcmSamples: 16-bit/8-bit decode, stereo interleave, junk chunks; corrupt input skipped") {
    def dec(b: Array[Byte]): Option[(Int, Int, Seq[Int])] =
      Multimodal.pcmSamples(b).map { case (r, c, a) => (r, c, a.toSeq) }
    val mono = Array(0, 100, -100, 32767, -32768, 7)
    assert(dec(wav(mono, 1)) === Some((16000, 1, mono.toSeq)))
    // container layout must not matter
    assert(dec(wav(mono, 1, junk = true)) === Some((16000, 1, mono.toSeq)))
    // stereo keeps the interleaved stream and the channel count
    val stereo = Array(10, -10, 200, 400, -300, 100)
    assert(dec(wav(stereo, 2)) === Some((16000, 2, stereo.toSeq)))
    // 8-bit unsigned storage of the same levels decodes identically
    val levels = Array(0, 256, -256, 2560, -32768, 32512)
    assert(dec(wav(levels, 1, bps = 8)) === Some((16000, 1, levels.toSeq)))
    // non-PCM format tag, truncated data chunk, other containers: None
    assert(Multimodal.pcmSamples(wav(mono, 1, fmtTag = 3)).isEmpty)
    assert(Multimodal.pcmSamples(
      wav(mono, 1, declaredDataBytes = mono.length * 2 + 64)).isEmpty)
    assert(Multimodal.pcmSamples(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.pcmSamples(
      "fLaC".getBytes("US-ASCII") ++ new Array[Byte](60)).isEmpty)
  }

  test("audioFingerprint64 matches a first-principles envelope; content hash equates decoded-identical containers") {
    // 130 mono frames → every envelope block is 2 frames; recompute the
    // energies here from scratch with the same boundary arithmetic
    val px = Array.tabulate(130)(i => ((i * 37 + 11) % 251) - 125)
    val energy = Array.tabulate(65) { blk =>
      val f0 = blk * 130 / 65
      val f1 = (blk + 1) * 130 / 65
      (f0 until f1).map(f => px(f).toLong * px(f)).sum
    }
    var want = 0L
    (0 until 64).foreach(k => if (energy(k) < energy(k + 1)) want |= 1L << k)
    assert(Multimodal.audioFingerprint64(wav(px, 1)) === Some(want))
    // a stereo stream whose mono mix equals px fingerprints identically
    val st = px.flatMap(v => Array(v + 1, v - 1))
    assert(Multimodal.audioFingerprint64(wav(st, 2)) === Some(want))
    // under 65 frames: no envelope
    assert(Multimodal.audioFingerprint64(wav(px.take(64), 1)).isEmpty)
    // exact content hash: container layout invariant, 8-bit storage of
    // the same levels invariant, any sample change variant
    val lv = Array(0, 256, -256, 2560, -32768, 32512)
    val h = Multimodal.audioContentHash64(wav(lv, 1))
    assert(h.isDefined)
    assert(Multimodal.audioContentHash64(wav(lv, 1, junk = true)) === h)
    assert(Multimodal.audioContentHash64(wav(lv, 1, bps = 8)) === h)
    val lv2 = lv.clone(); lv2(3) += 256
    assert(Multimodal.audioContentHash64(wav(lv2, 1)) !== h)
    assert(Multimodal.audioContentHash64(Array[Byte](9, 9)).isEmpty)
  }

  /** Minimal ISO-BMFF builder for the box-walk tests. */
  private def mp4Box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
    bb.array()
  }

  private def mp4Fixture(
      v1: Boolean, brand: String = "isom", ts: Long = 1000L,
      dur: Long = 5000L, w: Int = 640, h: Int = 360,
      codec: String = "avc1"): Array[Byte] = {
    import java.nio.ByteBuffer
    val mvhd = {
      val bb = ByteBuffer.allocate(if (v1) 112 else 100)
      bb.put((if (v1) 1 else 0).toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      if (v1) bb.putLong(0L).putLong(0L).putInt(ts.toInt).putLong(dur)
      else bb.putInt(0).putInt(0).putInt(ts.toInt).putInt(dur.toInt)
      bb.array()
    }
    val tkhd = {
      val bb = ByteBuffer.allocate(if (v1) 96 else 84)
      bb.put((if (v1) 1 else 0).toByte).put(0.toByte).put(0.toByte).put(7.toByte)
      bb.position(if (v1) 4 + 84 else 4 + 72)
      bb.putInt(w << 16).putInt(h << 16)
      bb.array()
    }
    val stsd = mp4Box("stsd", {
      val hd = ByteBuffer.allocate(8); hd.putInt(0).putInt(1)
      hd.array() ++ { val e = ByteBuffer.allocate(16)
        e.putInt(16).put(codec.getBytes("US-ASCII")); e.array() }
    })
    val mdia = mp4Box("mdia", mp4Box("minf", mp4Box("stbl", stsd)))
    val trak = mp4Box("trak", mp4Box("tkhd", tkhd) ++ mdia)
    mp4Box("ftyp", brand.getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0)) ++
      mp4Box("moov", mp4Box("mvhd", mvhd) ++ trak)
  }

  test("parseMp4 walks ftyp/mvhd/tkhd/stsd in both versions; free boxes and audio traks skipped") {
    import Multimodal.StubDecoder._
    assert(parseMp4(mp4Fixture(v1 = false)) ===
      Some(("isom", 1000L, 5000L, 640, 360, "avc1")))
    assert(parseMp4(mp4Fixture(v1 = true, brand = "mp42", ts = 90000L,
      dur = 90000L * 7, w = 1920, h = 1080, codec = "hvc1")) ===
      Some(("mp42", 90000L, 7000L, 1920, 1080, "hvc1")))
    // non-integer ms truncate deterministically (600 units at ts=1000 → 600 ms)
    assert(parseMp4(mp4Fixture(v1 = false, dur = 601L)).get._3 === 601L)
    // free boxes at two levels must be walked over, and a 0×0 (audio)
    // trak before the video trak must not claim the dimensions
    val base = mp4Fixture(v1 = false)
    val ftypLen = 16
    val free = mp4Box("free", Array[Byte](0, 0, 0, 0))
    val audioTrak = mp4Box("trak", mp4Box("tkhd", {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.put(0.toByte).put(0.toByte).put(0.toByte).put(7.toByte)
      bb.array() // width/height stay 0
    }))
    val moovPayload = base.drop(ftypLen + 8)
    val rebuilt = base.take(ftypLen) ++ free ++
      mp4Box("moov", free ++ audioTrak ++ moovPayload)
    assert(parseMp4(rebuilt) === Some(("isom", 1000L, 5000L, 640, 360, "avc1")))
  }

  test("parseMp4 survives truncation, desync and largesize abuse (never throws)") {
    import Multimodal.StubDecoder._
    val good = mp4Fixture(v1 = false)
    // every truncation point parses or degrades to None — no exceptions
    (0 until good.length).foreach { n =>
      parseMp4(good.take(n)) // must not throw
    }
    assert(parseMp4(good.take(20)).isEmpty) // ftyp alone: no mvhd
    // size < 8 (desync) ends the walk before moov → None
    val desync = good.clone()
    val moovOff = 16
    desync(moovOff) = 0; desync(moovOff + 1) = 0
    desync(moovOff + 2) = 0; desync(moovOff + 3) = 2 // moov box size := 2
    assert(parseMp4(desync).isEmpty)
    // size pointing past the buffer → the level's walk ends, None
    val overrun = good.clone()
    overrun(moovOff) = 0x7f.toByte
    assert(parseMp4(overrun).isEmpty)
    // largesize (size==1) honoured: rewrap moov with a 16-byte header
    val moovPayload = good.drop(moovOff + 8)
    val bb = java.nio.ByteBuffer.allocate(16 + moovPayload.length)
    bb.putInt(1).put("moov".getBytes("US-ASCII"))
      .putLong(16L + moovPayload.length).put(moovPayload)
    assert(parseMp4(good.take(moovOff) ++ bb.array()) ===
      Some(("isom", 1000L, 5000L, 640, 360, "avc1")))
    // largesize smaller than its own header → None, not a loop/throw
    val badLarge = java.nio.ByteBuffer.allocate(16)
    badLarge.putInt(1).put("moov".getBytes("US-ASCII")).putLong(4L)
    assert(parseMp4(good.take(moovOff) ++ badLarge.array()).isEmpty)
    // non-BMFF payloads
    assert(parseMp4(Array[Byte](1, 2, 3)).isEmpty)
    assert(parseMp4("RIFF....WAVE".getBytes("US-ASCII")).isEmpty)
  }

  /** Independent EBML writer for the Matroska tests: id bytes verbatim,
    * size vints built from the spec definition (marker bit in unary
    * position, 7·width data bits big-endian), optional forced width and
    * the reserved all-ones unknown-size pattern.
    */
  private def ebml(id: Long, payload: Array[Byte], sizeWidth: Int = 0,
      unknownSize: Boolean = false): Array[Byte] = {
    val idn = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    val idB = Array.tabulate[Byte](idn)(i =>
      ((id >>> (8 * (idn - 1 - i))) & 0xff).toByte)
    val sz = payload.length.toLong
    var w = math.max(1, sizeWidth)
    while (!unknownSize && (1L << (7 * w)) - 1 <= sz && w < 8) w += 1
    val szB =
      if (unknownSize)
        Array.tabulate[Byte](w)(i =>
          if (i == 0) (0xff >>> (w - 1) | (0x80 >>> (w - 1))).toByte
          else 0xff.toByte)
      else {
        val out = Array.tabulate[Byte](w)(i =>
          ((sz >>> (8 * (w - 1 - i))) & 0xff).toByte)
        out(0) = (out(0) | (0x80 >>> (w - 1))).toByte
        out
      }
    idB ++ szB ++ payload
  }
  private def ebmlU(v: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    Array.tabulate[Byte](n)(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  /** A webm/matroska fixture: Info (scale 500000 ns unless omitted,
    * Duration 8000 ticks float32/64 → 4000 ms), audio entry first, video
    * VP9 1280×720.
    */
  private def mkvFixture(
      docType: String = "webm",
      sizeWidth: Int = 0,
      unknownSegSize: Boolean = false,
      float64: Boolean = false,
      omitScale: Boolean = false,
      audioOnly: Boolean = false): Array[Byte] = {
    val dur =
      if (float64) java.nio.ByteBuffer.allocate(8).putDouble(8000.0).array()
      else java.nio.ByteBuffer.allocate(4).putFloat(8000.0f).array()
    val info = ebml(0x1549a966L,
      (if (omitScale) Array.empty[Byte]
       else ebml(0x2ad7b1L, ebmlU(500000L), sizeWidth)) ++
        ebml(0x4489L, dur, sizeWidth), sizeWidth)
    val aTrack = ebml(0xaeL,
      ebml(0x83L, ebmlU(2L)) ++ ebml(0x86L, "A_OPUS".getBytes("US-ASCII")))
    val vTrack = ebml(0xaeL,
      ebml(0x83L, ebmlU(1L)) ++ ebml(0x86L, "V_VP9".getBytes("US-ASCII")) ++
        ebml(0xe0L, ebml(0xb0L, ebmlU(1280L)) ++ ebml(0xbaL, ebmlU(720L)),
          sizeWidth), sizeWidth)
    val tracks = ebml(0x1654ae6bL,
      if (audioOnly) aTrack else aTrack ++ vTrack, sizeWidth)
    ebml(0x1a45dfa3L,
      ebml(0x4282L, docType.getBytes("US-ASCII"), sizeWidth), sizeWidth) ++
      ebml(0x18538067L, info ++ tracks, sizeWidth,
        unknownSize = unknownSegSize)
  }

  test("parseMkv walks EBML: DocType, scale default, float widths, vint widths, track precedence") {
    import Multimodal.StubDecoder._
    // scale 500000 ns → 2000 ticks/s; 8000 ticks → 4000 ms; audio entry
    // skipped in favour of the VP9 video track
    val want = Some(("webm", 2000L, 4000L, 1280, 720, "V_VP9"))
    assert(parseMkv(mkvFixture()) === want)
    // float64 duration, non-minimal 2-byte size vints, unknown-size
    // Segment, matroska DocType — all the same metadata
    assert(parseMkv(mkvFixture(float64 = true)) === want)
    assert(parseMkv(mkvFixture(sizeWidth = 2)) === want)
    assert(parseMkv(mkvFixture(unknownSegSize = true)) === want)
    assert(parseMkv(mkvFixture(docType = "matroska")).map(_._1) ===
      Some("matroska"))
    // omitted TimestampScale: the spec default 1,000,000 ns → 1000 t/s,
    // 8000 ticks → 8000 ms
    assert(parseMkv(mkvFixture(omitScale = true)) ===
      Some(("webm", 1000L, 8000L, 1280, 720, "V_VP9")))
    // no video track: dims 0, codec falls back to the first track
    assert(parseMkv(mkvFixture(audioOnly = true)) ===
      Some(("webm", 2000L, 4000L, 0, 0, "A_OPUS")))
    // videoMetaInfo routes EBML payloads to the mkv format
    assert(videoMetaInfo(mkvFixture())._1 === "mkv")
  }

  test("parseMkv survives truncation, desync and hostile sizes (never throws)") {
    import Multimodal.StubDecoder._
    for (g <- Seq(mkvFixture(), mkvFixture(sizeWidth = 2),
      mkvFixture(unknownSegSize = true))) {
      (0 until g.length).foreach { n => parseMkv(g.take(n)) } // no throw
      assert(parseMkv(g.take(12)).isEmpty) // header alone: no Segment
    }
    val good = mkvFixture()
    // a size vint claiming to run past the buffer ends the walk → None
    val overrun = good.clone()
    // Segment size byte(s) start right after its 4-byte ID; force a huge
    // declared size (marker 0x01 → 8-byte vint ≫ buffer)
    val segOff = good.indexOfSlice(Seq(0x18, 0x53, 0x80, 0x67).map(_.toByte))
    overrun(segOff + 4) = 0x01
    assert(parseMkv(overrun).isEmpty)
    // a zero first byte where a vint must start (no marker bit) desyncs
    val desync = good.clone()
    desync(segOff + 4) = 0x00
    assert(parseMkv(desync).isEmpty)
    // non-EBML payloads
    assert(parseMkv(Array.empty[Byte]).isEmpty)
    assert(parseMkv("RIFF....WAVE".getBytes("US-ASCII")).isEmpty)
    assert(parseMkv(mp4Fixture(v1 = false)).isEmpty)
  }

  test("videoMeta end-to-end over mixed planted containers") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "video", mp4Fixture(v1 = false)),
        Row(2L, "video", mp4Fixture(v1 = true, codec = "av01")),
        Row(3L, "blob", Array[Byte](9, 9, 9))),
      schema)
    val got = Multimodal.videoMeta(df)
      .select("media_id", "format", "brand", "duration_ms", "width", "codec")
      .as[(Long, String, String, Long, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "mp4", "isom", 5000L, 640, "avc1")))
    assert(got(2L) === ((2L, "mp4", "isom", 5000L, 640, "av01")))
    assert(got(3L) === ((3L, "stub", "", 0L, 0, "")))
  }

  test("resize emits fixed-size payloads with updated dimension columns") {
    import spark.implicits._
    val resized = Multimodal.resize(Multimodal.decode(media), width = 8, height = 4)
    val rows = resized
      .select("media_id", "width", "height", "channels", "n_bytes", "content")
      .as[(Long, Int, Int, Int, Int, Array[Byte])].collect()
    assert(rows.nonEmpty)
    // every payload is exactly w*h*c bytes — the batch-shape contract
    assert(rows.forall { case (_, w, h, c, n, b) =>
      w == 8 && h == 4 && c == 3 && n == 96 && b.length == 96
    })
    assert(resized.schema === Multimodal.decodedSchema)
  }
}
