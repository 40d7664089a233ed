package graft.sources

import java.io.{ByteArrayOutputStream, EOFException, IOException, InputStream}
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.hadoop.fs.Seekable
import org.apache.hadoop.io.compress.{
  Decompressor, GzipCodec, SplitCompressionInputStream, SplittableCompressionCodec
}

/** Splittable BGZF (block-gzip) codec, implemented from the public BGZF
  * specification (SAM format spec §4.1): the file is a series of complete
  * gzip members, each carrying its own compressed size (BSIZE) in a gzip
  * extra subfield, so any worker can seek into the middle of a 100 GB
  * `.bgz` sumstats file, scan forward to the next block magic, and
  * decompress only its slice — block-gzipped TSVs read in parallel instead
  * of single-threaded (reference contract: common/session.py:473-497).
  *
  * Registered via `GSession.enableSplittableGzip` /
  * `io.compression.codecs`; claims the `.bgz` extension so plain `.gz`
  * files keep the built-in non-splittable path.
  */
class BgzfCodec extends GzipCodec with SplittableCompressionCodec {

  override def getDefaultExtension: String = ".bgz"

  override def createInputStream(
      seekableIn: InputStream,
      decompressor: Decompressor,
      start: Long,
      end: Long,
      readMode: SplittableCompressionCodec.READ_MODE
  ): SplitCompressionInputStream =
    new BgzfCodec.BgzfSplitInputStream(seekableIn, start, end)
}

object BgzfCodec {

  /** BGZF fixed header: gzip magic, deflate, FEXTRA; XLEN=6; BC subfield. */
  private val HeaderLen = 18
  private val FooterLen = 8

  /** Parse BSIZE (total block length − 1) from a BGZF header; -1 if the
    * bytes are not a BGZF block start.
    */
  private def parseBsize(h: Array[Byte], off: Int, len: Int): Int = {
    if (len < HeaderLen) return -1
    if ((h(off) & 0xff) != 0x1f || (h(off + 1) & 0xff) != 0x8b ||
      (h(off + 2) & 0xff) != 0x08 || ((h(off + 3) & 0x04) == 0)) return -1
    val xlen = ((h(off + 11) & 0xff) << 8) | (h(off + 10) & 0xff)
    if (xlen < 6) return -1
    // scan extra subfields for SI1=66 SI2=67 SLEN=2
    var p = off + 12
    val extraEnd = off + 12 + math.min(xlen, len - 12)
    while (p + 4 <= extraEnd) {
      val si1 = h(p) & 0xff
      val si2 = h(p + 1) & 0xff
      val slen = ((h(p + 3) & 0xff) << 8) | (h(p + 2) & 0xff)
      if (si1 == 66 && si2 == 67 && slen == 2) {
        if (p + 6 > off + len) return -1
        return (((h(p + 5) & 0xff) << 8) | (h(p + 4) & 0xff))
      }
      p += 4 + slen
    }
    -1
  }

  /** Split-aware BGZF reader. Ownership convention (mirrors the built-in
    * BZip2 BYBLOCK codec): a split owns every block whose START offset lies
    * in [start, end). getPos() advertises `start-of-current-block + 1`,
    * updated when a block is entered, so Hadoop's LineRecordReader keeps
    * consuming records while blocks still start before the split end, then
    * reads exactly one spanning record into the first out-of-split block —
    * whose first line the next split symmetrically skips. The stream itself
    * therefore decompresses past `end` up to file EOF on demand.
    */
  final class BgzfSplitInputStream(in: InputStream, start: Long, end: Long)
      extends SplitCompressionInputStream(in, start, end) {

    private val seekable = in.asInstanceOf[Seekable]
    private var blockStart: Long = -1L
    private var nextBlock: Long = -1L
    private var reportedPos: Long = 0L
    private var buffer: Array[Byte] = Array.emptyByteArray
    private var bufPos: Int = 0
    private var eof = false

    // position the stream at the first BGZF block at or after `start`
    seekToFirstBlock(start)
    reportedPos = (if (eof) end else nextBlock) + 1

    private def seekToFirstBlock(target: Long): Unit = {
      seekable.seek(target)
      // read a window and scan for a validated block header; BGZF blocks are
      // ≤ 64 KiB, so one 64K+18 window always contains a boundary
      val window = new Array[Byte](65536 + HeaderLen)
      val got = readFully(window)
      var off = 0
      var found = -1
      while (found < 0 && off + HeaderLen <= got) {
        if (parseBsize(window, off, got - off) > 0) found = off
        else off += 1
      }
      if (found < 0) { eof = true }
      else {
        nextBlock = target + found
        seekable.seek(nextBlock)
      }
    }

    private def readFully(buf: Array[Byte]): Int = {
      var n = 0
      var r = 0
      while (n < buf.length && r >= 0) {
        r = in.read(buf, n, buf.length - n)
        if (r > 0) n += r
      }
      n
    }

    /** Decompress the block at `nextBlock` into `buffer`; false at file EOF
      * (split-end stopping is the record reader's job via getPos).
      */
    private def loadNextBlock(): Boolean = {
      if (eof) return false
      seekable.seek(nextBlock)
      val header = new Array[Byte](HeaderLen)
      val got = readFully(header)
      if (got < HeaderLen) { eof = true; return false }
      val bsize = parseBsize(header, 0, HeaderLen)
      if (bsize <= 0) { eof = true; return false }
      val total = bsize + 1
      val rest = new Array[Byte](total - HeaderLen)
      if (readFully(rest) < rest.length)
        throw new IOException(s"truncated BGZF block at $nextBlock")
      val cdataLen = total - HeaderLen - FooterLen
      val isize = ((rest(rest.length - 1) & 0xff) << 24) |
        ((rest(rest.length - 2) & 0xff) << 16) |
        ((rest(rest.length - 3) & 0xff) << 8) |
        (rest(rest.length - 4) & 0xff)
      val out = new Array[Byte](isize)
      if (isize > 0) {
        val inflater = new Inflater(true)
        inflater.setInput(rest, 0, cdataLen)
        var n = 0
        while (n < isize && !inflater.finished()) {
          val r = inflater.inflate(out, n, isize - n)
          if (r == 0 && inflater.needsInput())
            throw new IOException(s"corrupt BGZF block at $nextBlock")
          n += r
        }
        inflater.end()
      }
      blockStart = nextBlock
      nextBlock += total
      reportedPos = blockStart + 1
      buffer = out
      bufPos = 0
      // the 28-byte EOF marker block decompresses to 0 bytes — skip through
      if (isize == 0) loadNextBlock() else true
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (bufPos >= buffer.length && !loadNextBlock()) return -1
      val n = math.min(len, buffer.length - bufPos)
      System.arraycopy(buffer, bufPos, b, off, n)
      bufPos += n
      n
    }

    override def read(): Int = {
      val one = new Array[Byte](1)
      val n = read(one, 0, 1)
      if (n < 0) -1 else one(0) & 0xff
    }

    override def getPos: Long = reportedPos

    override def resetState(): Unit = {
      buffer = Array.emptyByteArray
      bufPos = 0
      eof = false
    }
  }

  /** Compress `data` into a BGZF byte stream (test/fixture writer): complete
    * gzip members of ≤ `blockSize` uncompressed bytes each, closed by the
    * standard 28-byte EOF block.
    */
  def compress(data: Array[Byte], blockSize: Int = 65280): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var off = 0
    while (off < data.length) {
      val n = math.min(blockSize, data.length - off)
      out.write(block(data, off, n))
      off += n
    }
    out.write(block(Array.emptyByteArray, 0, 0)) // EOF marker
    out.toByteArray
  }

  private def block(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(data, off, len)
    deflater.finish()
    val cbuf = new Array[Byte](len + 64)
    var clen = 0
    while (!deflater.finished()) clen += deflater.deflate(cbuf, clen, cbuf.length - clen)
    deflater.end()
    val crc = new CRC32()
    crc.update(data, off, len)
    val total = HeaderLen + clen + FooterLen
    val b = new ByteArrayOutputStream(total)
    // gzip member header with FEXTRA + BC subfield
    b.write(Array[Int](0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff).map(_.toByte))
    b.write(6); b.write(0) // XLEN = 6
    b.write(66); b.write(67); b.write(2); b.write(0) // SI1 SI2 SLEN
    val bsize = total - 1
    b.write(bsize & 0xff); b.write((bsize >> 8) & 0xff)
    b.write(cbuf, 0, clen)
    val c = crc.getValue
    b.write((c & 0xff).toInt); b.write(((c >> 8) & 0xff).toInt)
    b.write(((c >> 16) & 0xff).toInt); b.write(((c >> 24) & 0xff).toInt)
    b.write(len & 0xff); b.write((len >> 8) & 0xff)
    b.write((len >> 16) & 0xff); b.write((len >> 24) & 0xff)
    b.toByteArray
  }
}
