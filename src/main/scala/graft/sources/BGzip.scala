package graft.sources

import java.io.{InputStream, OutputStream}
import java.util.zip.{CRC32, Deflater, Inflater, ZipException}

import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream, CompressionOutputStream, Compressor, Decompressor, SplitCompressionInputStream, SplittableCompressionCodec}
import org.apache.spark.sql.SparkSession

/** Block-gzip (BGZF) support: a Hadoop `SplittableCompressionCodec` so a
  * single multi-GB `.vcf.bgz` file scans as MANY parallel input splits
  * (each task resyncs to the next 64 KiB bgzip block boundary), plus a
  * BGZF-conformant writer for export. The wire format is the public BGZF
  * spec (SAM/BAM specification §4.1): concatenated gzip members, each
  * carrying a `BC` extra subfield with the compressed block size, ending
  * with a fixed 28-byte empty-block EOF marker.
  *
  * Reference behavior: `io/compress/BGzipCodec.java` /
  * `BGzipInputStream.java` (used by `LoadVCF.scala` to parallelize
  * `.vcf.bgz` import). Split semantics follow Hadoop's BYBLOCK contract:
  * a split [start, end) owns every block whose first byte lies in it;
  * `getPos()` reports blockStart + 1 once a block's first byte has been
  * delivered, so `LineRecordReader`'s `pos <= end` loop hands a block
  * starting exactly at `end` to the NEXT split (which resyncs there and
  * discards its first partial line, per the standard text-split
  * protocol).
  */
object BGzip {
  val MaxBlockSize = 64 * 1024
  // per the BAM spec, compress at most 64K-256 bytes per block so the
  // compressed block (header+payload+footer) always fits in 64K
  val DefaultUncompressedBlockSize: Int = MaxBlockSize - 256
  val HeaderLength = 18
  val FooterLength = 8

  /** The spec's fixed empty-block EOF marker. */
  val EofMarker: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0x06,
    0x00, 0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00).map(_.toByte)

  /** Parsed BGZF member header at `buf(off)`: `bsize` = total compressed
    * block length, `dataOff`/`dataLen` = the raw-deflate payload, `isize`
    * = uncompressed length (from the footer). Throws ZipException unless
    * the bytes are a complete, well-formed BGZF block — used both for
    * decoding and for resync-by-scanning, where a false-positive gzip
    * magic inside compressed data must fail the parse. */
  final case class BlockHeader(bsize: Int, dataOff: Int, dataLen: Int,
      isize: Int)

  def parseBlock(buf: Array[Byte], off: Int, len: Int): BlockHeader = {
    def u8(i: Int): Int = buf(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def bad() = throw new ZipException("not a BGZF block")
    if (off + 26 > len) bad()
    // gzip magic, deflate method, FEXTRA flag set
    if (u8(off) != 0x1f || u8(off + 1) != 0x8b || u8(off + 2) != 8 ||
      (u8(off + 3) & 4) != 4) bad()
    val xlen = u16(off + 10)
    if (xlen < 6 || off + 12 + xlen > len) bad()
    // find the BC subfield among the extra fields
    var i = off + 12
    var bsize = -1
    while (i < off + 12 + xlen) {
      if (i + 4 > len) bad()
      val sublen = u16(i + 2)
      if (i + 4 + sublen > len) bad()
      if (u8(i) == 'B' && u8(i + 1) == 'C') {
        if (sublen != 2) bad()
        bsize = u16(i + 4) + 1
      }
      i += 4 + sublen
    }
    if (i != off + 12 + xlen || bsize < 0 || bsize > MaxBlockSize) bad()
    if (off + bsize > len) bad()
    val isize = u16(off + bsize - 4) | (u16(off + bsize - 2) << 16)
    if (isize < 0 || isize > MaxBlockSize) bad()
    BlockHeader(bsize, off + 12 + xlen, bsize - 12 - xlen - FooterLength,
      isize)
  }

  /** Register the codec with the session's Hadoop conf (idempotent) so
    * `spark.read.text` / `df.write.text` resolve `.bgz` through it. The
    * built-in codecs stay registered via Hadoop's ServiceLoader
    * discovery; this property only prepends ours. */
  def register(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "io.compression.codecs"
    val cls = classOf[BGzipCodec].getName
    val cur = conf.get(key, "")
    if (!cur.split(",").map(_.trim).contains(cls))
      conf.set(key, if (cur.isEmpty) cls else s"$cls,$cur")
  }
}

/** Hadoop codec class (instantiated reflectively by
  * `CompressionCodecFactory`; claims the `.bgz` extension). Compressor /
  * decompressor pooling is unused — each stream owns its own
  * `Inflater`/`Deflater`. */
final class BGzipCodec extends CompressionCodec
    with SplittableCompressionCodec {
  override def getDefaultExtension: String = ".bgz"

  override def createInputStream(in: InputStream): CompressionInputStream =
    new BGzipSplitInputStream(in, 0L, Long.MaxValue)

  override def createInputStream(in: InputStream, d: Decompressor)
      : CompressionInputStream = createInputStream(in)

  override def createInputStream(seekableIn: InputStream, d: Decompressor,
      start: Long, end: Long,
      readMode: SplittableCompressionCodec.READ_MODE)
      : SplitCompressionInputStream =
    new BGzipSplitInputStream(seekableIn, start, end)

  override def createOutputStream(out: OutputStream)
      : CompressionOutputStream = new BGzipOutputStream(out)

  override def createOutputStream(out: OutputStream, c: Compressor)
      : CompressionOutputStream = createOutputStream(out)

  override def createCompressor(): Compressor = null
  override def createDecompressor(): Decompressor = null
  override def getCompressorType: Class[_ <: Compressor] = null
  override def getDecompressorType: Class[_ <: Decompressor] = null
}

/** BGZF reader for one split [start, end): seeks to `start`, resyncs to
  * the first whole block boundary, then decompresses block by block with
  * one reused raw `Inflater`. See `BGzip` scaladoc for the position
  * contract that makes concurrent splits partition the file exactly. */
final class BGzipSplitInputStream(in: InputStream, start: Long, end: Long)
    extends SplitCompressionInputStream(in, start, end) {
  import BGzip._

  // compressed-side buffer: 2 max blocks, so any whole block (and any
  // candidate header during resync) is always fully buffered
  private val inBuf = new Array[Byte](2 * MaxBlockSize)
  private var inLen = 0 // valid bytes in inBuf
  private var inPos = 0 // next unconsumed byte
  private var inFilePos = 0L // compressed-file offset of inBuf(0)

  private val outBuf = new Array[Byte](MaxBlockSize)
  private var outLen = 0
  private var outPos = 0

  // reported split position; advances to blockStart+1 when a block's
  // first byte is delivered (the +1 keeps an end-aligned block out of
  // this split — see BGzip scaladoc)
  private var reportedPos = start
  // compressed-file offset of the block currently held in outBuf
  private var curBlockFilePos = start

  private val inflater = new Inflater(true) // nowrap: raw deflate payload

  {
    in match {
      case s: org.apache.hadoop.fs.Seekable if start > 0 => s.seek(start)
      case _ =>
    }
    inFilePos = start
    resync()
    inflateNextBlock()
  }

  /** Top up `inBuf` from the underlying stream (compacting first). */
  private def fill(): Unit = {
    System.arraycopy(inBuf, inPos, inBuf, 0, inLen - inPos)
    inFilePos += inPos
    inLen -= inPos
    inPos = 0
    var n = 0
    while (inLen < inBuf.length && n >= 0) {
      n = in.read(inBuf, inLen, inBuf.length - inLen)
      if (n > 0) inLen += n
    }
  }

  /** Position `inPos` at the first byte of the first complete BGZF block
    * at-or-after `start`. At offset 0 the file must begin with a block;
    * elsewhere scan for a gzip magic whose full header parses (a
    * spurious magic inside compressed payload fails `parseBlock`). */
  private def resync(): Unit = {
    fill()
    if (start == 0L) return
    var i = 0
    while (i < inLen - 1) {
      if ((inBuf(i) & 0xff) == 0x1f && (inBuf(i + 1) & 0xff) == 0x8b) {
        try {
          parseBlock(inBuf, i, inLen)
          inPos = i
          return
        } catch { case _: ZipException => }
      }
      i += 1
    }
    inPos = inLen // no block starts in this split's range: empty split
  }

  /** Decode the next non-empty block into `outBuf` (empty blocks — the
    * EOF marker — are skipped). `outLen` == 0 afterwards means EOF. */
  @annotation.tailrec
  private def inflateNextBlock(): Unit = {
    outLen = 0
    outPos = 0
    if (inLen - inPos < MaxBlockSize) fill()
    if (inPos == inLen) return // true end of stream
    val h = parseBlock(inBuf, inPos, inLen)
    val blockStart = inPos
    curBlockFilePos = inFilePos + blockStart
    inPos += h.bsize
    if (h.isize == 0) inflateNextBlock()
    else {
      inflater.reset()
      inflater.setInput(inBuf, blockStart + (h.dataOff - blockStart),
        h.dataLen)
      while (outLen < h.isize && !inflater.finished()) {
        val n = inflater.inflate(outBuf, outLen, h.isize - outLen)
        if (n == 0 && inflater.needsInput())
          throw new ZipException("truncated BGZF block")
        outLen += n
      }
      if (outLen != h.isize)
        throw new ZipException("BGZF ISIZE mismatch")
    }
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    if (outLen == 0) return -1
    if (outPos == 0) reportedPos = curBlockFilePos + 1
    val n = math.min(len, outLen - outPos)
    System.arraycopy(outBuf, outPos, b, off, n)
    outPos += n
    if (outPos == outLen) inflateNextBlock()
    n
  }

  override def read(): Int = {
    val one = new Array[Byte](1)
    val n = read(one, 0, 1)
    if (n < 0) -1 else one(0) & 0xff
  }

  override def getPos: Long = reportedPos

  override def resetState(): Unit = {}

  override def close(): Unit = {
    inflater.end()
    super.close()
  }
}

/** BGZF writer: buffers `blockSize` uncompressed bytes, deflates each
  * chunk into its own gzip member with the `BC` length subfield, and
  * finishes with the spec's empty-block EOF marker. Output is readable
  * by any plain-gzip reader AND seekable/splittable by block. */
final class BGzipOutputStream(out: OutputStream,
    blockSize: Int = BGzip.DefaultUncompressedBlockSize)
    extends CompressionOutputStream(out) {
  require(blockSize > 0 && blockSize <= BGzip.DefaultUncompressedBlockSize)

  private val plain = new Array[Byte](blockSize)
  private var nPlain = 0
  private val packed = new Array[Byte](BGzip.MaxBlockSize)
  private val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
  private val storeDeflater = new Deflater(Deflater.NO_COMPRESSION, true)
  private val crc = new CRC32
  private var finished = false

  override def write(b: Int): Unit = {
    plain(nPlain) = b.toByte
    nPlain += 1
    if (nPlain == blockSize) flushBlock()
  }

  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    var o = off
    var left = len
    while (left > 0) {
      val n = math.min(blockSize - nPlain, left)
      System.arraycopy(b, o, plain, nPlain, n)
      nPlain += n
      o += n
      left -= n
      if (nPlain == blockSize) flushBlock()
    }
  }

  private def deflateWith(d: Deflater): Int = {
    d.reset()
    d.setInput(plain, 0, nPlain)
    d.finish()
    val max = BGzip.MaxBlockSize - BGzip.HeaderLength - BGzip.FooterLength
    val n = d.deflate(packed, 0, max)
    if (d.finished()) n else -1
  }

  private def flushBlock(): Unit = {
    if (nPlain == 0) return
    // incompressible data can expand: fall back to stored (level-0)
    // blocks, which by the blockSize bound always fit
    val nPacked = deflateWith(deflater) match {
      case -1 => deflateWith(storeDeflater)
      case n => n
    }
    crc.reset()
    crc.update(plain, 0, nPlain)
    val total = BGzip.HeaderLength + nPacked + BGzip.FooterLength
    val h = new Array[Byte](BGzip.HeaderLength)
    h(0) = 0x1f.toByte; h(1) = 0x8b.toByte; h(2) = 8; h(3) = 4 // FEXTRA
    // bytes 4-9: mtime 0, xfl 0, os 0xff
    h(9) = 0xff.toByte
    h(10) = 6 // xlen
    h(12) = 'B'; h(13) = 'C'; h(14) = 2 // BC subfield, length 2
    h(16) = ((total - 1) & 0xff).toByte
    h(17) = (((total - 1) >> 8) & 0xff).toByte
    out.write(h)
    out.write(packed, 0, nPacked)
    writeInt(crc.getValue.toInt)
    writeInt(nPlain)
    nPlain = 0
  }

  private def writeInt(v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  override def finish(): Unit = {
    if (!finished) {
      flushBlock()
      out.write(BGzip.EofMarker)
      finished = true
    }
  }

  override def resetState(): Unit = {}

  override def close(): Unit = {
    finish()
    out.flush()
    super.close()
  }
}
