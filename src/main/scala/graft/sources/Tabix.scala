package graft.sources

import java.util.zip.Inflater

import org.apache.hadoop.fs.FSDataInputStream
import org.apache.spark.sql.SparkSession

/** Tabix (.tbi) index support for bgzip-compressed VCFs — the seek half
  * of splittable-bgz input: a region query reads ONLY the bgzip blocks
  * its records live in, never the rest of a 200 GB file.
  *
  * Format per the public tabix spec (samtools hts-specs tabix.pdf):
  * a bgzip-wrapped little-endian binary with the UCSC 5-level binning
  * scheme (bins 0/1-8/9-72/73-584/585-4680/4681-37448) plus a 16 kb
  * linear index; chunk bounds are BGZF virtual offsets
  * (blockAddress << 16 | intraBlockOffset). Reference behavior:
  * `io/tabix/TabixReader.scala` (reader), htsjdk TabixIndexCreator
  * (writer, used by the reference's `tabix=True` VCF export). */
object Tabix {

  val LinearShift = 14 // 16 kb windows

  final case class Index(
      seqs: IndexedSeq[String],
      colSeq: Int, colBeg: Int, colEnd: Int, meta: Int,
      // per-ref: bin -> chunks [(vBeg, vEnd)], and the linear index
      bins: IndexedSeq[Map[Int, IndexedSeq[(Long, Long)]]],
      linear: IndexedSeq[IndexedSeq[Long]]) {
    def tid(contig: String): Int = seqs.indexOf(contig)
  }

  // ---- binning scheme (tabix spec §5.1) ----------------------------------

  /** Bin containing the whole 0-based half-open interval [beg, end). */
  def reg2bin(beg: Int, end0: Int): Int = {
    val end = end0 - 1
    if (beg >> 14 == end >> 14) ((1 << 15) - 1) / 7 + (beg >> 14)
    else if (beg >> 17 == end >> 17) ((1 << 12) - 1) / 7 + (beg >> 17)
    else if (beg >> 20 == end >> 20) ((1 << 9) - 1) / 7 + (beg >> 20)
    else if (beg >> 23 == end >> 23) ((1 << 6) - 1) / 7 + (beg >> 23)
    else if (beg >> 26 == end >> 26) ((1 << 3) - 1) / 7 + (beg >> 26)
    else 0
  }

  /** All bins overlapping [beg, end) — the candidate set for a query. */
  def reg2bins(beg: Int, end0: Int): IndexedSeq[Int] = {
    if (beg >= end0) return IndexedSeq.empty
    val end = math.min(end0, 1 << 29) - 1
    val out = IndexedSeq.newBuilder[Int]
    out += 0
    (1 + (beg >> 26) to 1 + (end >> 26)).foreach(out += _)
    (9 + (beg >> 23) to 9 + (end >> 23)).foreach(out += _)
    (73 + (beg >> 20) to 73 + (end >> 20)).foreach(out += _)
    (585 + (beg >> 17) to 585 + (end >> 17)).foreach(out += _)
    (4681 + (beg >> 14) to 4681 + (end >> 14)).foreach(out += _)
    out.result()
  }

  // ---- read --------------------------------------------------------------

  private def rInt(in: java.io.InputStream): Int =
    (in.read() & 0xff) | ((in.read() & 0xff) << 8) |
      ((in.read() & 0xff) << 16) | ((in.read() & 0xff) << 24)

  private def rLong(in: java.io.InputStream): Long =
    (rInt(in) & 0xffffffffL) | ((rInt(in) & 0xffffffffL) << 32)

  /** Parse a .tbi file (itself bgzip-compressed). */
  def read(spark: SparkSession, tbiPath: String): Index = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tbiPath), spark.sparkContext.hadoopConfiguration)
    val raw = fs.open(new org.apache.hadoop.fs.Path(tbiPath))
    val in = new BGzipSplitInputStream(raw, 0L, Long.MaxValue)
    try {
      val magic = new Array[Byte](4)
      var got = 0
      while (got < 4) got += in.read(magic, got, 4 - got)
      require(magic.sameElements(Array[Byte]('T', 'B', 'I', 1)),
        s"$tbiPath: bad tabix magic")
      val nRef = rInt(in)
      val format = rInt(in)
      require(format == 2, s"$tbiPath: only VCF tabix supported")
      val colSeq = rInt(in); val colBeg = rInt(in); val colEnd = rInt(in)
      val meta = rInt(in); rInt(in) // skip lines count
      val nmLen = rInt(in)
      val nm = new Array[Byte](nmLen)
      got = 0
      while (got < nmLen) got += in.read(nm, got, nmLen - got)
      val seqs = new String(nm, "UTF-8").split("\u0000", -1)
        .filter(_.nonEmpty).toIndexedSeq
      require(seqs.length == nRef, s"$tbiPath: name/ref count mismatch")
      val bins = IndexedSeq.newBuilder[Map[Int, IndexedSeq[(Long, Long)]]]
      val linear = IndexedSeq.newBuilder[IndexedSeq[Long]]
      (0 until nRef).foreach { _ =>
        val nBin = rInt(in)
        val bm = Map.newBuilder[Int, IndexedSeq[(Long, Long)]]
        (0 until nBin).foreach { _ =>
          val bin = rInt(in)
          val nChunk = rInt(in)
          bm += bin -> (0 until nChunk).map(_ => (rLong(in), rLong(in)))
        }
        bins += bm.result()
        val nIntv = rInt(in)
        linear += (0 until nIntv).map(_ => rLong(in))
      }
      Index(seqs, colSeq, colBeg, colEnd, meta, bins.result(),
        linear.result())
    } finally in.close()
  }

  /** Merged chunk list (virtual-offset ranges) overlapping the 0-based
    * half-open region [beg, end) of `tid` — bin candidates filtered by
    * the linear index's minimum offset, then sorted and merged. The
    * ranges over-cover (binning is inexact); callers re-filter rows by
    * position. */
  def queryChunks(idx: Index, tid: Int, beg: Int, end: Int)
      : IndexedSeq[(Long, Long)] = {
    if (tid < 0 || tid >= idx.bins.length) return IndexedSeq.empty
    val lin = idx.linear(tid)
    val minOff =
      if (lin.isEmpty) 0L
      else if ((beg >> LinearShift) >= lin.length) lin.last
      else lin(beg >> LinearShift)
    val raw = reg2bins(beg, end)
      .flatMap(idx.bins(tid).getOrElse(_, IndexedSeq.empty))
      .filter { case (_, e) => java.lang.Long.compareUnsigned(minOff, e) < 0 }
      .sortWith((a, b) => java.lang.Long.compareUnsigned(a._1, b._1) < 0)
    // merge overlapping / same-block-adjacent chunks
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    raw.foreach { c =>
      if (out.nonEmpty &&
        (java.lang.Long.compareUnsigned(c._1, out.last._2) <= 0 ||
          (out.last._2 >> 16) == (c._1 >> 16))) {
        if (java.lang.Long.compareUnsigned(c._2, out.last._2) > 0)
          out(out.length - 1) = (out.last._1, c._2)
      } else out += c
    }
    out.toIndexedSeq
  }

  // ---- write -------------------------------------------------------------

  /** Index a single position-sorted `.vcf.bgz` file, writing
    * `<path>.tbi` (the role of the reference's `tabix=True` export
    * option / htsjdk TabixIndexCreator). One pass over the compressed
    * file on the driver — indexing reads every block once by nature;
    * the parallel payoff is every later region query. */
  def write(spark: SparkSession, bgzPath: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(bgzPath), spark.sparkContext.hadoopConfiguration)
    val raw = fs.open(new org.apache.hadoop.fs.Path(bgzPath))
    val lines = new BGzipVirtualLineReader(raw)
    val seqs = scala.collection.mutable.ArrayBuffer.empty[String]
    var curSeq: String = null
    var tid = -1
    // per-ref accumulators
    val binChunks = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.LinkedHashMap[Int,
        scala.collection.mutable.ArrayBuffer[(Long, Long)]]]
    val linIdx = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.ArrayBuffer[Long]]
    try {
      var v0 = lines.virtualOffset
      var line = lines.readLine()
      while (line != null) {
        if (line.nonEmpty && line.charAt(0) != '#') {
          val f1 = line.indexOf('\t')
          val f2 = line.indexOf('\t', f1 + 1)
          val f3 = line.indexOf('\t', f2 + 1)
          val f4 = line.indexOf('\t', f3 + 1)
          val contig = line.substring(0, f1)
          val pos1 = line.substring(f1 + 1, f2).toInt // 1-based
          val refLen = f4 - f3 - 1 // REF column width
          val beg = pos1 - 1
          val end = beg + math.max(1, refLen)
          if (contig != curSeq) {
            require(!seqs.contains(contig),
              s"$bgzPath: not contig-grouped at $contig")
            curSeq = contig; tid += 1
            seqs += contig
            binChunks += scala.collection.mutable.LinkedHashMap.empty
            linIdx += scala.collection.mutable.ArrayBuffer.empty
          }
          val vEnd = lines.virtualOffset
          val bin = reg2bin(beg, end)
          val chunks = binChunks(tid)
            .getOrElseUpdate(bin,
              scala.collection.mutable.ArrayBuffer.empty)
          // records of one bin are contiguous in a sorted VCF: extend
          if (chunks.nonEmpty && chunks.last._2 == v0)
            chunks(chunks.length - 1) = (chunks.last._1, vEnd)
          else chunks += ((v0, vEnd))
          val li = linIdx(tid)
          var w = beg >> LinearShift
          val wEnd = (end - 1) >> LinearShift
          while (w <= wEnd) {
            while (li.length <= w) li += 0L
            if (li(w) == 0L) li(w) = v0
            w += 1
          }
        }
        v0 = lines.virtualOffset
        line = lines.readLine()
      }
    } finally lines.close()
    // backfill unset linear slots with the previous offset (spec behavior)
    linIdx.foreach { li =>
      var prev = 0L
      var i = 0
      while (i < li.length) {
        if (li(i) == 0L) li(i) = prev else prev = li(i)
        i += 1
      }
    }
    // serialize (bgzip-wrapped)
    val outRaw = fs.create(
      new org.apache.hadoop.fs.Path(bgzPath + ".tbi"), true)
    val out = new BGzipOutputStream(outRaw)
    def wInt(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def wLong(v: Long): Unit = { wInt(v.toInt); wInt((v >>> 32).toInt) }
    try {
      out.write(Array[Byte]('T', 'B', 'I', 1))
      val names = seqs.toSeq
      wInt(names.length)
      wInt(2); wInt(1); wInt(2); wInt(0) // format=VCF, seq/beg cols, end=0
      wInt('#'); wInt(0) // meta char, skip
      val nmBytes = names.map(_ + "\u0000").mkString.getBytes("UTF-8")
      wInt(nmBytes.length); out.write(nmBytes)
      names.indices.foreach { t =>
        wInt(binChunks(t).size)
        binChunks(t).foreach { case (bin, chunks) =>
          wInt(bin); wInt(chunks.length)
          chunks.foreach { case (b, e) => wLong(b); wLong(e) }
        }
        wInt(linIdx(t).length)
        linIdx(t).foreach(wLong)
      }
    } finally out.close()
  }
}

/** Line reader over a BGZF file with virtual-offset tell/seek — the
  * random-access primitive tabix chunks point into. Decompresses one
  * block at a time with a reused raw Inflater (same decode core as
  * `BGzipSplitInputStream`, plus positioned re-entry). */
final class BGzipVirtualLineReader(raw: FSDataInputStream)
    extends AutoCloseable {
  import BGzip._

  private val inBuf = new Array[Byte](2 * MaxBlockSize)
  private var inLen = 0
  private var inPos = 0
  private var inFilePos = 0L
  private val outBuf = new Array[Byte](MaxBlockSize)
  private var outLen = 0
  private var outPos = 0
  private var curBlock = 0L
  private var eof = false
  private val inflater = new Inflater(true)
  private val sb = new java.lang.StringBuilder(256)

  loadBlockAt(0L)

  private def fill(): Unit = {
    System.arraycopy(inBuf, inPos, inBuf, 0, inLen - inPos)
    inFilePos += inPos
    inLen -= inPos
    inPos = 0
    var n = 0
    while (inLen < inBuf.length && n >= 0) {
      n = raw.read(inBuf, inLen, inBuf.length - inLen)
      if (n > 0) inLen += n
    }
  }

  // parseBlock returns offsets relative to inBuf
  @annotation.tailrec
  private def inflateAt(): Unit = {
    outLen = 0; outPos = 0
    if (inLen - inPos < MaxBlockSize) fill()
    if (inPos == inLen) { eof = true; return }
    val h = parseBlock(inBuf, inPos, inLen)
    curBlock = inFilePos + inPos
    inPos += h.bsize
    if (h.isize == 0) inflateAt()
    else {
      inflater.reset()
      inflater.setInput(inBuf, h.dataOff, h.dataLen)
      while (outLen < h.isize && !inflater.finished())
        outLen += inflater.inflate(outBuf, outLen, h.isize - outLen)
    }
  }

  private def loadBlockAt(addr: Long): Unit = {
    raw.seek(addr)
    inLen = 0; inPos = 0; inFilePos = addr; eof = false
    inflateAt()
  }

  /** Virtual offset of the NEXT byte to be read. */
  def virtualOffset: Long =
    if (eof) (inFilePos + inPos) << 16
    else (curBlock << 16) | outPos.toLong

  def virtualSeek(v: Long): Unit = {
    val addr = v >>> 16
    val intra = (v & 0xffff).toInt
    if (eof || addr != curBlock) loadBlockAt(addr)
    require(intra <= outLen, s"bad virtual offset $v")
    outPos = intra
  }

  /** Next line (without terminator), or null at EOF. */
  def readLine(): String = {
    if (eof) return null
    sb.setLength(0)
    var done = false
    while (!done) {
      if (outPos == outLen) {
        inflateAt()
        if (eof) { done = true }
      } else {
        val b = outBuf(outPos)
        outPos += 1
        if (b == '\n') done = true
        else if (b != '\r') sb.append((b & 0xff).toChar)
      }
    }
    if (sb.length == 0 && eof) null else sb.toString
  }

  override def close(): Unit = {
    inflater.end()
    raw.close()
  }
}
