package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Reference sequence lookup (reference
  * `genetics/reference_genome.py:341` `add_sequence`,
  * `functions.py` `get_sequence` / `getReferenceSequence`,
  * `ReferenceGenomeFunctions.scala`).
  *
  * The FASTA is parsed with its `.fai` index (the public samtools faidx
  * format: name, length, byte offset, bases per line, bytes per line) so
  * only the requested contigs' bytes are touched; sequences ship to
  * executors as a broadcast map and `getReferenceSequence` is a UDF over
  * it — per-row scalar lookup, off the entry hot path. For a whole-genome
  * FASTA restrict `contigs` to the ones the query touches. */
final class FastaSequence private[functions] (
    bc: org.apache.spark.broadcast.Broadcast[Map[String, String]])
    extends Serializable {

  /** Base(s) at [position − before, position + after] (1-based,
    * clamped to the contig like the reference; null for an unknown
    * contig). */
  def getReferenceSequence(contig: Column, position: Column,
      before: Column = lit(0), after: Column = lit(0)): Column = {
    val f = udf { (c: String, pos: Int, b: Int, a: Int) =>
      bc.value.get(c).map { seq =>
        val lo = math.max(1, pos - b)
        val hi = math.min(seq.length, pos + a)
        if (lo > hi) "" else seq.substring(lo - 1, hi)
      }.orNull
    }
    f(contig, position, before, after)
  }
}

object Fasta {

  private case class FaiEntry(name: String, length: Long, offset: Long,
      lineBases: Int, lineBytes: Int)

  /** Load (a subset of) a FASTA via its .fai index. `indexPath` defaults
    * to `fastaPath + ".fai"`. */
  def read(spark: SparkSession, fastaPath: String,
      indexPath: String = null, contigs: Set[String] = Set.empty)
      : FastaSequence = {
    val idxPath = Option(indexPath).getOrElse(fastaPath + ".fai")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(fastaPath),
      spark.sparkContext.hadoopConfiguration)
    val src = scala.io.Source.fromInputStream(
      fs.open(new org.apache.hadoop.fs.Path(idxPath)))
    val entries =
      try src.getLines().map { l =>
        val f = l.split("\t")
        FaiEntry(f(0), f(1).toLong, f(2).toLong, f(3).toInt, f(4).toInt)
      }.toIndexedSeq
      finally src.close()
    val wanted = entries.filter(e =>
      contigs.isEmpty || contigs.contains(e.name))
    val in = fs.open(new org.apache.hadoop.fs.Path(fastaPath))
    val seqs =
      try wanted.map { e =>
        // bytes on disk = full lines + remainder, with line terminators
        val nFull = e.length / e.lineBases
        val rem = (e.length % e.lineBases).toInt
        val nBytes = nFull * e.lineBytes + rem
        val buf = new Array[Byte](nBytes.toInt)
        in.readFully(e.offset, buf)
        val sb = new java.lang.StringBuilder(e.length.toInt)
        var i = 0
        while (i < buf.length) {
          val ch = buf(i).toChar
          if (ch != '\n' && ch != '\r') sb.append(ch)
          i += 1
        }
        e.name -> sb.toString
      }.toMap
      finally in.close()
    new FastaSequence(spark.sparkContext.broadcast(seqs))
  }

  /** Write a .fai for a local FASTA (convenience for tests / files
    * produced without samtools). */
  def buildIndex(spark: SparkSession, fastaPath: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(fastaPath),
      spark.sparkContext.hadoopConfiguration)
    val src = scala.io.Source.fromInputStream(
      fs.open(new org.apache.hadoop.fs.Path(fastaPath)))
    val out = new java.io.PrintWriter(fs.create(
      new org.apache.hadoop.fs.Path(fastaPath + ".fai"), true))
    try {
      var offset = 0L
      var name: String = null
      var seqStart = 0L
      var len = 0L
      var lineBases = 0
      var lineBytes = 0
      def flush(): Unit = if (name != null)
        out.println(s"$name\t$len\t$seqStart\t$lineBases\t$lineBytes")
      for (line <- src.getLines()) {
        val nb = line.getBytes("UTF-8").length
        if (line.startsWith(">")) {
          flush()
          name = line.drop(1).split("\\s+").head
          seqStart = offset + nb + 1
          len = 0; lineBases = 0; lineBytes = 0
        } else if (line.nonEmpty) {
          if (lineBases == 0) { lineBases = line.length
            lineBytes = nb + 1 }
          len += line.length
        }
        offset += nb + 1
      }
      flush()
    } finally { src.close(); out.close() }
  }
}
