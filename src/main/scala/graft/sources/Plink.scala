package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.MatrixTable

/** PLINK .bed/.bim/.fam import (reference `io/plink/LoadPlink.scala`
  * (~600 LoC); python `import_plink`, `impex.py`).
  *
  * Format: `.bed` is SNP-major — 3 magic bytes (0x6c 0x1b 0x01) then one
  * fixed-size record per variant of ceil(nSamples/4) bytes, 2 bits per
  * sample: 00 = hom A1, 01 = missing, 10 = het, 11 = hom A2. With the
  * conventional a2-is-reference encoding (hail `a2_reference=True`):
  * 00 → 1/1, 10 → 0/1, 11 → 0/0.
  *
  * Spark shape: `.fam` (samples) is driver-side; `.bim` rows are
  * distributed and zipped with their line index = bed record index; each
  * partition opens the `.bed` once, seeks to its first record, and reads
  * its contiguous record range sequentially — a splittable scan with no
  * shuffle, the same partitioning contract as the reference's
  * fixed-record-length splits. */
object Plink {

  private val Magic = Array[Byte](0x6c.toByte, 0x1b.toByte, 0x01.toByte)

  case class FamRow(famId: String, id: String, patId: String,
      matId: String, isFemale: Option[Boolean], quantPheno: Option[Double])

  /** Driver-side .fam parse (one line per sample; whitespace-delimited). */
  def readFam(spark: SparkSession, path: String): IndexedSeq[FamRow] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(new org.apache.hadoop.fs.Path(path))))
    try {
      Iterator.continually(in.readLine()).takeWhile(_ != null)
        .filter(_.trim.nonEmpty)
        .map { line =>
          val f = line.trim.split("\\s+")
          FamRow(f(0), f(1), f(2), f(3),
            f(4) match { case "2" => Some(true); case "1" => Some(false)
              case _ => None },
            f(5) match { case "-9" | "0" => None
              case x => scala.util.Try(x.toDouble).toOption })
        }.toIndexedSeq
    } finally in.close()
  }

  /** Pack the 2-bit plink code for sample j into our call int (a2 = ref). */
  private def decodeCode(code: Int): Any = code match {
    case 0 => (1 << 16) | (1 << 1) // hom A1 = 1/1
    case 1 => null                 // missing
    case 2 => 1 << 16              // het = 0/1 (unphased)
    case 3 => 0                    // hom A2 = 0/0
  }

  /** Read a PLINK triple into a MatrixTable (rows keyed
    * contig/position/ref/alt; entries = struct(GT)). `basePath` may omit
    * the extension. */
  def read(spark: SparkSession, basePath: String,
      nPartitions: Int = 0): MatrixTable = {
    val (bed, bim, fam) =
      (s"$basePath.bed", s"$basePath.bim", s"$basePath.fam")
    val samples = readFam(spark, fam)
    val n = samples.length
    val stride = (n + 3) / 4
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val parts = if (nPartitions > 0) nPartitions
      else spark.sparkContext.defaultParallelism
    val bimRdd = spark.sparkContext.textFile(bim, parts)
      .zipWithIndex() // line index == bed record index (order-stable)
    val rows = bimRdd.mapPartitions { it =>
      var stream: org.apache.hadoop.fs.FSDataInputStream = null
      var nextOffset = -1L
      val iter = it.map { case (line, vidx) =>
        if (stream == null) {
          val p = new org.apache.hadoop.fs.Path(bed)
          val fs = p.getFileSystem(conf.value)
          stream = fs.open(p)
          val magic = new Array[Byte](3)
          stream.readFully(0, magic)
          require(magic.sameElements(Magic),
            s"$bed: bad magic bytes (expected SNP-major .bed)")
        }
        val offset = 3L + vidx * stride
        if (offset != nextOffset) stream.seek(offset)
        val buf = new Array[Byte](stride)
        stream.readFully(buf)
        nextOffset = offset + stride
        val f = line.trim.split("\\s+")
        // bim: contig, rsid, cM, pos, a1 (alt), a2 (ref)
        val entries = (0 until n).map { j =>
          val code = (buf(j / 4) >> (2 * (j % 4))) & 3
          Row(decodeCode(code))
        }
        Row(f(0), f(3).toInt, if (f(1) == ".") null else f(1),
          f(5), Seq(f(4)), entries)
      }
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = iter.hasNext
          if (!h && stream != null) { stream.close(); stream = null }
          h
        }
        def next(): Row = iter.next()
      }
    }
    val schema = StructType(Seq(
      StructField("contig", StringType),
      StructField("position", IntegerType),
      StructField("rsid", StringType),
      StructField("ref", StringType),
      StructField("alt", ArrayType(StringType)),
      StructField(MatrixTable.EntriesField, ArrayType(StructType(Seq(
        StructField("GT", IntegerType)))))))
    MatrixTable(
      rows = spark.createDataFrame(rows, schema),
      rowKey = Seq("contig", "position", "ref", "alt"),
      colValues = samples.map(s => Row(s.id, s.famId, s.patId, s.matId,
        s.isFemale.orNull, s.quantPheno.orNull)),
      colSchema = StructType(Seq(
        StructField("s", StringType),
        StructField("fam_id", StringType),
        StructField("pat_id", StringType),
        StructField("mat_id", StringType),
        StructField("is_female", BooleanType),
        StructField("quant_pheno", DoubleType))),
      colKey = Seq("s"))
  }
}
