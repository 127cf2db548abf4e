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

  /** Export a biallelic MatrixTable as .bed/.bim/.fam (reference
    * `io/plink/ExportPlink.scala`). Variant records are produced
    * partition-parallel and streamed to the single .bed through
    * `toLocalIterator` (one partition resident at a time — the driver is
    * IO-bound like the reference's shard-concat step). a1 = alt,
    * a2 = ref (hail's a2_reference convention, matching `read`). */
  def write(mt: graft.MatrixTable, basePath: String): Unit = {
    val spark = mt.spark
    val n = mt.nCols
    val stride = (n + 3) / 4
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(basePath), spark.sparkContext.hadoopConfiguration)
    // .fam
    val famOut = fs.create(
      new org.apache.hadoop.fs.Path(s"$basePath.fam"), true)
    val famIdx = mt.colSchema.fieldNames.indexOf("fam_id")
    val sIdx = mt.colSchema.fieldIndex(mt.colKey.head)
    mt.colValues.foreach { r =>
      val s = r.getString(sIdx)
      val fam = if (famIdx >= 0) r.getString(famIdx) else "0"
      famOut.write(s"$fam $s 0 0 0 -9\n".getBytes("UTF-8"))
    }
    famOut.close()
    // .bim + .bed in lockstep, partition-streamed
    import org.apache.spark.sql.functions.{col, element_at, size}
    val sorted = mt.rows
      .filter(size(col("alt")) === 1)
      .repartitionByRange(col("contig"), col("position"))
      .sortWithinPartitions(col("contig"), col("position"))
      .select(col("contig"), col("position"), col("rsid"), col("ref"),
        element_at(col("alt"), 1).as("a1"),
        col(graft.MatrixTable.EntriesField))
    val bimOut = fs.create(
      new org.apache.hadoop.fs.Path(s"$basePath.bim"), true)
    val bedOut = fs.create(
      new org.apache.hadoop.fs.Path(s"$basePath.bed"), true)
    bedOut.write(Magic)
    val it = sorted.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val rsid = if (r.isNullAt(2)) "." else r.getString(2)
      bimOut.write((Seq(r.getString(0), rsid, "0", r.getInt(1).toString,
        r.getString(4), r.getString(3)).mkString("\t") + "\n")
        .getBytes("UTF-8"))
      val entries = r.getSeq[Row](5)
      val buf = new Array[Byte](stride)
      var j = 0
      while (j < n) {
        val e = if (j < entries.length) entries(j) else null
        val code =
          if (e == null || e.isNullAt(0)) 1 // missing
          else {
            val gt = e.getInt(0)
            val a1 = (gt >> 1) & 0x7fff
            val a2 = (gt >> 16) & 0x7fff
            if (a1 == 0 && a2 == 0) 3       // hom ref = hom A2
            else if (a1 == 1 && a2 == 1) 0  // hom alt = hom A1
            else 2                          // het
          }
        buf(j / 4) = (buf(j / 4) | (code << (2 * (j % 4)))).toByte
        j += 1
      }
      bedOut.write(buf)
    }
    bimOut.close()
    bedOut.close()
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
