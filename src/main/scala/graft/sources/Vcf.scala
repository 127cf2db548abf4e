package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.MatrixTable

/** VCF import/export (reference `io/vcf/LoadVCF.scala` (2313 LoC),
  * `io/vcf/ExportVCF.scala`; python `import_vcf`, `impex.py:2817`).
  *
  * Spark-first shape: `spark.read.text` gives a splittable distributed scan
  * (bgzip-block splitting would slot in as a Hadoop codec); all line parsing
  * is Column expressions — `split`, `str_to_map`, `transform` — so the
  * parse is distributed and columnar-pruned: if the query only needs
  * CHROM/POS, Catalyst prunes the per-sample parsing subtree entirely.
  *
  * Header (sample names, contig order) is tiny and read driver-side, like
  * the reference's header pass. Result is a row-keyed `MatrixTable`:
  * rows = variants, cols = samples, entries = struct(GT call, fields map).
  */
object Vcf {

  val FixedCols = 9 // CHROM POS ID REF ALT QUAL FILTER INFO FORMAT

  /** Parse "0/1", "0|1", ".", "./." into our packed call int (see
    * `graft.functions.Calls`): null for missing. */
  def parseGt(gt: Column): Column = {
    val parts = split(gt, "[/|]")
    val a1 = element_at(parts, 1)
    val a2 = try_element_at(parts, lit(2))
    val phased = gt.contains("|")
    when(a1 === "." || a1 === "" || gt.isNull, lit(null).cast("int"))
      .otherwise(
        when(a2.isNull || a2 === ".",
          // haploid
          shiftleft(lit(0x7fff), 16)
            .bitwiseOR(shiftleft(a1.cast("int"), 1)))
        .otherwise(
          shiftleft(a2.cast("int"), 16)
            .bitwiseOR(shiftleft(a1.cast("int"), 1))
            .bitwiseOR(phased.cast("int"))))
  }

  /** Render our packed call back to VCF GT text. */
  def formatGt(call: Column): Column = {
    import graft.functions.Calls
    when(call.isNull, "./.")
      .otherwise(
        when(Calls.ploidy(call) === 1, Calls.allele1(call).cast("string"))
        .otherwise(concat(
          Calls.allele1(call).cast("string"),
          when(Calls.isPhased(call), "|").otherwise("/"),
          Calls.allele2(call).cast("string"))))
  }

  case class Header(samples: IndexedSeq[String], lines: Seq[String])

  /** Driver-side header scan (header is KBs; data can be TBs). */
  def readHeader(spark: SparkSession, path: String): Header = {
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val status = fs.getFileStatus(new org.apache.hadoop.fs.Path(path))
    val files =
      if (status.isDirectory)
        fs.listStatus(new org.apache.hadoop.fs.Path(path))
          .map(_.getPath).filter(_.getName.endsWith(".vcf")).sortBy(_.getName)
      else Array(status.getPath)
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(files.head)))
    try {
      var l = in.readLine()
      while (l != null && l.startsWith("#")) {
        lines += l
        l = if (l.startsWith("#CHROM")) null else in.readLine()
      }
    } finally in.close()
    val chromLine = lines.find(_.startsWith("#CHROM")).getOrElse(
      throw new IllegalArgumentException(s"no #CHROM header line in $path"))
    Header(chromLine.split("\t").drop(FixedCols).toIndexedSeq, lines.toSeq)
  }

  /** Read a VCF (or directory of VCFs) into a MatrixTable. */
  def read(spark: SparkSession, path: String): MatrixTable = {
    val header = readHeader(spark, path)
    val n = header.samples.length
    val raw = spark.read.text(
      if (path.endsWith(".vcf")) path else s"$path/*.vcf")
      .filter(!col("value").startsWith("#"))
    val f = split(col("value"), "\t")
    val fieldAt = (i: Int) => element_at(f, i + 1)
    val entryStrs = slice(f, FixedCols + 1, n)
    val formatKeys = split(fieldAt(8), ":")
    val parsed = raw.select(
      fieldAt(0).as("contig"),
      fieldAt(1).cast("int").as("position"),
      when(fieldAt(2) === ".", lit(null).cast("string")).otherwise(fieldAt(2))
        .as("rsid"),
      fieldAt(3).as("ref"),
      split(fieldAt(4), ",").as("alt"),
      when(fieldAt(5) === ".", lit(null).cast("double"))
        .otherwise(fieldAt(5).cast("double")).as("qual"),
      when(fieldAt(6) === "." || fieldAt(6) === "PASS",
        array().cast("array<string>")).otherwise(split(fieldAt(6), ";"))
        .as("filters"),
      when(fieldAt(7) === ".", expr("map()").cast("map<string,string>"))
        .otherwise(str_to_map(fieldAt(7), lit(";"), lit("="))).as("info"),
      transform(entryStrs, e => {
        val vals = split(e, ":")
        struct(
          parseGt(try_element_at(vals, lit(1))).as("GT"),
          map_from_arrays(formatKeys, transform(formatKeys, (k, i) =>
            try_element_at(vals, i + 1))).as("fields"))
      }).as(MatrixTable.EntriesField))
    MatrixTable(
      rows = parsed,
      rowKey = Seq("contig", "position", "ref", "alt"),
      colValues = header.samples.map(s => Row(s)),
      colSchema = StructType(Seq(StructField("s", StringType))),
      colKey = Seq("s"))
  }

  /** Export a MatrixTable (shaped as produced by `read`) to VCF part files
    * under `path` (distributed text write; one header written driver-side,
    * matching the reference's sharded export). */
  def write(mt: MatrixTable, path: String): Unit = {
    val spark = mt.rows.sparkSession
    val gtLine = concat_ws("\t",
      (Seq(
        col("contig"), col("position").cast("string"),
        coalesce(col("rsid"), lit(".")),
        col("ref"), concat_ws(",", col("alt")),
        coalesce(col("qual").cast("string"), lit(".")),
        when(size(col("filters")) === 0, "PASS")
          .otherwise(concat_ws(";", col("filters"))),
        when(size(map_keys(col("info"))) === 0, lit("."))
          .otherwise(concat_ws(";",
            transform(map_entries(col("info")),
              kv => concat(kv("key"), lit("="), kv("value"))))),
        lit("GT")) :+
        concat_ws("\t",
          transform(col(MatrixTable.EntriesField),
            e => formatGt(e("GT"))))): _*)
    val sorted = mt.rows
      .repartitionByRange(col("contig"), col("position"))
      .sortWithinPartitions(col("contig"), col("position"))
    sorted.select(gtLine.as("value")).write.mode("overwrite")
      .text(s"$path/parts")
    // header (driver-side, tiny)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/header.vcf"))
    val samples = mt.colValues.map(_.getString(0))
    out.write((
      "##fileformat=VCFv4.2\n" +
      "##source=graft\n" +
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" +
      samples.mkString("\t") + "\n").getBytes("UTF-8"))
    out.close()
  }
}
