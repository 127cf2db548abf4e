package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.MatrixTable

/** Oxford GEN (+ .sample) import/export (reference `io/gen/`, python
  * `import_gen`/`export_gen`, `impex.py`).
  *
  * GEN line: chrom, varid, rsid, pos, alleleA, alleleB, then 3 genotype
  * probabilities (AA, AB, BB) per sample. Entries: `GP: array<double>`
  * and a hard call `GT` (argmax prob when it exceeds `tolerance`-adjusted
  * confidence, else missing — reference default: best prob must be within
  * `tolerance` of 1 when... hail's contract: call if max GP > 0.5 by
  * default import_gen chooses the max unless no prob dominates).
  *
  * Spark-first: distributed text scan, all parsing is Column expressions;
  * the .sample file (tiny) is read driver-side. */
object Gen {

  /** Driver-side .sample parse: returns sample ids (first column, two
    * header lines skipped per the Oxford spec). */
  def readSampleFile(spark: SparkSession, path: String): IndexedSeq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(new org.apache.hadoop.fs.Path(path))))
    try {
      Iterator.continually(in.readLine()).takeWhile(_ != null)
        .drop(2) // header + type line
        .filter(_.trim.nonEmpty)
        .map(_.trim.split("\\s+")(0))
        .toIndexedSeq
    } finally in.close()
  }

  /** Export a MatrixTable (with GP entries) as GEN text + .sample —
    * a fully distributed text write (reference `export_gen`); `read`
    * accepts the resulting part-file directory directly. */
  def write(mt: MatrixTable, genDir: String, samplePath: String): Unit = {
    val spark = mt.rows.sparkSession
    val entryTxt = transform(col(MatrixTable.EntriesField), e =>
      concat_ws(" ",
        format_number(coalesce(element_at(e("GP"), 1), lit(0.0)), 3),
        format_number(coalesce(element_at(e("GP"), 2), lit(0.0)), 3),
        format_number(coalesce(element_at(e("GP"), 3), lit(0.0)), 3)))
    val line = concat_ws(" ",
      col("contig"), coalesce(col("varid"), lit(".")),
      coalesce(col("rsid"), lit(".")), col("position").cast("string"),
      col("ref"), element_at(col("alt"), 1),
      concat_ws(" ", entryTxt))
    val withVarid =
      if (mt.rows.columns.contains("varid")) mt.rows
      else mt.rows.withColumn("varid", lit(null).cast("string"))
    withVarid
      .repartitionByRange(col("contig"), col("position"))
      .sortWithinPartitions(col("contig"), col("position"))
      .select(line.as("value"))
      .write.mode("overwrite").text(genDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(samplePath), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(samplePath), true)
    out.write("ID_1 ID_2 missing\n0 0 0\n".getBytes("UTF-8"))
    mt.colValues.foreach(r =>
      out.write(s"${r.getString(0)} ${r.getString(0)} 0\n".getBytes("UTF-8")))
    out.close()
  }

  /** Read a GEN file into a MatrixTable. `gpThreshold`: minimum winning
    * probability for a hard call (hail `import_gen` default 0.2 applies
    * to the *difference*; we use the common >threshold contract). */
  def read(spark: SparkSession, genPath: String, samplePath: String,
      gpThreshold: Double = 0.9): MatrixTable = {
    val samples = readSampleFile(spark, samplePath)
    val n = samples.length
    val f = split(trim(col("value")), "\\s+")
    val fieldAt = (i: Int) => try_element_at(f, lit(i + 1))
    val gp = (j: Int) => struct(
      Vcf.safeDouble(try_element_at(f, lit(7 + j * 3))).as("aa"),
      Vcf.safeDouble(try_element_at(f, lit(8 + j * 3))).as("ab"),
      Vcf.safeDouble(try_element_at(f, lit(9 + j * 3))).as("bb"))
    val entryCol = array((0 until n).map { j =>
      val g = gp(j)
      val aa = g("aa"); val ab = g("ab"); val bb = g("bb")
      val best = greatest(aa, ab, bb)
      val gt = when(best < gpThreshold, lit(null).cast("int"))
        .when(best === aa, lit(0))
        .when(best === ab, lit(1 << 16))          // 0/1
        .otherwise(lit((1 << 16) | (1 << 1)))     // 1/1
      struct(gt.as("GT"), array(aa, ab, bb).as("GP"))
    }: _*)
    val parsed = spark.read.text(genPath)
      .filter(length(trim(col("value"))) > 0)
      .select(
        fieldAt(0).as("contig"),
        fieldAt(1).as("varid"),
        when(fieldAt(2) =!= ".", fieldAt(2)).as("rsid"),
        Vcf.safeInt(fieldAt(3)).as("position"),
        fieldAt(4).as("ref"),
        array(fieldAt(5)).as("alt"),
        entryCol.as(MatrixTable.EntriesField))
    MatrixTable(
      rows = parsed,
      rowKey = Seq("contig", "position", "ref", "alt"),
      colValues = samples.map(s => Row(s)),
      colSchema = StructType(Seq(StructField("s", StringType))),
      colKey = Seq("s"))
  }
}
