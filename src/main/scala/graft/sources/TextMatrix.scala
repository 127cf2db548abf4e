package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.MatrixTable

/** import_matrix_table (reference `methods/impex.py` `import_matrix_table`,
  * `io/TextMatrixReader.scala`): a delimited text matrix — leading row
  * fields, then one numeric entry column per matrix column — into a
  * MatrixTable with entry field `x` and col field `col_id`.
  *
  * Spark shape: `spark.read.text` (splittable distributed scan; plain
  * gz or bgz via the registered codecs), header parsed driver-side,
  * every cell cast as a Column expression — distributed, codegen'd,
  * column-pruned like the VCF parse. */
object TextMatrix {

  /** `rowFields`: (name, type) of the leading columns; `entryType` the
    * numeric type of every remaining cell. With `noHeader`, columns are
    * named col_0, col_1, ... like the reference. Missing cells are the
    * configurable `missing` token (default "NA"). */
  def read(spark: SparkSession, path: String,
      rowFields: Seq[(String, DataType)],
      rowKey: Seq[String] = Nil,
      entryType: DataType = DoubleType,
      sep: String = "\t",
      missing: String = "NA",
      noHeader: Boolean = false): MatrixTable = {
    BGzip.register(spark)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), conf)
    // header (and column count) from the first line, driver-side
    val rawIn: java.io.InputStream =
      fs.open(new org.apache.hadoop.fs.Path(path))
    val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(
      conf).getCodec(new org.apache.hadoop.fs.Path(path))
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      if (codec == null) rawIn else codec.createInputStream(rawIn)))
    val firstLine = try in.readLine() finally in.close()
    require(firstLine != null, s"$path is empty")
    val firstCells = firstLine.split(java.util.regex.Pattern.quote(sep),
      -1)
    val nRowFields = rowFields.length
    val colIds: IndexedSeq[String] =
      if (noHeader)
        (0 until firstCells.length - nRowFields).map(i => s"col_$i")
      else firstCells.drop(nRowFields).toIndexedSeq
    val n = colIds.length

    val raw0 = spark.read.text(path)
    val raw = if (noHeader) raw0
      else raw0.filter(col("value") =!= firstLine)
    val f = split(col("value"), java.util.regex.Pattern.quote(sep))
    def cell(i: Int) = try_element_at(f, lit(i + 1))
    def castTotal(c: org.apache.spark.sql.Column, dt: DataType) =
      dt match {
        case IntegerType => Vcf.safeInt(c)
        case LongType => when(c.rlike("^[+-]?\\d+$"), c).cast("long")
        case FloatType => Vcf.safeDouble(c).cast("float")
        case _: NumericType => Vcf.safeDouble(c).cast(dt)
        case StringType => when(c =!= missing, c)
        case other => c.cast(other)
      }
    val rowCols = rowFields.zipWithIndex.map { case ((name, dt), i) =>
      castTotal(cell(i), dt).as(name)
    }
    val entriesCol = transform(
      slice(f, nRowFields + 1, n),
      v => struct(
        (if (entryType.isInstanceOf[NumericType])
          castTotal(when(v =!= missing, v), entryType)
        else when(v =!= missing, v).cast(entryType)).as("x")))
    MatrixTable(
      rows = raw.select((rowCols :+
        entriesCol.as(MatrixTable.EntriesField)): _*),
      rowKey = if (rowKey.nonEmpty) rowKey else rowFields.map(_._1),
      colValues = colIds.map(c => Row(c)),
      colSchema = StructType(Seq(StructField("col_id", StringType))),
      colKey = Seq("col_id"))
  }
}
