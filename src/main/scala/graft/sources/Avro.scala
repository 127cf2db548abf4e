package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.Table

/** Avro container-file reader (reference
  * `io/avro/AvroTableReader.scala`, `avro.py import_avro`).
  *
  * The Spark distribution here ships avro-core but not the spark-avro
  * connector, so this is a thin DataSource built directly on the Avro
  * container format: schema read once on the driver from the first file,
  * then one task per file decoding records to Rows (`binaryFiles` keeps
  * whole-container decoding local to the executor — Avro blocks are
  * internally compressed and self-describing). Supports records of
  * primitives, nullable unions, arrays, maps, and nested records. */
object Avro {

  private def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.ARRAY => ArrayType(toSparkType(s.getElementType))
    case Schema.Type.MAP =>
      MapType(StringType, toSparkType(s.getValueType))
    case Schema.Type.RECORD => StructType(s.getFields.asScala.map(f =>
      StructField(f.name(), toSparkType(f.schema()))).toSeq)
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(
        _.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"unsupported union $s")
      toSparkType(nonNull.head)
    case other => throw new UnsupportedOperationException(s"avro $other")
  }

  private def convert(v: Any, s: Schema): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case f: org.apache.avro.generic.GenericFixed => f.bytes().clone()
    case r: GenericRecord =>
      val rs = resolve(s, Schema.Type.RECORD)
      Row.fromSeq(rs.getFields.asScala.map(fld =>
        convert(r.get(fld.pos()), fld.schema())).toSeq)
    case a: java.util.Collection[_] =>
      val es = resolve(s, Schema.Type.ARRAY).getElementType
      a.asScala.map(convert(_, es)).toSeq
    case m: java.util.Map[_, _] =>
      val vs = resolve(s, Schema.Type.MAP).getValueType
      m.asScala.map { case (k, x) =>
        k.toString -> convert(x, vs) }.toMap
    case other => other
  }

  private def resolve(s: Schema, t: Schema.Type): Schema =
    if (s.getType == t) s
    else s.getTypes.asScala.find(_.getType == t).get

  def read(spark: SparkSession, path: String): DataFrame = {
    val sc = spark.sparkContext
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), sc.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val first =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".avro")).minBy(_.getName)
      else p
    val avroSchema = {
      val in = fs.open(first)
      try new DataFileStream(in,
        new GenericDatumReader[GenericRecord]()).getSchema
      finally in.close()
    }
    val schemaJson = avroSchema.toString
    val sparkSchema = toSparkType(avroSchema).asInstanceOf[StructType]
    val rows = sc.binaryFiles(path).flatMap { case (_, pds) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val stream = new DataFileStream(pds.open(),
        new GenericDatumReader[GenericRecord](schema))
      stream.iterator().asScala.map(rec =>
        convert(rec, schema).asInstanceOf[Row])
    }
    spark.createDataFrame(rows, sparkSchema)
  }

  def readTable(spark: SparkSession, path: String,
      key: Seq[String] = Nil): Table = Table(read(spark, path), key)
}
