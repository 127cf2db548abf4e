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

  // ---- writer (reference avro.py has import only; export completes the
  // row the way export_plink/export_bgen complete theirs) -----------------

  private def toAvroSchema(dt: DataType, name: String,
      nullable: Boolean): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType =>
        Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case ArrayType(et, n) =>
        Schema.createArray(toAvroSchema(et, s"${name}_elt", n))
      case MapType(StringType, vt, n) =>
        Schema.createMap(toAvroSchema(vt, s"${name}_val", n))
      case st: StructType => structToAvro(st, name)
      case other =>
        throw new UnsupportedOperationException(s"avro write: $other")
    }
    if (nullable)
      Schema.createUnion(java.util.Arrays.asList(
        Schema.create(Schema.Type.NULL), base))
    else base
  }

  private def structToAvro(st: StructType, name: String): Schema = {
    val rec = Schema.createRecord(name, null, "graft", false)
    rec.setFields(st.fields.map(f =>
      new Schema.Field(f.name,
        toAvroSchema(f.dataType, s"${name}_${f.name}", f.nullable),
        null, null)).toList.asJava)
    rec
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** Spark value -> Avro value under the WRITER's own (sub)schema —
    * nested records must carry the writer schema instance so union
    * branches resolve by record name. */
  private def toAvroValue(v: Any, dt: DataType, s0: Schema): Any = {
    val s = nonNull(s0)
    (v, dt) match {
      case (null, _) => null
      case (r: Row, st: StructType) =>
        val rec = new org.apache.avro.generic.GenericData.Record(s)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name,
            toAvroValue(r.get(i), f.dataType, s.getField(f.name).schema()))
        }
        rec
      case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
        seq.map(toAvroValue(_, et, s.getElementType)).asJava
      case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
        m.map { case (k, x) =>
          k.toString -> toAvroValue(x, vt, s.getValueType) }.asJava
      case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
      case (x, _) => x
    }
  }

  /** Distributed Avro container export: one container file per
    * partition, each task streaming its rows straight to the (Hadoop)
    * filesystem — no driver funnel, the same per-task write shape as
    * the native/PLINK/BGEN writers. Readable back by `read` and by any
    * Avro tooling. */
  def write(df: DataFrame, path: String): Unit = {
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericDatumWriter, GenericRecord}
    val sparkSchema = df.schema
    val schemaJson = structToAvro(sparkSchema, "row").toString
    val sc = df.sparkSession.sparkContext
    val sconf = new org.apache.spark.util.SerializableConfiguration(
      sc.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(path)
    val fsDriver = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), sc.hadoopConfiguration)
    fsDriver.mkdirs(dirPath)
    df.rdd.mapPartitionsWithIndex { (i, it) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), sconf.value)
      val out = fs.create(new org.apache.hadoop.fs.Path(
        path, f"part-$i%05d.avro"), true)
      val w = new DataFileWriter(
        new GenericDatumWriter[GenericRecord](schema))
        .create(schema, out)
      var n = 0L
      it.foreach { row =>
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        sparkSchema.fields.zipWithIndex.foreach { case (f, j) =>
          rec.put(f.name,
            toAvroValue(row.get(j), f.dataType, schema.getField(f.name)
              .schema()))
        }
        w.append(rec)
        n += 1
      }
      w.close()
      Iterator.single(n)
    }.count()
    ()
  }
}
