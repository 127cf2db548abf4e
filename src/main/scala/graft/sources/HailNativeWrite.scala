package graft.sources

import java.io.{BufferedOutputStream, OutputStream}
import java.util.zip.GZIPOutputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.{MatrixTable, Table}
import HailNative._

/** Hail-native-format WRITER: exports a graft Table / MatrixTable as a
  * `.ht` / `.mt` directory the reference engine reads back directly —
  * the other half of the `HailNative` importer's interop loop.
  *
  * Emits the current spec (file_version 1.8.0 = 67584) with
  * `OrderedRVDSpec2` row components (reference
  * `rvd/AbstractRVDSpec.scala:578` — keyed, `_jRangeBounds`
  * partitioner, no `.idx` sidecars required), `TypedCodecSpec`
  * metadata with an explicit encoded type, and
  * LZ4-block-compressed framing (`BlockingBufferSpec{32768,
  * LZ4FastBlockBufferSpec{32768, StreamBlockBufferSpec2}}` — one of
  * the writer codecs observed in the reference's own 1.8.0 files).
  * Layout/metadata shapes mirror the reference's
  * `TableSpec`/`MatrixTableSpec` (`expr/ir/AbstractMatrixTableSpec
  * .scala`), byte format mirrors the `types/encoded` classes — validated by
  * round-trip through the independent `HailNative` decoder, which is
  * itself validated value-level against all 130 reference-written
  * fixtures (`BackCompatSpec`).
  *
  * Scale: rows are range-partitioned and sorted by key ONCE, then each
  * task streams its partition straight to its part file via the Hadoop
  * FS API — no driver materialization, no second shuffle; matrix
  * row/entries components are written by the same single pass (one
  * task writes both aligned part files). */
object HailNativeWrite {

  val FileVersion: Int = (1 << 16) | (8 << 8) // 1.8.0
  val HailVersionString = "0.2.138-graft"

  // ---- Spark schema -> virtual type --------------------------------------

  def vTypeOf(dt: DataType): VType = dt match {
    case BooleanType => VBool
    case IntegerType => VInt32
    case LongType => VInt64
    case FloatType => VFloat32
    case DoubleType => VFloat64
    case StringType => VString
    case BinaryType => VBinary
    case ArrayType(e, _) => VArray(vTypeOf(e))
    case MapType(k, v, _) => VDict(vTypeOf(k), vTypeOf(v))
    case s: StructType =>
      VStruct(s.fields.toIndexedSeq.map(f => f.name -> vTypeOf(f.dataType)))
    case x => throw new IllegalArgumentException(
      s"cannot export $x to the native format — cast to a hail-" +
        "representable type first (int/long/float/double/boolean/" +
        "string/binary/array/map/struct)")
  }

  /** Canonical write-side encoded type: nullable-by-default (hail's own
    * convention), fixed-width scalars, varint-length binary/array
    * (`EBinary2`/`EArray2`), dict entries as required {key,value}
    * structs with required keys — the same derivation the reference's
    * 1.8.0 writer produced for the compat corpus. */
  def writeEType(v: VType): ETyp = v match {
    case VBool => EBool(false)
    case VInt32 | VCall => EI32(false)
    case VInt64 => EI64(false)
    case VFloat32 => EF32(false)
    case VFloat64 => EF64(false)
    case VString | VBinary => EBin(false, varintLen = true)
    case VArray(e) => EArr(writeEType(e), false, varintLen = true)
    case VSet(e) => EArr(writeEType(e), false, varintLen = true)
    case VDict(k, vv) => EArr(EStru(IndexedSeq(
      "key" -> setRequired(writeEType(k)),
      "value" -> writeEType(vv)), required = true), false,
      varintLen = true)
    case VStruct(fs) =>
      EStru(fs.map { case (n, t) => n -> writeEType(t) }, false)
    case x => throw new IllegalArgumentException(s"cannot export $x")
  }

  private def setRequired(e: ETyp): ETyp = e match {
    case EBool(_) => EBool(true)
    case EI32(_) => EI32(true)
    case EI64(_) => EI64(true)
    case EF32(_) => EF32(true)
    case EF64(_) => EF64(true)
    case EVar(_) => EVar(true)
    case EBin(_, vl) => EBin(true, vl)
    case EArr(e2, _, vl) => EArr(e2, true, vl)
    case EStru(fs, _) => EStru(fs, true)
    case ENd(e2, n, _) => ENd(e2, n, true)
  }

  // ---- pretty-printers (reference `prettyIdentifier`) ---------------------

  private val PlainIdent = "[A-Za-z_][A-Za-z0-9_]*".r
  def prettyIdent(s: String): String =
    if (PlainIdent.matches(s)) s
    else "`" + s.replace("\\", "\\\\").replace("`", "\\`") + "`"

  def vTypeString(v: VType): String = v match {
    case VBool => "Boolean"
    case VInt32 => "Int32"
    case VInt64 => "Int64"
    case VFloat32 => "Float32"
    case VFloat64 => "Float64"
    case VString => "String"
    case VBinary => "Binary"
    case VCall => "Call"
    case VVoid => "Void"
    case VLocus(rg) => s"Locus($rg)"
    case VArray(e) => s"Array[${vTypeString(e)}]"
    case VSet(e) => s"Set[${vTypeString(e)}]"
    case VDict(k, vv) => s"Dict[${vTypeString(k)},${vTypeString(vv)}]"
    case VInterval(p) => s"Interval[${vTypeString(p)}]"
    case VStruct(fs) => fs.map { case (n, t) =>
      s"${prettyIdent(n)}:${vTypeString(t)}" }.mkString("Struct{", ",", "}")
    case VTuple(ts) => ts.map(vTypeString).mkString("Tuple[", ",", "]")
    case VNDArray(e, n) => s"NDArray[${vTypeString(e)},$n]"
  }

  def eTypeString(e: ETyp): String = {
    val req = if (e.required) "+" else ""
    req + (e match {
      case EBool(_) => "EBoolean"
      case EI32(_) => "EInt32"
      case EI64(_) => "EInt64"
      case EF32(_) => "EFloat32"
      case EF64(_) => "EFloat64"
      case EVar(_) => "EVarint"
      case EBin(_, true) => "EBinary2"
      case EBin(_, false) => "EBinary"
      case EArr(el, _, true) => s"EArray2[${eTypeString(el)}]"
      case EArr(el, _, false) => s"EArray[${eTypeString(el)}]"
      case EStru(fs, _) => fs.map { case (n, t) =>
        s"${prettyIdent(n)}:${eTypeString(t)}"
      }.mkString("EBaseStruct{", ",", "}")
      case ENd(el, n, _) => s"ENDArrayColumnMajor[${eTypeString(el)},$n]"
    })
  }

  // ---- output buffers (mirror of the reader's InBuf stack) ---------------

  /** Write codec: every part file this writer emits uses this spec. */
  val WriteBufSpec: BufSpec =
    Blocking(32768, Lz4Block(32768, StreamBlock2))
  val WriteBufSpecJson: String =
    """{"name":"BlockingBufferSpec","blockSize":32768,""" +
      """"child":{"name":"LZ4FastBlockBufferSpec","blockSize":32768,""" +
      """"child":{"name":"StreamBlockBufferSpec2"}}}"""

  private def writeVarintTo(out: OutputStream, n0: Int): Unit = {
    var n = n0
    var more = true
    while (more) {
      val x = n & 0x7f
      n = n >>> 7
      if (n != 0) out.write(x | 0x80) else out.write(x)
      more = n != 0
    }
  }

  /** Blocking + compressed-block + StreamBlock(2) encoder sink. A
    * primitive never spans a block (the reader's `ensure` contract);
    * byte runs do. `varintFraming` selects StreamBlockBufferSpec2
    * (varint lengths, the RVD codec) vs StreamBlockBufferSpec (4-byte
    * LE lengths, the BlockMatrix codec). `codec` picks the block
    * compressor: lz4 (part files) or zstd (index files —
    * `BufferSpec.default`). Tracks raw bytes written so callers can
    * record seekable row offsets in the reference's
    * `(compressedPos << 16) | blockOff` form
    * (`OutputBuffers.scala:157` indexOffset). */
  private[graft] final class OutBuf(blockSize: Int, out: OutputStream,
      varintFraming: Boolean = true, codec: String = "lz4") {
    private val lz4 =
      if (codec == "lz4") net.jpountz.lz4.LZ4Factory.fastestInstance()
        .fastCompressor()
      else null
    private val buf = new Array[Byte](blockSize)
    private val comp = new Array[Byte](4 + (codec match {
      case "lz4" => lz4.maxCompressedLength(blockSize)
      case "zstd" =>
        com.github.luben.zstd.Zstd.compressBound(blockSize.toLong).toInt
      case x => throw new IllegalArgumentException(s"codec $x")
    }))
    private var off = 0
    private var rawBytes = 0L
    private def flushBlock(): Unit = if (off > 0) {
      // block frame: [4B LE decompressed length][compressed bytes],
      // wrapped in StreamBlock(2) framing
      val clen = codec match {
        case "lz4" => lz4.compress(buf, 0, off, comp, 4)
        case _ => com.github.luben.zstd.Zstd.compressByteArray(
          comp, 4, comp.length - 4, buf, 0, off, 3).toInt
      }
      comp(0) = off.toByte
      comp(1) = (off >> 8).toByte
      comp(2) = (off >> 16).toByte
      comp(3) = (off >> 24).toByte
      if (varintFraming) {
        writeVarintTo(out, clen + 4)
        var v = clen + 4
        rawBytes += 1
        while ((v >>> 7) != 0) { rawBytes += 1; v = v >>> 7 }
      } else {
        val n = clen + 4
        out.write(n & 0xff); out.write((n >> 8) & 0xff)
        out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
        rawBytes += 4
      }
      out.write(comp, 0, clen + 4)
      rawBytes += clen + 4
      off = 0
    }
    /** Seekable offset of the NEXT value written: compressed-stream
      * position of the current block start <<16 | in-block offset. */
    def indexOffset(): Long = {
      if (off == blockSize) flushBlock()
      (rawBytes << 16) | off
    }
    /** Flush the current partial block as a complete frame WITHOUT
      * closing — each index node is its own seekable frame. */
    def flushFrame(): Unit = flushBlock()
    private def ensure(n: Int): Unit =
      if (off + n > blockSize) flushBlock()
    def writeByte(b: Int): Unit = { ensure(1); buf(off) = b.toByte; off += 1 }
    def writeInt(v: Int): Unit = {
      ensure(4)
      buf(off) = v.toByte
      buf(off + 1) = (v >> 8).toByte
      buf(off + 2) = (v >> 16).toByte
      buf(off + 3) = (v >> 24).toByte
      off += 4
    }
    def writeLong(v: Long): Unit = {
      ensure(8)
      var i = 0
      while (i < 8) { buf(off + i) = (v >> (8 * i)).toByte; i += 1 }
      off += 8
    }
    def writeFloat(v: Float): Unit =
      writeInt(java.lang.Float.floatToIntBits(v))
    def writeDouble(v: Double): Unit =
      writeLong(java.lang.Double.doubleToLongBits(v))
    def writeVarint(n0: Int): Unit = {
      var n = n0
      var more = true
      while (more) {
        val x = n & 0x7f
        n = n >>> 7
        writeByte(if (n != 0) x | 0x80 else x)
        more = n != 0
      }
    }
    def writeVarintLong(n0: Long): Unit = {
      var n = n0
      var more = true
      while (more) {
        val x = (n & 0x7f).toInt
        n = n >>> 7
        writeByte(if (n != 0) x | 0x80 else x)
        more = n != 0
      }
    }
    def writeBytes(b: Array[Byte]): Unit = {
      var done = 0
      while (done < b.length) {
        if (off == blockSize) flushBlock()
        val p = math.min(blockSize - off, b.length - done)
        System.arraycopy(b, done, buf, off, p)
        off += p; done += p
      }
    }
    def close(): Unit = { flushBlock(); out.close() }
  }

  // ---- value encoding (mirror of HailNative.decode) -----------------------

  private[graft] def encode(e: ETyp, v: Any, out: OutBuf): Unit = e match {
    case EBool(_) => out.writeByte(if (v.asInstanceOf[Boolean]) 1 else 0)
    case EI32(_) => out.writeInt(v.asInstanceOf[Int])
    case EI64(_) => out.writeLong(v.asInstanceOf[Long])
    case EF32(_) => out.writeFloat(v.asInstanceOf[Float])
    case EF64(_) => out.writeDouble(v.asInstanceOf[Double])
    case EVar(_) => v match {
      case l: Long => out.writeVarintLong(l)
      case i: Int => out.writeVarint(i)
    }
    case EBin(_, vl) =>
      val bytes = v match {
        case s: String => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        case b: Array[Byte] => b
      }
      if (vl) out.writeVarint(bytes.length) else out.writeInt(bytes.length)
      out.writeBytes(bytes)
    case EArr(ee, _, vl) =>
      val elems: scala.collection.Seq[Any] = v match {
        case s: scala.collection.Seq[_] => s
        case m: scala.collection.Map[_, _] =>
          // dict: hail dicts are key-sorted arrays (lookups binary-
          // search), so sort every primitive key type by its natural
          // order; complex keys (arrays/structs — rare) fall back to a
          // deterministic rendered order, documented as approximate
          val entries = m.toSeq
          val sorted = entries.headOption.map(_._1) match {
            case Some(_: Int) => entries.sortBy(_._1.asInstanceOf[Int])
            case Some(_: Long) => entries.sortBy(_._1.asInstanceOf[Long])
            case Some(_: String) => entries.sortBy(_._1.asInstanceOf[String])
            case Some(_: Double) => entries.sortBy(_._1.asInstanceOf[Double])
            case Some(_: Float) => entries.sortBy(_._1.asInstanceOf[Float])
            case Some(_: Boolean) =>
              entries.sortBy(_._1.asInstanceOf[Boolean])
            case _ => entries.sortBy(e => String.valueOf(e._1))
          }
          sorted.map { case (k, vv) => Row(k, vv) }
        case a: Array[_] => a.toSeq
      }
      if (vl) out.writeVarint(elems.length) else out.writeInt(elems.length)
      if (!ee.required) {
        val mbytes = new Array[Byte]((elems.length + 7) >>> 3)
        var i = 0
        elems.foreach { x =>
          if (x == null) mbytes(i >>> 3) = (mbytes(i >>> 3) |
            (1 << (i & 7))).toByte
          i += 1
        }
        out.writeBytes(mbytes)
      }
      elems.foreach { x =>
        if (x != null) encode(ee, x, out)
        else require(!ee.required, "null element in required-element array")
      }
    case EStru(fs, _) =>
      val r = v.asInstanceOf[Row]
      require(r.length == fs.length,
        s"row arity ${r.length} != encoded struct arity ${fs.length}")
      val nOpt = fs.count(!_._2.required)
      val mbytes = new Array[Byte]((nOpt + 7) >>> 3)
      var i = 0
      var mi = 0
      while (i < fs.length) {
        if (!fs(i)._2.required) {
          if (r.isNullAt(i)) mbytes(mi >>> 3) = (mbytes(mi >>> 3) |
            (1 << (mi & 7))).toByte
          mi += 1
        } else require(!r.isNullAt(i),
          s"null in required field ${fs(i)._1}")
        i += 1
      }
      out.writeBytes(mbytes)
      i = 0
      while (i < fs.length) {
        if (!r.isNullAt(i)) encode(fs(i)._2, r.get(i), out)
        i += 1
      }
    case x => throw new UnsupportedOperationException(s"encode $x")
  }

  /** One part file: [0x01 row]* 0x00 through the write codec.
    * `beforeRow`, when given, observes each row with its seekable
    * indexOffset BEFORE the row indicator byte (the offset the
    * reference's indexed reader seeks to — `RichContextRDDRegionValue
    * .writeRowsPartition` records it at exactly this point). */
  private[graft] def encodePart(rows: Iterator[Row], e: ETyp,
      raw: OutputStream,
      beforeRow: (Row, Long) => Unit = null): Long = {
    val out = new OutBuf(32768, raw)
    var n = 0L
    rows.foreach { r =>
      if (beforeRow != null) beforeRow(r, out.indexOffset())
      out.writeByte(1)
      encode(e, r, out)
      n += 1
    }
    out.writeByte(0)
    out.close()
    n
  }

  // ---- JSON helpers -------------------------------------------------------

  private[sources] def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Key-bound JSON: the reference's `JSONAnnotationImpex` forms —
    * structs as objects, arrays as arrays, primitives bare. */
  private def jsonValue(dt: DataType, v: Any): String = (dt, v) match {
    case (_, null) => "null"
    case (StringType, s: String) => "\"" + jsonEscape(s) + "\""
    case (BooleanType, b: Boolean) => b.toString
    case (IntegerType, n: Int) => n.toString
    case (LongType, n: Long) => n.toString
    case (FloatType, n: Float) => jsonDouble(n.toDouble)
    case (DoubleType, n: Double) => jsonDouble(n)
    case (ArrayType(e, _), s: scala.collection.Seq[_]) =>
      s.map(x => jsonValue(e, x)).mkString("[", ",", "]")
    case (s: StructType, r: Row) =>
      s.fields.zipWithIndex.map { case (f, i) =>
        "\"" + jsonEscape(f.name) + "\": " + jsonValue(f.dataType, r.get(i))
      }.mkString("{", ", ", "}")
    case (t, x) => throw new IllegalArgumentException(
      s"cannot JSON-render key bound $x: $t")
  }

  private def jsonDouble(d: Double): String =
    if (d.isNaN || d.isInfinite) throw new IllegalArgumentException(
      s"non-finite key bound $d") else d.toString

  /** {"k1": v1, "k2": v2} for a key-values bound. */
  private def keyJson(key: Seq[String], types: Seq[DataType],
      vals: Seq[Any]): String =
    key.lazyZip(types).lazyZip(vals).map { (k, t, v) =>
      "\"" + jsonEscape(k) + "\": " + jsonValue(t, v)
    }.mkString("{", ", ", "}")

  private def writeGz(conf: Configuration, path: String, content: String)
      : Unit = {
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val out = new GZIPOutputStream(new BufferedOutputStream(fs.create(p,
      true)))
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private def writeFile(conf: Configuration, path: String, content: String)
      : Unit = {
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private def rvdMetadataJson(key: Seq[String], vType: VType, eType: ETyp,
      partFiles: Seq[String], bounds: Seq[String],
      indexSpec: Option[String] = None): String = {
    val keyJsonArr = key.map(k => "\"" + jsonEscape(k) + "\"")
      .mkString("[", ",", "]")
    val name = if (indexSpec.isDefined) "IndexedRVDSpec2"
      else "OrderedRVDSpec2"
    s"""{"name":"$name","_key":$keyJsonArr,""" +
      s""""_codecSpec":{"name":"TypedCodecSpec",""" +
      s""""_eType":"${jsonEscape(eTypeString(eType))}",""" +
      s""""_vType":"${jsonEscape(vTypeString(vType))}",""" +
      s""""_bufferSpec":$WriteBufSpecJson},""" +
      indexSpec.map(s => s""""_indexSpec":$s,""").getOrElse("") +
      s""""_partFiles":${partFiles.map(f => "\"" + jsonEscape(f) + "\"")
        .mkString("[", ",", "]")},""" +
      s""""_jRangeBounds":${bounds.mkString("[", ",", "]")},""" +
      s""""_attrs":{}}"""
  }

  private def catchAllBound: String =
    """{"start":{},"end":{},"includeStart":true,"includeEnd":true}"""

  // ---- RVD component writer -----------------------------------------------

  private case class PartResult(index: Int, file: String, count: Long,
      minKey: Seq[Any], maxKey: Seq[Any])

  /** Write one distributed RVD component dir (metadata.json.gz +
    * parts/): range-partition + sort by key when keyed, one task per
    * part, each streaming to the FS. Empty partitions are dropped from
    * the listing (a keyed empty part has no expressible bounds).
    * Keyed components also stream a `.idx` B-tree sidecar per part to
    * `indexDir` (same task, same pass — zero extra scans) and emit an
    * `IndexedRVDSpec2`, so reference deployments point/interval-seek
    * the export instead of scanning. Returns per-part row counts. */
  private def writeRvd(df: DataFrame, key: Seq[String], dir: String,
      nPartitions: Option[Int] = None,
      indexDir: Option[String] = None,
      indexRelPath: String = "../index"): Seq[Long] = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val vType = vTypeOf(df.schema).asInstanceOf[VStruct]
    val eType = writeEType(vType)
    val sorted =
      if (key.isEmpty) nPartitions.map(df.repartition(_)).getOrElse(df)
      else {
        import org.apache.spark.sql.functions.col
        // hail's key ordering puts missing LAST; Spark's default is
        // nulls-first — export with the reader's expected order or the
        // partitioner bounds come out unsorted
        val kc = key.map(k => col(k).asc_nulls_last)
        nPartitions match {
          case Some(n) =>
            df.repartitionByRange(n, kc: _*).sortWithinPartitions(kc: _*)
          case None =>
            df.repartitionByRange(kc: _*).sortWithinPartitions(kc: _*)
        }
      }
    val fields = df.schema.fieldNames
    val keyIdx = key.map(fields.indexOf(_))
    require(keyIdx.forall(_ >= 0), s"key $key not in ${fields.toSeq}")
    new HPath(s"$dir/parts").getFileSystem(conf)
      .mkdirs(new HPath(s"$dir/parts"))
    val doIndex = indexDir.filter(_ => key.nonEmpty)
    val (keyE, keyV) = indexTypes(df.schema, key)
    doIndex.foreach(d =>
      new HPath(d).getFileSystem(conf).mkdirs(new HPath(d)))
    // session Hadoop conf must reach the tasks (spark.hadoop.* creds)
    val sconf = new org.apache.spark.util.SerializableConfiguration(conf)
    val results = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val file = f"part-$i%05d-${java.util.UUID.randomUUID.toString}"
        val p = new HPath(s"$dir/parts/$file")
        val fs = p.getFileSystem(sconf.value)
        var first: Row = null
        var last: Row = null
        val counted = it.map { r =>
          if (first == null) first = r
          last = r
          r
        }
        val iw = doIndex.map { d =>
          val ip = new HPath(s"$d/$file.idx")
          new HailIdx.Writer(new BufferedOutputStream(
            ip.getFileSystem(sconf.value).create(ip, true)),
            keyE, keyV, HailIdx.EmptyAnn._1, HailIdx.EmptyAnn._2)
        }
        val beforeRow: (Row, Long) => Unit = iw match {
          case Some(w) => (r, off) =>
            w.appendRow(Row.fromSeq(keyIdx.map(r.get)), off, Row())
          case None => null
        }
        val n = encodePart(counted, eType,
          new BufferedOutputStream(fs.create(p, true)), beforeRow)
        iw.foreach(_.close())
        Iterator.single(PartResult(i, file, n,
          keyIdx.map(first.get), keyIdx.map(last.get)))
      }
    }.collect().sortBy(_.index).toSeq
    val keyTypes = keyIdx.map(df.schema.fields(_).dataType)
    val bounds =
      if (key.isEmpty) results.map(_ => catchAllBound)
      else results.map { r =>
        s"""{"start":${keyJson(key, keyTypes, r.minKey)},""" +
          s""""end":${keyJson(key, keyTypes, r.maxKey)},""" +
          """"includeStart":true,"includeEnd":true}"""
      }
    writeGz(conf, s"$dir/metadata.json.gz",
      rvdMetadataJson(key, vType, eType, results.map(_.file), bounds,
        doIndex.map(_ => HailIdx.indexSpecJson(indexRelPath, keyE, keyV,
          HailIdx.EmptyAnn._1, HailIdx.EmptyAnn._2, None))))
    results.map(_.count)
  }

  /** Encoded/virtual struct types of a key selection — the index key
    * codec (required struct of the row's nullable-by-default fields). */
  private def indexTypes(schema: StructType, key: Seq[String])
      : (ETyp, VType) = {
    val kv = VStruct(key.toIndexedSeq.map(k =>
      k -> vTypeOf(schema(k).dataType)))
    (setRequired(writeEType(kv)), kv)
  }

  /** Driver-side single-part RVD (globals / cols). */
  private def writeRvdLocal(conf: Configuration, rows: Seq[Row],
      vType: VStruct, dir: String): Unit = {
    val eType = writeEType(vType)
    val p = new HPath(s"$dir/parts/part-0")
    val fs = p.getFileSystem(conf)
    encodePart(rows.iterator, eType,
      new BufferedOutputStream(fs.create(p, true)))
    writeGz(conf, s"$dir/metadata.json.gz",
      rvdMetadataJson(Nil, vType, eType, Seq("part-0"),
        Seq(catchAllBound)))
  }

  // ---- globals typing -----------------------------------------------------

  private def globalVType(v: Any, name: String): VType = v match {
    case _: Boolean => VBool
    case _: Int => VInt32
    case _: Long => VInt64
    case _: Float => VFloat32
    case _: Double => VFloat64
    case _: String => VString
    case x => throw new IllegalArgumentException(
      s"cannot export global '$name' of ${if (x == null) "null"
      else x.getClass.getName} — only primitive globals are exportable")
  }

  private def globalsStruct(globals: Map[String, Any])
      : (VStruct, Row) = {
    val fields = globals.toSeq.sortBy(_._1)
    (VStruct(fields.map { case (n, v) =>
      n -> globalVType(v, n) }.toIndexedSeq),
      Row.fromSeq(fields.map(_._2)))
  }

  // ---- table writer -------------------------------------------------------

  private def tableSpecJson(tableType: String, counts: Seq[Long],
      globalsRel: String, refsRel: String): String =
    s"""{"name":"TableSpec","file_version":$FileVersion,""" +
      s""""hail_version":"$HailVersionString",""" +
      s""""references_rel_path":"${jsonEscape(refsRel)}",""" +
      s""""table_type":"${jsonEscape(tableType)}",""" +
      s""""components":{""" +
      s""""globals":{"name":"RVDComponentSpec","rel_path":"${jsonEscape(
        globalsRel)}"},""" +
      s""""rows":{"name":"RVDComponentSpec","rel_path":"rows"},""" +
      s""""partition_counts":{"name":"PartitionCountsComponentSpec",""" +
      s""""counts":${counts.mkString("[", ",", "]")}}}}"""

  private def tableTypeString(globalV: VType, key: Seq[String],
      rowV: VType): String =
    s"Table{global:${vTypeString(globalV)}," +
      s"key:[${key.map(prettyIdent).mkString(",")}]," +
      s"row:${vTypeString(rowV)}}"

  /** Export a Table as a reference-readable `.ht` directory.
    * `nPartitions` overrides the range-partition count (default: let
    * Spark/AQE size the shuffle). */
  def writeTable(t: Table, path: String,
      nPartitions: Option[Int] = None): Unit = {
    val conf = t.spark.sparkContext.hadoopConfiguration
    val fs = new HPath(path).getFileSystem(conf)
    fs.mkdirs(new HPath(path))
    val counts = writeRvd(t.df, t.key, s"$path/rows", nPartitions,
      indexDir = Some(s"$path/index"))
    val (gType, gRow) = globalsStruct(t.globals)
    writeRvdLocal(conf, Seq(gRow), gType, s"$path/globals")
    writeGz(conf, s"$path/metadata.json.gz",
      tableSpecJson(tableTypeString(gType, t.key,
        vTypeOf(t.df.schema)), counts, "globals", "references"))
    fs.mkdirs(new HPath(s"$path/references"))
    writeFile(conf, s"$path/_SUCCESS", "")
  }

  // ---- matrix writer ------------------------------------------------------

  /** The reference's fixed entries-column identifier
    * (`types/virtual/MatrixType.scala:23`). */
  val EntriesIdentifier = "the entries! [877f12a8827e18f61222c6c8c5fb04a8]"

  private def matrixTypeString(globalV: VType, colKey: Seq[String],
      colV: VType, rowKey: Seq[String], rowV: VType, entryV: VType)
      : String =
    s"Matrix{global:${vTypeString(globalV)}," +
      s"col_key:[${colKey.map(prettyIdent).mkString(",")}]," +
      s"col:${vTypeString(colV)}," +
      s"row_key:[[${rowKey.map(prettyIdent).mkString(",")}]]," +
      s"row:${vTypeString(rowV)}," +
      s"entry:${vTypeString(entryV)}}"

  /** Export a MatrixTable as a reference-readable `.mt` directory:
    * rows and entries components are written in ONE pass — each task
    * streams its partition to the rows part and the aligned entries
    * part simultaneously, so the two RVDs are partition-identical by
    * construction (the invariant the reader zips on). */
  def writeMatrixTable(mt: MatrixTable, path: String): Unit = {
    val spark = mt.spark
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new HPath(path).getFileSystem(conf)
    fs.mkdirs(new HPath(path))

    val rowSchema = StructType(mt.rows.schema.fields
      .filterNot(_.name == MatrixTable.EntriesField))
    val entryArrayType = mt.rows.schema(MatrixTable.EntriesField).dataType
    val rowV = vTypeOf(rowSchema).asInstanceOf[VStruct]
    val rowE = writeEType(rowV)
    val entV = VStruct(IndexedSeq(
      EntriesIdentifier -> vTypeOf(entryArrayType)))
    val entE = writeEType(entV)
    val entryV = vTypeOf(entryArrayType
      .asInstanceOf[ArrayType].elementType)

    import org.apache.spark.sql.functions.col
    // missing-last key order, matching the reader's expectations
    val kc = mt.rowKey.map(k => col(k).asc_nulls_last)
    val sorted = mt.rows.repartitionByRange(kc: _*)
      .sortWithinPartitions(kc: _*)
    val fields = mt.rows.schema.fieldNames
    val entIdx = fields.indexOf(MatrixTable.EntriesField)
    val rowIdx = fields.indices.filter(_ != entIdx)
    val keyIdx = mt.rowKey.map(fields.indexOf(_))
    for (d <- Seq("rows/rows/parts", "entries/rows/parts", "index"))
      fs.mkdirs(new HPath(s"$path/$d"))
    val (idxKeyE, idxKeyV) = indexTypes(rowSchema, mt.rowKey)

    val sconf = new org.apache.spark.util.SerializableConfiguration(conf)
    val results = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val uuid = java.util.UUID.randomUUID.toString
        val file = f"part-$i%05d-$uuid"
        val taskConf = sconf.value
        def create(s: String) = {
          val p = new HPath(s)
          new BufferedOutputStream(p.getFileSystem(taskConf)
            .create(p, true))
        }
        val rowOut = new OutBuf(32768,
          create(s"$path/rows/rows/parts/$file"))
        val entOut = new OutBuf(32768,
          create(s"$path/entries/rows/parts/$file"))
        // one .idx shared by rows AND entries: key -> rows offset,
        // annotation.entries_offset -> aligned entries offset (the
        // reference's matrix layout — entries seeks through the same
        // index via `_offsetField`)
        val iw = new HailIdx.Writer(
          create(s"$path/index/$file.idx"), idxKeyE, idxKeyV,
          HailIdx.EntriesAnn._1, HailIdx.EntriesAnn._2)
        var first: Row = null
        var last: Row = null
        var n = 0L
        it.foreach { r =>
          if (first == null) first = r
          last = r
          iw.appendRow(Row.fromSeq(keyIdx.map(r.get)),
            rowOut.indexOffset(), Row(entOut.indexOffset()))
          rowOut.writeByte(1)
          encode(rowE, Row.fromSeq(rowIdx.map(r.get)), rowOut)
          entOut.writeByte(1)
          encode(entE, Row(r.get(entIdx)), entOut)
          n += 1
        }
        rowOut.writeByte(0); rowOut.close()
        entOut.writeByte(0); entOut.close()
        iw.close()
        Iterator.single(PartResult(i, file, n,
          keyIdx.map(first.get), keyIdx.map(last.get)))
      }
    }.collect().sortBy(_.index).toSeq

    val rowKeyTypes = keyIdx.map(mt.rows.schema.fields(_).dataType)
    val rowBounds = results.map { r =>
      s"""{"start":${keyJson(mt.rowKey, rowKeyTypes, r.minKey)},""" +
        s""""end":${keyJson(mt.rowKey, rowKeyTypes, r.maxKey)},""" +
        """"includeStart":true,"includeEnd":true}"""
    }
    writeGz(conf, s"$path/rows/rows/metadata.json.gz",
      rvdMetadataJson(mt.rowKey, rowV, rowE, results.map(_.file),
        rowBounds,
        Some(HailIdx.indexSpecJson("../../index", idxKeyE, idxKeyV,
          HailIdx.EntriesAnn._1, HailIdx.EntriesAnn._2, None))))
    writeGz(conf, s"$path/entries/rows/metadata.json.gz",
      rvdMetadataJson(Nil, entV, entE, results.map(_.file),
        results.map(_ => catchAllBound),
        Some(HailIdx.indexSpecJson("../../index", idxKeyE, idxKeyV,
          HailIdx.EntriesAnn._1, HailIdx.EntriesAnn._2,
          Some("entries_offset")))))

    val (gType, gRow) = globalsStruct(mt.globals)
    writeRvdLocal(conf, Seq(gRow), gType, s"$path/globals/rows")
    val colV = vTypeOf(mt.colSchema).asInstanceOf[VStruct]
    writeRvdLocal(conf, mt.colValues, colV, s"$path/cols/rows")

    val counts = results.map(_.count)
    // component TableSpecs (the reader resolves rows/cols/entries/
    // globals each as a table dir)
    writeGz(conf, s"$path/rows/metadata.json.gz",
      tableSpecJson(tableTypeString(gType, mt.rowKey, rowV), counts,
        "../globals/rows", "../references"))
    writeGz(conf, s"$path/entries/metadata.json.gz",
      tableSpecJson(tableTypeString(gType, Nil, entV), counts,
        "../globals/rows", "../references"))
    writeGz(conf, s"$path/cols/metadata.json.gz",
      tableSpecJson(tableTypeString(gType, mt.colKey, colV),
        Seq(mt.colValues.length.toLong), "../globals/rows",
        "../references"))
    writeGz(conf, s"$path/globals/metadata.json.gz",
      tableSpecJson(tableTypeString(gType, Nil, gType), Seq(1L),
        "rows", "../references"))

    writeGz(conf, s"$path/metadata.json.gz",
      s"""{"name":"MatrixTableSpec","file_version":$FileVersion,""" +
        s""""hail_version":"$HailVersionString",""" +
        s""""references_rel_path":"references",""" +
        s""""matrix_type":"${jsonEscape(matrixTypeString(gType,
          mt.colKey, colV, mt.rowKey, rowV, entryV))}",""" +
        s""""components":{""" +
        s""""globals":{"name":"RVDComponentSpec",""" +
        s""""rel_path":"globals/rows"},""" +
        s""""cols":{"name":"RVDComponentSpec",""" +
        s""""rel_path":"cols/rows"},""" +
        s""""rows":{"name":"RVDComponentSpec",""" +
        s""""rel_path":"rows/rows"},""" +
        s""""entries":{"name":"RVDComponentSpec",""" +
        s""""rel_path":"entries/rows"},""" +
        s""""partition_counts":{"name":"PartitionCountsComponentSpec",""" +
        s""""counts":${counts.mkString("[", ",", "]")}}}}""")
    fs.mkdirs(new HPath(s"$path/references"))
    writeFile(conf, s"$path/_SUCCESS", "")
  }
}
