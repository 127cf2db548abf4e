package graft

import java.io.File

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.sources.HailNative

/** Cross-version decode validation against the reference's own
  * backward-compatibility corpus: the same "all values" table / matrix
  * table written by every hail release era (file_version 1.0.0–1.8.0)
  * under every codec supported at the time
  * (`test/resources/backward_compatability`, generator
  * `python/test/hail/matrixtable/test_file_formats.py:18-40`). Every
  * file must decode, and decode to the SAME values as the newest file
  * on the columns the schemas share — so a silent mis-decode of any
  * era/codec combination (missing-bit layout, length encoding, block
  * framing) fails loudly here rather than corrupting user data. */
class BackCompatSpec extends SparkSpec {

  private val Base =
    "/root/reference/hail/hail/test/resources/backward_compatability"

  private def versionDirs: Seq[File] = {
    val b = new File(Base)
    if (!b.isDirectory) Nil
    else b.listFiles.filter(_.isDirectory).sortBy(_.getName).toSeq
  }

  /** name -> rendered value per row, keyed for order-stable compare. */
  private def rendered(df: org.apache.spark.sql.DataFrame, key: String)
      : Seq[Map[String, String]] = {
    val names = df.schema.fieldNames
    df.orderBy(key).collect().toSeq.map { r =>
      names.zipWithIndex.map { case (n, i) =>
        n -> String.valueOf(r.get(i))
      }.toMap
    }
  }

  private def compareCommon(got: Seq[Map[String, String]],
      want: Seq[Map[String, String]], label: String): Unit = {
    assert(got.length == want.length, s"$label: row count")
    val common = got.headOption.map(_.keySet).getOrElse(Set.empty)
      .intersect(want.headOption.map(_.keySet).getOrElse(Set.empty))
    assert(common.nonEmpty, s"$label: no shared columns")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      common.foreach { c =>
        assert(g(c) == w(c), s"$label row $i col $c: ${g(c)} != ${w(c)}")
      }
    }
  }

  test("every hail-written .ht era/codec decodes to the same values") {
    assume(versionDirs.nonEmpty)
    val files = for {
      v <- versionDirs
      d = new File(v, "table") if d.isDirectory
      f <- d.listFiles.sortBy(_.getName)
    } yield f
    assert(files.length >= 50, s"fixture corpus shrank: ${files.length}")
    val refT = HailNative.readTable(spark,
      files.last.getPath) // newest version, last codec
    val want = rendered(refT.df, "idx")
    assert(want.length == 5)
    files.foreach { f =>
      val t = HailNative.readTable(spark, f.getPath)
      assert(t.key == Seq("idx"), s"$f: key ${t.key}")
      compareCommon(rendered(t.df, "idx"), want, f.getPath)
      // globals agree on shared names too
      val commonG = t.globals.keySet.intersect(refT.globals.keySet)
      assert(commonG.size >= 16, s"$f: globals ${commonG.size}")
      commonG.foreach { k =>
        assert(String.valueOf(t.globals(k)) ==
          String.valueOf(refT.globals(k)), s"$f global $k")
      }
    }
  }

  test("every hail-written .hmt era/codec decodes to the same values") {
    assume(versionDirs.nonEmpty)
    val files = for {
      v <- versionDirs
      d = new File(v, "matrix_table") if d.isDirectory
      f <- d.listFiles.sortBy(_.getName)
    } yield f
    assert(files.length >= 50, s"fixture corpus shrank: ${files.length}")
    import org.apache.spark.sql.functions._
    def entryFieldsOf(mt: MatrixTable): Set[String] =
      mt.rows.schema(MatrixTable.EntriesField).dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType.asInstanceOf[StructType].fieldNames.toSet
    // entries: explode to (row, col-slot) coordinates projected onto a
    // shared sorted field list, so eras with extra entry fields (1.8.0
    // added entry_nd) stay comparable on the rest
    def renderedEntries(mt: MatrixTable, fields: Seq[String])
        : Seq[String] =
      mt.rows
        .select(col("row_idx"),
          posexplode_outer(col(MatrixTable.EntriesField)).as(Seq("ci", "e")))
        .select(col("row_idx"), col("ci"),
          struct(fields.map(fn => col("e")(fn).as(fn)): _*).as("e"))
        .orderBy("row_idx", "ci")
        .collect().toSeq
        .map(r => s"${r.get(0)}/${r.get(1)}: ${r.get(2)}")
    val ref = HailNative.readMatrixTable(spark, files.last.getPath)
    val wantRows = rendered(ref.rows.drop(MatrixTable.EntriesField),
      "row_idx")
    val refEntryFields = entryFieldsOf(ref)
    assert(wantRows.length == 3)
    files.foreach { f =>
      val mt = HailNative.readMatrixTable(spark, f.getPath)
      assert(mt.nCols == 2, s"$f: nCols ${mt.nCols}")
      assert(mt.colKey == Seq("col_idx") || mt.colKey == Seq("s") ||
        mt.colKey.nonEmpty, s"$f: colKey ${mt.colKey}")
      val commonE = entryFieldsOf(mt).intersect(refEntryFields)
        .toSeq.sorted
      assert(commonE.size >= 16, s"$f: entry fields ${commonE.size}")
      assert(renderedEntries(mt, commonE) == renderedEntries(ref, commonE),
        s"$f: entries differ")
      compareCommon(rendered(mt.rows.drop(MatrixTable.EntriesField),
        "row_idx"), wantRows, f.getPath)
      // col rows: compare rendered maps on shared names
      val gotCols = mt.colValues.map { r =>
        mt.colSchema.fieldNames.zipWithIndex.map { case (n, i) =>
          n -> String.valueOf(r.get(i))
        }.toMap
      }
      val wantCols = ref.colValues.map { r =>
        ref.colSchema.fieldNames.zipWithIndex.map { case (n, i) =>
          n -> String.valueOf(r.get(i))
        }.toMap
      }
      compareCommon(gotCols, wantCols, s"$f cols")
    }
  }

  test("pre-1.2 packed-type derivation matches the modern writer") {
    import HailNative._
    // the derived canonical encoding must equal what the 1.2.0+ writer
    // spells out explicitly (cf. 1.2.0/table/0.ht `_eType`)
    val (v, e) = parsePackedType(
      "Struct{c:Call,s:String,a:Array[+Int32],d:Dict[String,Float64]," +
        "l:Locus(GRCh38),i:Interval[Locus(GRCh37)],t:Tuple[Call,String]}")
    assert(v == VStruct(IndexedSeq(
      "c" -> VCall, "s" -> VString, "a" -> VArray(VInt32),
      "d" -> VDict(VString, VFloat64), "l" -> VLocus("GRCh38"),
      "i" -> VInterval(VLocus("GRCh37")),
      "t" -> VTuple(IndexedSeq(VCall, VString)))))
    val locusE = EStru(IndexedSeq(
      "contig" -> EBin(required = true, varintLen = false),
      "position" -> EI32(required = true)), false)
    assert(e == EStru(IndexedSeq(
      "c" -> EI32(false),
      "s" -> EBin(false, varintLen = false),
      "a" -> EArr(EI32(true), false, varintLen = false),
      "d" -> EArr(EStru(IndexedSeq(
        "key" -> EBin(false, varintLen = false),
        "value" -> EF64(false)), required = true), false,
        varintLen = false),
      "l" -> locusE,
      "i" -> EStru(IndexedSeq("start" -> locusE, "end" -> locusE,
        "includesStart" -> EBool(true), "includesEnd" -> EBool(true)),
        false),
      "t" -> EStru(IndexedSeq("0" -> EI32(false),
        "1" -> EBin(false, varintLen = false)), false)), false))
  }
}
