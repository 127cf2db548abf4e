package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{HailNative, HailNativeWrite}

class HailNativeWriteSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_hnw").resolve(name).toString

  test("ht round-trip: schema, values, missingness, key, globals") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1, Some("alpha"), Some(1.5), Seq("x", "y"), Map("a" -> 1, "b" -> 2)),
      (2, Some("beta"), None, Seq.empty[String], Map.empty[String, Int]),
      (3, None, Some(-0.0), Seq("z"), Map("c" -> -7))
    ).toDF("id", "name", "score", "tags", "counts")
      .withColumn("nested", struct(col("id") * 2 as "twice",
        col("name") as "alias"))
    val t = Table(df, Seq("id"), Map("pop" -> "EUR", "version" -> 42))
    val path = tmp("roundtrip.ht")
    HailNativeWrite.writeTable(t, path)

    val back = HailNative.readTable(spark, path)
    assert(back.key == Seq("id"))
    assert(back.globals == Map("pop" -> "EUR", "version" -> 42))
    val rows = back.df.orderBy("id").collect()
    assert(rows.length == 3)
    val r1 = rows(0)
    assert(r1.getInt(0) == 1 && r1.getString(1) == "alpha" &&
      r1.getDouble(2) == 1.5)
    assert(r1.getSeq[String](3) == Seq("x", "y"))
    // maps export as hail dicts = sorted key/value struct arrays
    assert(r1.getSeq[Row](4) == Seq(Row("a", 1), Row("b", 2)))
    assert(r1.getStruct(5) == Row(2, "alpha"))
    val r2 = rows(1)
    assert(r2.isNullAt(2) && r2.getSeq[String](3).isEmpty &&
      r2.getSeq[Row](4).isEmpty)
    val r3 = rows(2)
    assert(r3.isNullAt(1) &&
      java.lang.Double.doubleToRawLongBits(r3.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(-0.0))
    assert(r3.getSeq[Row](4) == Seq(Row("c", -7)))
    assert(r3.getStruct(5) == Row(6, null))
  }

  test("ht write is distributed, sorted and pruned of empty parts") {
    val sp = spark; import sp.implicits._
    val df = spark.range(1000).select(
      (col("id") * 37 % 1000).as("k"),
      (col("id") % 7).as("v"))
    val path = tmp("big.ht")
    HailNativeWrite.writeTable(Table(df, Seq("k")), path,
      nPartitions = Some(4))
    val back = HailNative.readTable(spark, path)
    assert(back.df.count() == 1000)
    // read back in key order: first/last keys match the extremes
    val ks = back.df.orderBy("k").select("k").as[Long].collect()
    assert(ks.head == 0 && ks.last == 999 && ks.toSeq == ks.toSeq.sorted)
    // multiple part files (range partitioning), no empty parts listed
    val meta = sources.HailNative.readRvdSpec(
      spark.sparkContext.hadoopConfiguration, s"$path/rows")
    assert(meta.partFiles.length > 1)
    assert(meta.key == Seq("k"))
  }

  test("metadata shape matches the reference 1.8.0 layout") {
    val sp = spark; import sp.implicits._
    val path = tmp("shape.ht")
    HailNativeWrite.writeTable(
      Table(Seq((1, "a"), (2, "b")).toDF("id", "s"), Seq("id"),
        Map("g" -> 1)), path)
    def readGz(p: String): String = {
      val in = new java.util.zip.GZIPInputStream(
        Files.newInputStream(java.nio.file.Paths.get(p)))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    val top = readGz(s"$path/metadata.json.gz")
    // exact field inventory the reference's TableSpec reader consumes
    for (k <- Seq("\"name\":\"TableSpec\"", "\"file_version\":67584",
      "\"references_rel_path\"", "\"table_type\":\"Table{global:Struct{" +
        "g:Int32},key:[id],row:Struct{id:Int32,s:String}}\"",
      "PartitionCountsComponentSpec"))
      assert(top.contains(k), s"missing $k in $top")
    val rvd = readGz(s"$path/rows/metadata.json.gz")
    for (k <- Seq("\"name\":\"IndexedRVDSpec2\"", "\"_key\":[\"id\"]",
      "\"_indexSpec\":{\"name\":\"IndexSpec2\"",
      "\"_relPath\":\"../index\"",
      "TypedCodecSpec", "\"_eType\":\"EBaseStruct{id:EInt32,s:EBinary2}\"",
      "\"_vType\":\"Struct{id:Int32,s:String}\"",
      "LZ4FastBlockBufferSpec", "StreamBlockBufferSpec2",
      "\"_jRangeBounds\":[{\"start\":{\"id\": 1}, \"end\":{\"id\": 2}"
        .replace("{\"id\": 1}, \"end\"", "{\"id\": 1},\"end\""),
      "\"_attrs\":{}"))
      assert(rvd.contains(k), s"missing $k in $rvd")
    assert(Files.exists(java.nio.file.Paths.get(s"$path/_SUCCESS")))
  }

  test("mt round-trip: rows, entries alignment, cols, globals") {
    val sp = spark; import sp.implicits._
    val entryT = ArrayType(StructType(Seq(
      StructField("gt", IntegerType), StructField("dp", IntegerType))))
    val schema = StructType(Seq(
      StructField("locus", StructType(Seq(
        StructField("contig", StringType),
        StructField("position", IntegerType)))),
      StructField("ref", StringType),
      StructField(MatrixTable.EntriesField, entryT)))
    val data = Seq(
      Row(Row("chr1", 100), "A", Seq(Row(0, 10), Row(1, null))),
      Row(Row("chr1", 200), "C", Seq(Row(null, 5), Row(2, 20))),
      Row(Row("chr2", 50), "G", Seq(Row(1, 1), Row(0, 2))))
    val rows = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), schema)
    val mt = MatrixTable(rows, Seq("ref"),
      IndexedSeq(Row("S1"), Row("S2")),
      StructType(Seq(StructField("s", StringType))), Seq("s"),
      Map("note" -> "fixture"))
    val path = tmp("roundtrip.mt")
    HailNativeWrite.writeMatrixTable(mt, path)

    val back = HailNative.readMatrixTable(spark, path)
    assert(back.nCols == 2 && back.colKey == Seq("s"))
    assert(back.colValues.map(_.getString(0)) == Seq("S1", "S2"))
    assert(back.globals == Map("note" -> "fixture"))
    val got = back.rows.orderBy(col("locus")("position")).collect()
    assert(got.length == 3)
    assert(got(0).getStruct(0) == Row("chr2", 50) &&
      got(0).getString(1) == "G")
    assert(got(0).getSeq[Row](2) == Seq(Row(1, 1), Row(0, 2)))
    assert(got(1).getSeq[Row](2) == Seq(Row(0, 10), Row(1, null)))
    assert(got(2).getSeq[Row](2) == Seq(Row(null, 5), Row(2, 20)))
  }

  test("null key values export nulls-LAST (hail's missing ordering)") {
    val sp = spark; import sp.implicits._
    val df = Seq(Option(5), None, Option(1), Option(3), None)
      .toDF("k").withColumn("v", lit(1))
    val path = tmp("nullkey.ht")
    HailNativeWrite.writeTable(Table(df, Seq("k")), path,
      nPartitions = Some(2))
    val back = HailNative.readTable(spark, path)
    assert(back.df.count() == 5)
    assert(back.df.filter(col("k").isNull).count() == 2)
    // the LAST listed part carries the nulls: its bound ends at null
    val meta = {
      val in = new java.util.zip.GZIPInputStream(
        Files.newInputStream(java.nio.file.Paths.get(
          s"$path/rows/metadata.json.gz")))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    val bounds = "\"_jRangeBounds\":\\[(.*?)\\]".r
      .findFirstMatchIn(meta).get.group(1)
    assert(bounds.endsWith(""""end":{"k": null},"includeStart":true,""" +
      """"includeEnd":true}"""), bounds)
    assert(!bounds.startsWith("""{"start":{"k": null}"""), bounds)
    // map with float keys sorts numerically on disk
    val df2 = Seq((1, Map(2.5f -> 1, 0.5f -> 2, 1.5f -> 3)))
      .toDF("id", "m")
    val p2 = tmp("fkey.ht")
    HailNativeWrite.writeTable(Table(df2, Seq("id")), p2)
    val r = HailNative.readTable(spark, p2).df.head()
    assert(r.getSeq[Row](1).map(_.getFloat(0)) == Seq(0.5f, 1.5f, 2.5f))
  }

  test("full circle on a reference-written 1.8.0 all-values table") {
    // the hardest nesting the format carries: sets, dicts keyed by
    // arrays, loci, intervals, tuples, calls, an ndarray — read the
    // reference's own file, re-export with OUR writer, re-import, and
    // demand value-identical rows
    val src = "/root/reference/hail/hail/test/resources/" +
      "backward_compatability/1.8.0/table/0.ht"
    assume(new java.io.File(src).isDirectory)
    val orig = HailNative.readTable(spark, src)
    val path = tmp("circle.ht")
    HailNativeWrite.writeTable(
      orig.copy(globals = Map.empty), path, nPartitions = Some(2))
    val back = HailNative.readTable(spark, path)
    assert(back.key == Seq("idx"))
    val a = orig.df.orderBy("idx").collect().toSeq.map(_.toString)
    val b = back.df.orderBy("idx").collect().toSeq.map(_.toString)
    assert(a == b)
    assert(back.df.schema == orig.df.schema)
  }

  test("unsupported dtypes refuse loudly with an actionable message") {
    val sp = spark; import sp.implicits._
    val df = Seq((1, java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      .toDF("id", "ts")
    val e = intercept[IllegalArgumentException] {
      HailNativeWrite.writeTable(Table(df, Seq("id")), tmp("bad.ht"))
    }
    assert(e.getMessage.contains("cast to a hail-representable type"))
  }
}
