package graft

import java.io.{BufferedInputStream, ByteArrayOutputStream, FileInputStream, FileOutputStream}

import graft.sources.{BGzip, BGzipOutputStream, BGzipSplitInputStream, Vcf}

class BGzipSpec extends SparkSpec {

  private def vcfLines(n: Int): String = {
    val sb = new StringBuilder
    sb ++= "##fileformat=VCFv4.2\n"
    sb ++= "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"\">\n"
    sb ++= "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n"
    (1 to n).foreach { i =>
      sb ++= s"${1 + i % 2}\t${100 + i}\t.\tA\tC\t.\t.\t.\tGT\t0/${i % 2}\t1/1\n"
    }
    sb.toString
  }

  private def writeBgz(text: String, blockSize: Int): java.nio.file.Path = {
    val f = java.nio.file.Files.createTempFile("graft_bgzip", ".vcf.bgz")
    val out = new BGzipOutputStream(new FileOutputStream(f.toFile), blockSize)
    out.write(text.getBytes("UTF-8"))
    out.close()
    f
  }

  test("BGZF stream round-trips and is block-structured") {
    val text = vcfLines(4000)
    val f = writeBgz(text, 1024)
    val len = java.nio.file.Files.size(f)
    // many blocks: the EOF scan must find a boundary inside the file
    assert(len > 5 * 64 && text.length / 1024 > 10)
    val in = new BGzipSplitInputStream(
      new BufferedInputStream(new FileInputStream(f.toFile)) with
        org.apache.hadoop.fs.Seekable {
        def seek(p: Long): Unit = ()
        def getPos: Long = 0L
        def seekToNewSource(p: Long): Boolean = false
      }, 0L, Long.MaxValue)
    val bos = new ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    var n = in.read(buf, 0, buf.length)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf, 0, buf.length) }
    in.close()
    assert(new String(bos.toByteArray, "UTF-8") == text)
  }

  test("adjacent splits partition the blocks exactly") {
    val text = vcfLines(4000)
    val f = writeBgz(text, 1024)
    val len = java.nio.file.Files.size(f)
    def readRange(start: Long, end: Long): Array[Byte] = {
      val raw = new java.io.RandomAccessFile(f.toFile, "r")
      val in = new java.io.InputStream with org.apache.hadoop.fs.Seekable {
        def read(): Int = raw.read()
        override def read(b: Array[Byte], o: Int, l: Int): Int =
          raw.read(b, o, l)
        def seek(p: Long): Unit = raw.seek(p)
        def getPos: Long = raw.getFilePointer
        def seekToNewSource(p: Long): Boolean = false
      }
      val s = new BGzipSplitInputStream(in, start, end)
      val bos = new ByteArrayOutputStream
      val buf = new Array[Byte](8192)
      // ownership rule (the getPos()+1 contract): a split owns exactly
      // the blocks whose first compressed byte lies in [start, end).
      // Reads never cross a block boundary, and after a read getPos-1 is
      // the current block's start offset — keep bytes while it's < end.
      var stop = false
      while (!stop) {
        val n = s.read(buf, 0, buf.length)
        if (n < 0 || s.getPos - 1 >= end) stop = true
        else bos.write(buf, 0, n)
      }
      s.close(); raw.close()
      bos.toByteArray
    }
    // a mid-file cut not aligned to any block boundary
    val mid = len / 3 + 17
    val a = readRange(0, mid)
    val b = readRange(mid, len)
    assert(a.nonEmpty && b.nonEmpty)
    val all = new String(a ++ b, "UTF-8")
    // block-granular handoff: the two halves together cover every byte
    // exactly once (the byte-level proof of no dup/no gap at the seam)
    assert(all == text)
  }

  test("multi-split .vcf.bgz import matches the uncompressed import") {
    val text = vcfLines(20000)
    val bgz = writeBgz(text, 1024)
    val dir = java.nio.file.Files.createTempDirectory("graft_bgzip_plain")
    val plain = dir.resolve("test.vcf")
    java.nio.file.Files.writeString(plain, text)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      val mtB = Vcf.read(spark, bgz.toString)
      val mtP = Vcf.read(spark, plain.toString)
      // the single .bgz file really was scanned by >1 task
      assert(mtB.rows.rdd.getNumPartitions > 1)
      val fp = (mt: MatrixTable) => mt.entriesTable.df
        .selectExpr("sum(position)", "count(*)",
          "sum(cast(GT as long) * position)")
        .collect()(0)
      assert(fp(mtB) == fp(mtP))
      assert(mtB.rows.count() == 20000)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
