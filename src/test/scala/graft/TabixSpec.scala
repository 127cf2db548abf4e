package graft

import java.io.FileOutputStream

import org.apache.spark.sql.functions._

import graft.sources.{BGzipOutputStream, BGzipVirtualLineReader, Tabix, Vcf}

class TabixSpec extends SparkSpec {

  // two contigs, 3000 variants each, positions 10, 20, ... 30000
  private def vcfText(): String = {
    val sb = new StringBuilder
    sb ++= "##fileformat=VCFv4.2\n"
    sb ++= "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"\">\n"
    sb ++= "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n"
    // positions spread to i*100 so records span many 16 kb binning
    // windows (dense positions would collapse into one bottom-level bin)
    Seq("chr1", "chr2").foreach { c =>
      (1 to 3000).foreach { i =>
        sb ++= s"$c\t${i * 100}\t.\tAC\tG\t.\t.\t.\tGT\t0/1\t1/1\n"
      }
    }
    sb.toString
  }

  private def fixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tbx")
    val f = dir.resolve("t.vcf.bgz")
    val out = new BGzipOutputStream(new FileOutputStream(f.toFile), 2048)
    out.write(vcfText().getBytes("UTF-8"))
    out.close()
    Tabix.write(spark, f.toString)
    f.toString
  }

  test("virtual line reader round-trips offsets through seek") {
    val path = fixture()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val r = new BGzipVirtualLineReader(
      fs.open(new org.apache.hadoop.fs.Path(path)))
    // remember the virtual offset of the 100th line, read on, seek back
    (0 until 99).foreach(_ => r.readLine())
    val v = r.virtualOffset
    val line100 = r.readLine()
    (0 until 500).foreach(_ => r.readLine())
    r.virtualSeek(v)
    assert(r.readLine() == line100)
    r.close()
  }

  test("tbi round-trip: written index parses back consistently") {
    val path = fixture()
    val idx = Tabix.read(spark, path + ".tbi")
    assert(idx.seqs == IndexedSeq("chr1", "chr2"))
    assert(idx.bins.length == 2 && idx.linear.forall(_.nonEmpty))
    // every chunk's virtual offsets resolve to real record starts
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val r = new BGzipVirtualLineReader(
      fs.open(new org.apache.hadoop.fs.Path(path)))
    val chunk = idx.bins(1).values.head.head
    r.virtualSeek(chunk._1)
    val l = r.readLine()
    assert(l != null && l.startsWith("chr2\t"))
    r.close()
  }

  test("readRegions returns exactly the in-region rows via seek") {
    val path = fixture()
    val mt = Vcf.readRegions(spark, path,
      Seq(("chr1", 10001, 15000), ("chr2", 290001, 300000)))
    val got = mt.rows.select(col("contig"), col("position")).collect()
      .map(r => (r.getString(0), r.getInt(1))).sorted
    val want = ((10001 to 15000).filter(_ % 100 == 0).map(("chr1", _)) ++
      (290001 to 300000).filter(_ % 100 == 0).map(("chr2", _))).sorted
    assert(got.toSeq == want)
    // entries survive the seek path identically to a full import
    val full = Vcf.read(spark, path)
    val fullSlice = full.entriesTable.df
      .filter(col("contig") === "chr1" &&
        col("position").between(10001, 15000))
      .selectExpr("sum(position)", "sum(GT)", "count(*)").collect()(0)
    val seekSlice = mt.entriesTable.df
      .filter(col("contig") === "chr1")
      .selectExpr("sum(position)", "sum(GT)", "count(*)").collect()(0)
    assert(seekSlice == fullSlice)
  }

  test("region query touches few blocks, not the whole file") {
    val path = fixture()
    val idx = Tabix.read(spark, path + ".tbi")
    // ~50 of chr1's 3000 records
    val chunks = Tabix.queryChunks(idx, 0, 10000, 15000)
    assert(chunks.nonEmpty)
    // compressed distance walked from first to last touched block is a
    // small fraction of the file (the whole point of the seek)
    val span = (chunks.last._2 >>> 16) - (chunks.head._1 >>> 16) + 65536
    val walked = chunks.map(c => (c._2 >>> 16) - (c._1 >>> 16)).sum
    val fileLen = java.nio.file.Files.size(java.nio.file.Paths.get(path))
    assert(walked < fileLen / 10, s"walked $walked of $fileLen")
    assert((chunks.head._1 >>> 16) > 0 || chunks.length == 1)
  }
}
