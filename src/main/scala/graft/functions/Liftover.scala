package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** UCSC chain-file liftover (reference
  * `variant/ReferenceGenome.scala` addLiftover /
  * `functions/LocusFunctions.scala` liftoverLocus; chain format is the
  * public UCSC spec).
  *
  * Spark shape: a chain file is megabytes — the alignment blocks become a
  * BROADCAST table and liftover is a declarative range join (contig
  * equality + position-in-block), so lifting a 100 TB variant table is
  * one broadcast hash join, no shuffle of the big side. */
object Liftover {

  /** One gapless alignment block: src [srcStart, srcEnd) (0-based,
    * forward strand) maps to dest starting at destQStart on the chain's
    * strand; `neg` means the dest coordinate counts from the reverse
    * strand of a chromosome of size destQSize. */
  final case class Block(srcContig: String, srcStart: Long, srcEnd: Long,
      destContig: String, destQStart: Long, destQSize: Long, neg: Boolean)

  /** Parse a UCSC chain file into flat blocks. */
  def readChain(spark: SparkSession, path: String): IndexedSeq[Block] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val src = scala.io.Source.fromInputStream(
      fs.open(new org.apache.hadoop.fs.Path(path)))
    try {
      val blocks = IndexedSeq.newBuilder[Block]
      var tName = ""; var qName = ""; var qSize = 0L
      var t = 0L; var q = 0L; var neg = false
      for (line <- src.getLines().map(_.trim) if line.nonEmpty) {
        val f = line.split("\\s+")
        if (f(0) == "chain") {
          // chain score tName tSize tStrand tStart tEnd
          //       qName qSize qStrand qStart qEnd id
          require(f(4) == "+", "chain tStrand must be +")
          tName = f(2); t = f(5).toLong
          qName = f(7); qSize = f(8).toLong
          neg = f(9) == "-"
          q = f(10).toLong
        } else {
          val size = f(0).toLong
          if (size > 0)
            blocks += Block(tName, t, t + size, qName, q, qSize, neg)
          if (f.length >= 3) { t += size + f(1).toLong
            q += size + f(2).toLong }
        }
      }
      blocks.result()
    } finally src.close()
  }

  private val blockSchema = StructType(Seq(
    StructField("__lo_contig", StringType, false),
    StructField("__lo_start", LongType, false),
    StructField("__lo_end", LongType, false),
    StructField("__lo_dest", StringType, false),
    StructField("__lo_qstart", LongType, false),
    StructField("__lo_qsize", LongType, false),
    StructField("__lo_neg", BooleanType, false)))

  /** Left-join liftover: adds `target_contig`, `target_position`
    * (1-based) and `is_negative_strand` columns; unmapped positions stay
    * null. Positions falling in chain gaps are unmapped, like the
    * reference. */
  def liftover(df: DataFrame, blocks: IndexedSeq[Block],
      contigCol: Column, posCol: Column): DataFrame = {
    val spark = df.sparkSession
    val bdf = spark.createDataFrame(
      spark.sparkContext.parallelize(blocks.map(b =>
        Row(b.srcContig, b.srcStart, b.srcEnd, b.destContig,
          b.destQStart, b.destQSize, b.neg)), 1), blockSchema)
    val p0 = posCol.cast("long") - 1L // 1-based locus -> 0-based chain
    val off = p0 - col("__lo_start")
    val dest0 = when(col("__lo_neg"),
      col("__lo_qsize") - 1L - (col("__lo_qstart") + off))
      .otherwise(col("__lo_qstart") + off)
    df.join(broadcast(bdf),
      contigCol === col("__lo_contig") &&
        p0 >= col("__lo_start") && p0 < col("__lo_end"), "left")
      .withColumn("target_contig", col("__lo_dest"))
      .withColumn("target_position", (dest0 + 1L).cast("int"))
      .withColumn("is_negative_strand",
        when(col("__lo_dest").isNotNull, col("__lo_neg")))
      .drop(blockSchema.fieldNames: _*)
  }
}
