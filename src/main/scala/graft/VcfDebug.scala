package graft
import org.apache.spark.sql.functions._
object VcfDebug {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("vd")
    val vcf = "##fileformat=VCFv4.2\n##INFO=<ID=AC,Number=A,Type=Integer,Description=\"AC\">\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA1\tNA2\tNA3\nchr1\t100\trs1\tA\tG\t50.0\tPASS\tAC=2;AN=6\tGT:DP\t0/1\t0|0\t1/1\nchr1\t200\t.\tC\tT,TT\t.\tq10\tAC=1\tGT:DP\t0/2:7\t.\t0/0:9\nchr2\t5\trs9\tG\tC\t9.5\tPASS\t.\tGT\t1\t0/1\t./.\n"
    val f = dir.resolve("t.vcf"); java.nio.file.Files.writeString(f, vcf)
    val raw = spark.read.text(f.toString).filter(!col("value").startsWith("#"))
    println("raw count: " + raw.count())
    raw.collect().foreach(r => println("LINE: [" + r.getString(0).take(30) + "]"))
    val mt = graft.sources.Vcf.read(spark, f.toString)
    println("rows: " + mt.rows.count())
    mt.rows.orderBy("contig","position").collect().foreach(println)
    spark.stop()
  }
}
