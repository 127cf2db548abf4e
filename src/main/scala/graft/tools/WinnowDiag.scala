package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale diagnostic for the winnow-parity pipeline: prints the
  * fingerprint-bucket distribution and the candidate pair mass
  * Σ C(min(b, cap), 2) at SPARK_GRAFT_SF_DIR — the number that decides
  * whether the CANDIDATE self-join (not the verification join) is the
  * disk bottleneck at a given scale. */
object WinnowDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/.bench-data/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"docs=${docs.count()}")
    val fps = docs.select(col("doc_id").as("doc"),
        graft.pipeline.Text.winnowFingerprints(col("text"), 16, 4)
          .as("fps"))
      .filter(size(col("fps")) > 0)
    val flat = fps.select(col("doc"), explode(col("fps")).as("fp"))
    println(s"fp rows=${flat.count()}")
    val b = flat.groupBy("fp").agg(count(lit(1)).as("b"))
    val capped = least(col("b"), lit(10000L))
    b.agg(count(lit(1)).as("buckets"), max("b").as("max_b"),
      sum(col("b") * (col("b") - 1) / 2).as("pair_mass_uncapped"),
      sum(capped * (capped - 1) / 2).as("pair_mass_capped"))
      .show(false)
    b.filter(col("b") > 100)
      .agg(count(lit(1)).as("buckets_gt100"),
        sum(col("b") * (col("b") - 1) / 2).as("mass_gt100"))
      .show(false)
    spark.stop()
  }
}
