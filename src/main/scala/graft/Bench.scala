package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Mirrors the reference's
  * benchmark harness discipline (`python/benchmark/hail/conftest.py`:
  * >=1 burn-in + >=3 timed iterations); per-query time is the median of the
  * timed iterations, so JVM/codegen warmup does not pollute the numbers.
  * A failing query fails the whole bench loudly — a benchmark that records
  * broken queries as fast is worse than one that crashes. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAILURE in query '$name': $e")
          throw e
      }
      (System.nanoTime() - t0) / 1e9
    }
    // dev-loop filter: SPARK_GRAFT_BENCH_ONLY=q1,q2 times a subset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    queries.foreach { case (n, f) => runOnce(n, f) } // burn-in
    val results = queries.map { case (name, fn) =>
      val times = (1 to iters).map(_ => runOnce(name, fn)).sorted
      name -> times(times.length / 2) // median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
