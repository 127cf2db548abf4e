package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // legacy events data carried TIMESTAMP(NANOS) (read as long ns
      // under this flag); current data is TIMESTAMP(MICROS) → NTZ, and
      // Events.tsNanos adapts to either — the flag stays for old files
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // streaming parity harnesses use implicit temp checkpoints; without
      // this they survive q.stop() and accrete across iterations
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation",
        "true")
      // codegen class cache sized to the fleet (see Bench.scala): the
      // 100-entry default recompiles every stage once the 283-query
      // dump cycles past it
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-loop filter: SPARK_GRAFT_VERIFY_ONLY=q1,q2 dumps a subset;
    // SPARK_GRAFT_VERIFY_RESUME=1 skips queries already dumped (their
    // _SUCCESS marker exists) so an interrupted scale run continues
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val resume = sys.env.get("SPARK_GRAFT_VERIFY_RESUME").contains("1")
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): coalesce reaches through any
      // shuffle-free tail and collapses the whole computation into one
      // task — at scale that serializes the query; the round-robin
      // exchange keeps compute parallel and only the write single-file
      if (resume &&
          new java.io.File(s"$outDir/$name/_SUCCESS").exists()) ()
      else try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // the write above is each gate's terminal action: under
      // persistDisk, release the operator's fan-out pins here or a
      // full run accumulates one pinned disk frame per gate
      // (no-op under the default localCheckpoint mode)
      finally pipeline.Materialize.release(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
