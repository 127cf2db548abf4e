package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-micro-batch duration attribution for the streaming parity gates
  * (guide §1: measure first). Attaches a StreamingQueryListener, runs
  * each named SparkEntry query once, and prints every micro-batch's
  * `durationMs` breakdown (triggerExecution = total; addBatch = sink +
  * state work; queryPlanning / getBatch / latestOffset = driver-side
  * incremental re-planning; commitOffsets / walCommit = progress-log
  * I/O) plus batch row counts and state-store commit counts. These are
  * the deterministic axes for the stream-family floor: batches ×
  * state partitions × per-commit cost.
  * Usage: runMain graft.tools.StreamProfile q1,q2,...
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench). */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation",
        "true")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val batches =
      collection.mutable.ArrayBuffer[(String, Long, Map[String, Long],
        Long, Long)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs.entrySet().iterator()
        var m = Map.empty[String, Long]
        while (dur.hasNext) {
          val kv = dur.next(); m += (kv.getKey -> kv.getValue.longValue())
        }
        val st = p.stateOperators
        val commits =
          if (st == null || st.isEmpty) 0L
          else st.map(_.numShufflePartitions).sum
        batches += ((p.name, p.batchId, m, p.numInputRows, commits))
      }
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      batches.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val keys = Seq("triggerExecution", "queryPlanning", "getBatch",
        "latestOffset", "addBatch", "walCommit", "commitOffsets")
      println(f"== $name%s rows=$n%d wall=$wall%.2fs batches=${batches.length}%d")
      batches.foreach { case (q, id, m, rows, commits) =>
        val cells = keys.map(k => f"$k=${m.getOrElse(k, 0L)}%d")
          .mkString(" ")
        println(f"  [$q%s b$id%d] rows=$rows%d stateParts=$commits%d $cells")
      }
      val sums = keys.map(k =>
        k -> batches.map(_._3.getOrElse(k, 0L)).sum).toMap
      println("  SUM " +
        keys.map(k => f"$k=${sums(k)}%d").mkString(" ") +
        f" (wall_ms=${(wall * 1000).toLong}%d)")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      graft.pipeline.Materialize.release(spark)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
