package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Deterministic per-query profile for optimization evidence: runs each
  * named SparkEntry query once (after one untimed warm-up of the first
  * query to absorb session init) and reports counters that do NOT
  * depend on host noise — Spark job count, stage count, shuffle
  * read/write bytes, input bytes, codegen compilation count and time —
  * plus the (noisy) wall time for context. Guide §1: measure first;
  * on a host with 10-100x stall spikes the byte/count metrics are the
  * trustworthy axis.
  * Usage: runMain graft.tools.ProfileQuery q1,q2,...
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench). */
object ProfileQuery {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val shufRead = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    val inBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet(): Unit
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inBytes.addAndGet(m.inputMetrics.bytesRead)
          ()
        }
      }
    })
    def codegenCount: Long = org.apache.spark.metrics.source
      .CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    def codegenMs: Double = {
      val s = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getSnapshot
      s.getValues.map(_.toDouble).sum
    }
    def resetAll(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      graft.pipeline.Materialize.release(spark)
      spark.sharedState.cacheManager.clearCache()
    }
    // warm-up: absorb session/codegen/first-scan init outside the
    // measured run (same role as Bench's burn-in pass)
    names.headOption.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir).count(): Unit
      resetAll()
    }
    println(f"${"query"}%-28s ${"jobs"}%5s ${"stg"}%5s ${"shufR_MB"}%9s " +
      f"${"shufW_MB"}%9s ${"in_MB"}%8s ${"cgN"}%5s ${"cg_ms"}%8s ${"wall_s"}%7s")
    names.foreach { name =>
      Thread.sleep(800) // let listener events drain (bus is private)
      val (j0, s0, r0, w0, i0) = (jobs.get, stages.get, shufRead.get,
        shufWrite.get, inBytes.get)
      val (c0, m0) = (codegenCount, codegenMs)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count(): Unit
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // let listener events drain (bus is private)
      println(f"$name%-28s ${jobs.get - j0}%5d ${stages.get - s0}%5d " +
        f"${(shufRead.get - r0) / 1e6}%9.1f " +
        f"${(shufWrite.get - w0) / 1e6}%9.1f " +
        f"${(inBytes.get - i0) / 1e6}%8.1f " +
        f"${codegenCount - c0}%5d ${codegenMs - m0}%8.0f $wall%7.2f")
      resetAll()
    }
    spark.stop()
  }
}
