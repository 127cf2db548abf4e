package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.pipeline.Text

/** Streaming corpus profiling: the `pipeline.Text` feature kernels are
  * pure codegen'd Column expressions, so they lift onto a Structured
  * Streaming source unchanged — the same language-ID, token-count and
  * quality logic that filters a batch corpus scores an unbounded
  * document feed (reference parity: none — the reference has no
  * streaming surface, SURVEY §2.9; this is part of graft's
  * training-data pipeline extension).
  *
  * Scale shape: the stateless feature pass holds no state at all; the
  * per-language profile is a streaming grouped aggregate whose state
  * is ONE ROW PER LANGUAGE — bounded regardless of corpus size, so it
  * survives a 100 TB/day feed without watermark tuning. */
object StreamText {

  /** Stateless per-document features on a document stream (or batch
    * frame — the expression tree is identical). */
  def docFeatures(docs: DataFrame, id: String, text: String): DataFrame = {
    val t = col(text)
    docs.select(col(id),
      Text.langId(t).as("pred_lang"),
      Text.tokenCount(t).as("n_tokens"),
      Text.qualityScore(t).as("quality"))
  }

  /** Per-language corpus profile: doc count + token volume. In
    * streaming this runs as a complete-mode grouped aggregate (state =
    * one row per language). */
  def langProfile(docs: DataFrame, id: String, text: String): DataFrame =
    docFeatures(docs, id, text)
      .groupBy(col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))

  /** Drive the profile over a parquet file/dir as a file stream
    * (one file per micro-batch) into a memory sink; returns the final
    * profile. Mirrors `StreamDedup.runMinhashPairs`'s staging. */
  def runLangProfile(spark: org.apache.spark.sql.SparkSession,
      path: String, schema: org.apache.spark.sql.types.StructType,
      id: String, text: String, sinkName: String,
      numStatePartitions: Int = 8): DataFrame = {
    val dir = Events.stageAsDir(path, "graft_stxt")
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", Events.filesPerTrigger(dir))
      .parquet(dir)
    Events.withStatePartitions(spark, numStatePartitions) {
      val q = langProfile(stream, id, text)
        .writeStream
        .format("memory")
        .queryName(sinkName)
        .outputMode(OutputMode.Complete())
        .start()
      q.processAllAvailable()
      q.stop()
    }
    spark.table(sinkName)
  }
}
