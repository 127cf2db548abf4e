package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delivery exports for training pipelines: the corpus leaves the
  * engine as JSONL shards (the interchange format trainers read),
  * sharded DETERMINISTICALLY so a re-export is byte-stable and any
  * engine can re-derive which shard holds a document. */
object Export {

  /** Stable shard id in [0, numShards): md5 bucket of (salt, id) —
    * same engine-portable membership contract as `Sampling`. */
  def shardOf(id: Column, numShards: Int, salt: String = "shard")
      : Column =
    pmod(conv(substring(md5(concat(lit(salt), lit("|"),
      id.cast("string"))), 1, 15), 16, 10).cast("long"),
      lit(numShards.toLong))

  /** Project rows to (shard, line): `line` is the compact JSON of the
    * given columns IN ORDER (field order and float-free payloads keep
    * the bytes engine-reproducible). */
  def jsonlLines(df: DataFrame, id: String, cols: Seq[String],
      numShards: Int, salt: String = "shard"): DataFrame =
    df.select(shardOf(col(id), numShards, salt).as("shard"),
      to_json(struct(cols.map(col): _*)).as("line"))

  /** Write the corpus as one directory of JSONL text files partitioned
    * by shard (shard=NN/part-*.txt). The shard column rides Spark's
    * `partitionBy`, so each shard's lines land in its own directory and
    * a trainer streams shards independently; `repartition` on the shard
    * key bounds output files to one per shard per final task wave. */
  def writeJsonlShards(df: DataFrame, id: String, cols: Seq[String],
      path: String, numShards: Int, salt: String = "shard"): Unit =
    jsonlLines(df, id, cols, numShards, salt)
      .repartition(col("shard"))
      .write.partitionBy("shard").text(path)

  /** Read shards back as (shard, line) — the verification surface. */
  def readJsonlShards(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.text(path)
      .withColumn("shard",
        regexp_extract(input_file_name(), "shard=(\\d+)", 1)
          .cast("long"))
      .select(col("shard"), col("value").as("line"))
}
