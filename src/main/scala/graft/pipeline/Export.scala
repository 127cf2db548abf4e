package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delivery exports for training pipelines: the corpus leaves the
  * engine as JSONL shards (the interchange format trainers read),
  * sharded DETERMINISTICALLY so a re-export is byte-stable and any
  * engine can re-derive which shard holds a document. */
object Export {

  /** Stable shard id in [0, numShards): `Sampling.unitHash`'s md5
    * bucket — one definition of the engine-portable membership
    * contract, shared with the sampling/split family. */
  def shardOf(id: Column, numShards: Int, salt: String = "shard")
      : Column =
    pmod(Sampling.unitHash(id, salt), lit(numShards.toLong))

  /** Project rows to (shard, line): `line` is the compact JSON of the
    * given columns IN ORDER. Null fields are EMITTED ("k":null) — the
    * SQL to_json convention — so the line bytes stay
    * engine-reproducible on nullable payloads (Spark's default silently
    * drops null fields). Float-free payloads recommended for byte
    * stability. */
  def jsonlLines(df: DataFrame, id: String, cols: Seq[String],
      numShards: Int, salt: String = "shard"): DataFrame =
    df.select(shardOf(col(id), numShards, salt).as("shard"),
      to_json(struct(cols.map(col): _*),
        Map("ignoreNullFields" -> "false")).as("line"))

  /** Write the corpus as one directory of JSONL text files partitioned
    * by shard (shard=NN/part-*.txt). The shard column rides Spark's
    * `partitionBy`, so each shard's lines land in its own directory and
    * a trainer streams shards independently; `repartition` on the shard
    * key bounds output files to one per shard per final task wave. */
  def writeJsonlShards(df: DataFrame, id: String, cols: Seq[String],
      path: String, numShards: Int, salt: String = "shard"): Unit =
    jsonlLines(df, id, cols, numShards, salt)
      .repartition(col("shard"))
      // overwrite: an export REPLACES the delivery at its path, so
      // repeated runs (bench iterations, re-exports) stay bounded on
      // disk instead of accreting temp copies
      .write.mode("overwrite").partitionBy("shard").text(path)

  /** Read shards back as (shard, line) — the verification surface.
    * The shard id comes from Spark's own partition discovery of the
    * shard=NN directories (no second filename-parsing path). */
  def readJsonlShards(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.text(path)
      .select(col("shard").cast("long").as("shard"),
        col("value").as("line"))
}
