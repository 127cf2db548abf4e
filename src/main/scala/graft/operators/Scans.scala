package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scans (running aggregations over key order) without the single-task trap.
  *
  * Reference semantics: `hl.scan.*` — running agg over key order, lowered as
  * two-phase per-partition partial states + driver prefix combine
  * (`expr/ir/lowering/LowerTableIR.scala:1284-1360`).
  *
  * A naive Spark `Window.orderBy(key)` with no `partitionBy` funnels ALL rows
  * through one task — fatal at 100 TB. This library op keeps the reference's
  * two-phase plan but stays in DataFrame land:
  *
  *   1. range-partition + sort by the scan order (one exchange, reusable);
  *   2. per-partition partial totals via `spark_partition_id` group-agg
  *      (tiny: one row per partition, collected to the driver);
  *   3. exclusive prefix-combine on the driver (numPartitions values);
  *   4. map the offsets back and run the within-partition window
  *      `Window.partitionBy(partition_id).orderBy(key)` — fully parallel.
  *
  * The sorted frame is persisted between (2) and (4) so partition ids are
  * stable. At cluster scale this is two narrow passes over sorted data plus
  * one O(numPartitions) driver step — the same cost model as the reference.
  */
object Scans {

  /** Running sum of `value` over ascending `orderCols`; adds column `outName`.
    * `inclusive=false` gives the reference's scan semantics (excludes the
    * current row). */
  def runningSum(df: DataFrame, orderCols: Seq[String], value: Column,
      outName: String, inclusive: Boolean = true): DataFrame = {
    val ord = orderCols.map(c => col(c).asc_nulls_last)
    val sorted = df
      .repartitionByRange(ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast("double"))
      .persist()
    sorted.count() // materialize so __pid is stable across the two passes
    val partials = sorted.groupBy("__pid")
      .agg(sum(col("__v")).as("s")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
      .toMap
    val nParts = if (partials.isEmpty) 0 else partials.keys.max + 1
    val prefix = new Array[Double](nParts + 1)
    (0 until nParts).foreach(i =>
      prefix(i + 1) = prefix(i) + partials.getOrElse(i, 0.0))
    // broadcast-join the per-partition offsets (tiny) rather than building a
    // nParts-deep CASE expression — stays O(1) per row at any partition count
    val offsets = df.sparkSession
      .createDataFrame((0 until nParts).map(i => (i, prefix(i))))
      .toDF("__pid", "__off")
    val frameEnd: Long = if (inclusive) Window.currentRow else -1L
    val w = Window.partitionBy(col("__pid")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    sorted
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(outName,
        coalesce(sum(col("__v")).over(w), lit(0.0)) + col("__off"))
      .drop("__pid", "__v", "__off")
  }

  /** Running count over key order (1-based when inclusive). */
  def runningCount(df: DataFrame, orderCols: Seq[String], outName: String,
      inclusive: Boolean = true): DataFrame =
    runningSum(df, orderCols, lit(1L), outName, inclusive)
}
