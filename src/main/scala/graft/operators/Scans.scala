package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scans (running aggregations over key order) without the single-task trap.
  *
  * Reference semantics: `hl.scan.*` — running agg over key order, lowered as
  * two-phase per-partition partial states + prefix combine
  * (`expr/ir/lowering/LowerTableIR.scala:1284-1360`).
  *
  * A naive Spark `Window.orderBy(key)` with no `partitionBy` funnels ALL rows
  * through one task — fatal at 100 TB. This library op keeps the reference's
  * two-phase plan but stays in ONE lazy Catalyst DAG:
  *
  *   1. range-partition + sort by the scan order (one exchange);
  *   2. per-partition partial states via `spark_partition_id` group-agg
  *      (tiny: one row per partition);
  *   3. exclusive prefix-combine of the partials with a window over the
  *      partition ids (single task over numPartitions rows — O(parts));
  *   4. broadcast-join the offsets back and run the within-partition window
  *      `Window.partitionBy(partition_id).orderBy(key)` — fully parallel.
  *
  * The sorted subtree appears twice in the plan (main pass + partials), but
  * both sides share one identical range-repartition exchange, which Spark's
  * `ReuseExchange` rule computes once — so this costs a single shuffle, no
  * `persist` (the round-1 version persisted and leaked), and no extra
  * driver actions.
  *
  * The framework is generic over any *mergeable* aggregate: callers supply
  * the partial/window aggregate function and the combine of
  * (previous-partitions offset, within-partition running value) —
  * mirroring the reference's seqOp/combOp aggregator contract.
  */
object Scans {

  /** Generic two-phase scan. Adds `outName` = combine(offset, running) where
    * `running` = aggFn over the within-partition prefix window and `offset`
    * = aggFn of all prior partitions' partials prefix-combined.
    *
    * @param aggFn   mergeable aggregate (e.g. `sum`, `min`, `max`,
    *                `last(_, ignoreNulls = true)`) applied both per-partition
    *                and over window frames
    * @param combine merges the cross-partition offset with the
    *                within-partition running value (e.g. `_ + _` for sum,
    *                `least` for min, `(o, r) => coalesce(r, o)` for
    *                prev-non-null)
    * @param inclusive false = reference scan semantics (current row excluded)
    */
  def runningAgg(df: DataFrame, orderCols: Seq[String], value: Column,
      aggFn: Column => Column, combine: (Column, Column) => Column,
      outName: String, inclusive: Boolean = true): DataFrame = {
    val ord = orderCols.map(c => col(c).asc_nulls_last)
    val sorted = df
      .repartitionByRange(ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
    val partials = sorted.groupBy(col("__pid")).agg(aggFn(col("__v")).as("__s"))
    // exclusive prefix-combine over the (tiny) partials: one task, O(parts)
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = partials
      .withColumn("__off", aggFn(col("__s")).over(wOff))
      .select(col("__pid"), col("__off"))
    val frameEnd: Long = if (inclusive) Window.currentRow else -1L
    val w = Window.partitionBy(col("__pid")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    sorted
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(outName, combine(col("__off"), aggFn(col("__v")).over(w)))
      .drop("__pid", "__v", "__off")
  }

  /** Running sum of `value` over ascending `orderCols`; adds column `outName`.
    * `inclusive=false` gives the reference's scan semantics (excludes the
    * current row). */
  def runningSum(df: DataFrame, orderCols: Seq[String], value: Column,
      outName: String, inclusive: Boolean = true): DataFrame =
    runningAgg(df, orderCols, value.cast("double"), sum,
      (off, run) => coalesce(off, lit(0.0)) + coalesce(run, lit(0.0)),
      outName, inclusive)

  /** Running count over key order (1-based when inclusive). */
  def runningCount(df: DataFrame, orderCols: Seq[String], outName: String,
      inclusive: Boolean = true): DataFrame =
    runningAgg(df, orderCols, lit(1L), sum,
      (off, run) => coalesce(off, lit(0L)) + coalesce(run, lit(0L)),
      outName, inclusive)

  /** Running min / max over key order. */
  def runningMin(df: DataFrame, orderCols: Seq[String], value: Column,
      outName: String, inclusive: Boolean = true): DataFrame =
    runningAgg(df, orderCols, value, min, least(_, _), outName, inclusive)

  def runningMax(df: DataFrame, orderCols: Seq[String], value: Column,
      outName: String, inclusive: Boolean = true): DataFrame =
    runningAgg(df, orderCols, value, max, greatest(_, _), outName, inclusive)

  /** `hl.scan.prev_nonnull` (reference `agg/PrevNonNullAggregator.scala`):
    * the most recent non-null value strictly before the current row in key
    * order. The "densify" building block. */
  def prevNonNull(df: DataFrame, orderCols: Seq[String], value: Column,
      outName: String): DataFrame =
    runningAgg(df, orderCols, value, c => last(c, ignoreNulls = true),
      (off, run) => coalesce(run, off), outName, inclusive = false)

  /** Densify: carry the last non-null value forward INTO null cells of
    * `field` (current row's value wins when present — reference
    * `agg/DensifyAggregator.scala` scan semantics). */
  def densify(df: DataFrame, orderCols: Seq[String], field: String)
      : DataFrame =
    runningAgg(df, orderCols, col(field), c => last(c, ignoreNulls = true),
      (off, run) => coalesce(run, off), field, inclusive = true)
}
