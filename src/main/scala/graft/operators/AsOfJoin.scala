package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (pandas `merge_asof`, kdb+ `aj`, DuckDB `ASOF JOIN`):
  * for every left row, the single most recent right row whose time is
  * at-or-before the left row's time, within the same key group —
  * the standard event-to-state enrichment (price as of a trade,
  * last config change as of a request, last purchase as of a click).
  *
  * Spark has no native as-of join; the naive formulations are a range
  * join (quadratic blow-up per key) or a per-row probe. This is the
  * UNION-AND-CARRY plan instead: tag both sides, sort each key group
  * by (time, side) with the right side first at equal times, and
  * carry the right row's payload forward with last(ignoreNulls) over
  * the running window — ONE shuffle on the join keys (user-shaped,
  * uniform at scale), a linear scan within each group, no range join,
  * no per-key quadratic work. The window partitions by the join keys,
  * never globally. */
object AsOfJoin {

  /** Backward as-of join. Every `left` row keeps all its columns and
    * gains `payload` columns from the matched `right` row (null when
    * no right row precedes it, or the match is older than
    * `toleranceNs`). Both time columns must be LONG (caller normalizes
    * — e.g. `streaming.Events.tsNanos`). Right-side ties at the same
    * (keys, time) resolve to the largest `tieBreak` tuple, so the
    * result is total-order deterministic. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      toleranceNs: Option[Long] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key")
    val leftCols = left.columns.toSeq
    // one unioned stream: right rows first at equal times (side 0 < 1)
    val rTagged = right.select(
      (keys.map(col) :+ col(rightTime).cast("long").as("__t") :+
        lit(0).as("__side") :+
        // tiebreak fields namespaced: they may also appear in payload
        struct((col(rightTime).cast("long").as("__rt") +:
          tieBreak.zipWithIndex.map { case (c, i) =>
            col(c).as(s"__tb$i") }) ++
          payload.map(col): _*).as("__rpay")): _*)
    val lTagged = left.select(
      (keys.map(col) :+ col(leftTime).cast("long").as("__t") :+
        lit(1).as("__side") :+ lit(null).cast(rTagged.schema("__rpay")
          .dataType).as("__rpay")) ++
        leftCols.map(c => col(c).as(s"__l_$c")): _*)
    val unioned = rTagged
      .select((rTagged.columns.map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType)
          .as(s"__l_$c"))): _*)
      .unionByName(lTagged)
    // right ties at equal (keys, time): the LAST in tieBreak order
    // wins under last(ignoreNulls) — deterministic by construction
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col("__t").asc +: col("__side").asc +:
        tieBreak.indices.map(i =>
          col("__rpay")(s"__tb$i").asc_nulls_first)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val withinTol = toleranceNs match {
      case Some(tol) =>
        when(col("__m").isNotNull &&
          col("__t") - col("__m")("__rt") <= tol, col("__m"))
          .otherwise(lit(null))
      case None => col("__m")
    }
    matched
      .withColumn("__mm", withinTol)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        payload.map(p => col("__mm")(p).as(p)): _*)
  }
}
