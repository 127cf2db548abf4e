package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (pandas `merge_asof`, kdb+ `aj`, DuckDB `ASOF JOIN`):
  * for every left row, the single closest right row in time within the
  * same key group — the standard event-to-state enrichment (price as
  * of a trade, last config change as of a request, last purchase as of
  * a click). All three pandas directions are supported: `backward`
  * (right time at-or-before left), `forward` (at-or-after), `nearest`
  * (closer of the two, ties to backward), each with an
  * `allowExactMatches = false` strict-inequality variant.
  *
  * Spark has no native as-of join; the naive formulations are a range
  * join (quadratic blow-up per key) or a per-row probe. This is the
  * UNION-AND-CARRY plan instead: tag both sides, sort each key group
  * by (time, side) with the match-eligible right rows ordered before
  * the left row, and carry the right row's payload with
  * last(ignoreNulls) over the running window — ONE shuffle on the join
  * keys (user-shaped, uniform at scale), a linear scan within each
  * group, no range join, no per-key quadratic work. `forward` is the
  * same scan with time order reversed; `nearest` runs both carries
  * over the SAME exchange (two sorts, still one shuffle — verified by
  * the plan audit). The window partitions by the join keys, never
  * globally.
  *
  * Null times: right rows with a null time are dropped before the
  * union (merge_asof-style implementations reject null keys/times;
  * carrying one would make it look "earlier than everything" and match
  * every left row). Left rows with a null time are kept with a null
  * payload — the window orders nulls first in both scan directions, so
  * they deterministically see no right row. */
object AsOfJoin {

  /** Backward as-of join. Every `left` row keeps all its columns and
    * gains `payload` columns from the matched `right` row (null when
    * no right row precedes it, or the match is older than
    * `toleranceNs`). Both time columns must be LONG (caller normalizes
    * — e.g. `streaming.Events.tsNanos`). Right-side ties at the same
    * (keys, time) resolve to the largest `tieBreak` tuple, so the
    * result is total-order deterministic. `allowExactMatches = false`
    * requires right time strictly before left time. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      toleranceNs: Option[Long] = None,
      tieBreak: Seq[String] = Nil,
      allowExactMatches: Boolean = true): DataFrame =
    joined(left, right, keys, leftTime, rightTime, payload,
      toleranceNs, tieBreak, allowExactMatches, direction = "backward")

  /** Forward as-of join: the single EARLIEST right row whose time is
    * at-or-after (strictly after when `allowExactMatches = false`) the
    * left row's time, within `toleranceNs` when given. Same
    * union-and-carry shape as [[backward]] with the time scan
    * reversed; ties at equal (keys, time) resolve to the largest
    * `tieBreak` tuple. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      toleranceNs: Option[Long] = None,
      tieBreak: Seq[String] = Nil,
      allowExactMatches: Boolean = true): DataFrame =
    joined(left, right, keys, leftTime, rightTime, payload,
      toleranceNs, tieBreak, allowExactMatches, direction = "forward")

  /** Nearest as-of join: whichever of the backward / forward matches
    * is closer in absolute time (each subject to `toleranceNs`); equal
    * distances resolve to the backward match, pandas-style. Both
    * carries run over the same key exchange — one shuffle, two sorts. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      toleranceNs: Option[Long] = None,
      tieBreak: Seq[String] = Nil,
      allowExactMatches: Boolean = true): DataFrame =
    joined(left, right, keys, leftTime, rightTime, payload,
      toleranceNs, tieBreak, allowExactMatches, direction = "nearest")

  private def joined(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      payload: Seq[String], toleranceNs: Option[Long],
      tieBreak: Seq[String], allowExactMatches: Boolean,
      direction: String): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key")
    val leftCols = left.columns.toSeq
    // one unioned stream; right rows with null time rejected up front
    val rTagged = right.filter(col(rightTime).isNotNull).select(
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

    // scan ordering: match-eligible right rows sort BEFORE the left
    // row they may match. At equal (keys, time): right-first when
    // exact matches are allowed, left-first when strict. Right ties at
    // equal (keys, time): the LAST in tieBreak order wins under
    // last(ignoreNulls) — deterministic by construction. Null left
    // times order first in both directions (no match by design).
    def scanWindow(fwd: Boolean) = {
      val t = if (fwd) col("__t").desc_nulls_first
              else col("__t").asc_nulls_first
      val side = if (allowExactMatches) col("__side").asc
                 else col("__side").desc
      Window.partitionBy(keys.map(col): _*)
        .orderBy((t +: side +: tieBreak.indices.map(i =>
          col("__rpay")(s"__tb$i").asc_nulls_first)): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    // tolerance + strictness gate on the carried match, per direction
    def gated(m: Column, fwd: Boolean): Column = {
      val dist = if (fwd) m("__rt") - col("__t")
                 else col("__t") - m("__rt")
      val strictOk = if (allowExactMatches) lit(true) else dist > 0
      val tolOk = toleranceNs.map(tol => dist <= tol).getOrElse(lit(true))
      when(m.isNotNull && strictOk && tolOk, m).otherwise(lit(null))
    }

    val matched = direction match {
      case "backward" =>
        unioned.withColumn("__mm", gated(
          last(col("__rpay"), ignoreNulls = true).over(scanWindow(false)),
          fwd = false))
      case "forward" =>
        unioned.withColumn("__mm", gated(
          last(col("__rpay"), ignoreNulls = true).over(scanWindow(true)),
          fwd = true))
      case "nearest" =>
        // both carries partition on the same keys: ReuseExchange keeps
        // this at one shuffle (plan-audited); tie → backward
        unioned
          .withColumn("__mb", gated(last(col("__rpay"),
            ignoreNulls = true).over(scanWindow(false)), fwd = false))
          .withColumn("__mf", gated(last(col("__rpay"),
            ignoreNulls = true).over(scanWindow(true)), fwd = true))
          .withColumn("__mm",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              .when(col("__t") - col("__mb")("__rt") <=
                col("__mf")("__rt") - col("__t"), col("__mb"))
              .otherwise(col("__mf")))
      case other => throw new IllegalArgumentException(
        s"unknown as-of direction: $other")
    }
    matched
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        payload.map(p => col("__mm")(p).as(p)): _*)
  }
}
