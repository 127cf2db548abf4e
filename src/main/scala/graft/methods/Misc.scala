package graft.methods

import org.apache.spark.sql.DataFrame

/** Misc graph/utility methods (reference `python/hail/methods/misc.py:16`
  * `maximal_independent_set`, IR node `ArrayMaximalIndependentSet` —
  * which is also driver-local in the reference). */
object Misc {

  /** Greedy maximal independent set over an edge list: repeatedly remove
    * the highest-degree vertex until no edges remain; surviving vertices
    * form the kept set. Deterministic: ties broken by vertex ordering.
    * The edge set (e.g. related sample pairs above a kinship threshold)
    * is collected to the driver — edges are few by construction in its
    * use cases (the reference does exactly this, `misc.py:16`).
    * `edges` needs columns (i, j). Returns kept vertex ids. */
  def maximalIndependentSet(edges: DataFrame, iCol: String = "i",
      jCol: String = "j"): Set[String] =
    maximalIndependentSetLocal(edges.select(iCol, jCol).collect()
      .map(r => (r.get(0).toString, r.get(1).toString)).toSeq)

  /** Driver-local MIS over an already-collected edge list — callers that
    * also need the edge list itself (e.g. `ldPruneGlobal`) collect once
    * and share. */
  def maximalIndependentSetLocal(es: Seq[(String, String)]): Set[String] = {
    val adj = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Set[String]]
    es.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val removed = scala.collection.mutable.Set.empty[String]
    def degree(v: String): Int = adj(v).count(!removed.contains(_))
    var live = adj.keys.toSeq
    var continue = true
    while (continue) {
      val candidates = live.filterNot(removed.contains)
        .filter(degree(_) > 0)
      if (candidates.isEmpty) continue = false
      else {
        // max degree, ties by id for determinism
        val victim = candidates.maxBy(v => (degree(v), v))
        removed += victim
      }
    }
    adj.keySet.toSet -- removed
  }

  /** segment_intervals (reference `misc.py:425`): split a table's
    * interval key at a sorted set of points. Each interval whose span
    * strictly contains points becomes [start, p_lower), [p_x, p_x+1)
    * ..., [p_higher-1, end] sub-intervals (bounds' inclusivity follows
    * the reference exactly: the cut edges are [inclusive, exclusive)).
    *
    * Spark shape: the points are a broadcast literal (driver-sized by
    * contract — the reference also localizes them into a global), the
    * per-row segmentation is one codegen'd expression, then an explode.
    * No shuffle. `intervalField` must be an `Intervals.interval` struct
    * column. */
  def segmentIntervals(t: graft.Table, points: Seq[Any],
      intervalField: String = "interval"): graft.Table = {
    import org.apache.spark.sql.functions._
    import graft.functions.{Intervals, Sets}
    val ptsSorted = array_sort(array(points.distinct.map(lit): _*))
    val iv = col(intervalField)
    val n = size(ptsSorted)
    // 0-based, total under ANSI (guarded branches may still evaluate)
    def at(i: org.apache.spark.sql.Column) =
      try_element_at(ptsSorted, i + 1)
    val lower0 = Sets.lowerBound(ptsSorted, iv("start"))
    val lowerE = when(lower0 < n && at(lower0) === iv("start"), lower0 + 1)
      .otherwise(lower0)
    val higher0 = Sets.lowerBound(ptsSorted, iv("end"))
    val higherE = when(higher0 < n && at(higher0) === iv("end"), higher0 - 1)
      .otherwise(higher0)
    // stage the two bound searches as columns: they are referenced many
    // times inside the segment expression, and inlined copies would
    // re-scan the point array per reference per row
    val lower = col("__seg_lo")
    val higher = col("__seg_hi")
    // ascending-safe sequence (memory: sequence(a, b) with b < a
    // DESCENDS in Spark), null-marked extras filtered out
    val middle = filter(
      transform(sequence(lower, greatest(higher - 2, lower)), x =>
        when(x <= higher - 2,
          Intervals.interval(at(x), at(x + 1), lit(true), lit(false)))),
      s => s.isNotNull)
    val segs = when(lower >= higher, array(iv)).otherwise(concat(
      array(Intervals.interval(iv("start"), at(lower),
        iv("includes_start"), lit(false))),
      middle,
      array(Intervals.interval(at(higher - 1), iv("end"),
        lit(true), iv("includes_end")))))
    // explode_outer, NOT explode: segmentation always yields >= 1
    // sub-interval, and an inner explode makes Catalyst infer a
    // `size(segs) > 0` filter that — referencing only grouping keys —
    // can be pushed below an upstream aggregate and evaluate the whole
    // segmentation expression once per SOURCE row (measured 45 s on a
    // 1.5M-row source for a 50-interval table) instead of per interval
    graft.Table(
      t.df.withColumn("__seg_lo", lowerE)
        .withColumn("__seg_hi", higherE)
        .withColumn(intervalField, explode_outer(segs))
        .drop("__seg_lo", "__seg_hi"),
      t.key, t.globals)
  }
}
