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
}
