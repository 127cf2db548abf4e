package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph operators for crawl curation — the domain-authority
  * prior (PageRank over the host/domain link graph) that web-corpus
  * pipelines use as a quality signal alongside content filters.
  *
  * Determinism contract (the property every gate here needs): ranks
  * are DECIMAL(18,9) end-to-end. Each edge contribution is computed in
  * double, rounded to 9dp, and cast back — so the per-destination SUM
  * is exact decimal arithmetic, independent of Spark's aggregation
  * order, and a SQL engine replays it bit-for-bit (the same pattern as
  * the BM25 gate's DECIMAL(18,4) term sums). */
object Graph {

  private val RankType = "decimal(18,9)"

  /** Power-iteration PageRank with a fixed iteration count (web-scale
    * practice runs a fixed small number of sweeps, not to convergence).
    * Multi-edges collapse to simple edges; self-loops are kept if
    * present in `edges` (filter upstream if unwanted). Dangling mass
    * (nodes with no out-edges) is redistributed uniformly each sweep,
    * so total rank stays ~1.
    *
    * Scale shape per iteration: one equi-join of edges to the rank
    * vector on src (shuffle on node key), one groupBy(dst) partial-agg
    * sum, one broadcast of the two scalars (node count, dangling
    * mass). Iterations chain lineage linearly — for iters beyond ~10
    * checkpoint the rank vector; at 3 (the crawl-prior setting) the
    * static plan is fine. */
  def pageRank(edgesRaw: DataFrame, src: String, dst: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val edges = edgesRaw.select(col(src).as("src"), col(dst).as("dst"))
      .distinct()
      // consumed every sweep (join + outdeg) and for the node set:
      // materialize the dedup once, disk-backed
      .localCheckpoint(false)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    val outdeg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    // scalar node count, kept relational (broadcast 1-row frame)
    val nC = nodes.agg(count(lit(1)).as("n_nodes"))

    val init = nodes.crossJoin(broadcast(nC))
      .select(col("node"),
        round(lit(1.0) / col("n_nodes"), 9).cast(RankType).as("rank"))

    (1 to iters).foldLeft(init) { (ranks, _) =>
      val withDeg = ranks.join(outdeg, Seq("node"), "left")
      // dangling mass: ranks of nodes with no out-edges (exact decimal
      // sum -> deterministic), redistributed uniformly
      val dangling = withDeg.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0).cast(RankType))
          .as("dangling"))
      val contribs = edges
        .join(withDeg.filter(col("outdeg").isNotNull)
          .withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          round(col("rank").cast("double") / col("outdeg"), 9)
            .cast(RankType).as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("in_sum"))
      nodes.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(nC.crossJoin(dangling)))
        .select(col("node"),
          round(
            (lit(1.0) - damping) / col("n_nodes") +
              lit(damping) * (coalesce(col("in_sum"),
                lit(0).cast(RankType)).cast("double") +
                col("dangling").cast("double") / col("n_nodes")), 9)
            .cast(RankType).as("rank"))
    }
  }
}
