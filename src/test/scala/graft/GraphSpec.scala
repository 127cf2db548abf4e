package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Graph

/** PageRank over link graphs: hand-computed fixtures (symmetric cycle,
  * dangling-star), rank-mass conservation, multi-edge collapse, and
  * partitioning invariance. All fixtures are pinned in exact 1e-9
  * integer rank units (`rank_units` BIGINT) — the output contract has
  * no double anywhere, so these are bit-exact on any engine/stack. */
class GraphSpec extends SparkSpec {

  private def edges(rows: (Long, Long)*) =
    spark.createDataFrame(rows.toSeq).toDF("src", "dst")

  private def ranks(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two-node cycle is a fixed point at 0.5/0.5 (500M units each)") {
    val got = ranks(Graph.pageRank(edges(1L -> 2L, 2L -> 1L),
      "src", "dst", iters = 3))
    assert(got === Map(1L -> 500000000L, 2L -> 500000000L))
  }

  test("dangling star, one sweep: hand-computed unit ranks") {
    // a->b, c->b; b dangles. r0 = 1e9 // 3 = 333333333 units each.
    // base       = (15 * 1e9) // 300                    =  50000000
    // dang term  = (85 * 333333333) // 300              =  94444444
    // r1(a) = r1(c) = 50000000 + 0 + 94444444           = 144444444
    // in_sum(b)  = 333333333 + 333333333 = 666666666
    // r1(b) = 50000000 + (85*666666666)//100 + 94444444 = 711111110
    val got = ranks(Graph.pageRank(edges(1L -> 2L, 3L -> 2L),
      "src", "dst", iters = 1))
    assert(got === Map(1L -> 144444444L, 2L -> 711111110L,
      3L -> 144444444L))
  }

  test("rank mass stays ~1e9 units with dangling redistribution; multi-edges collapse") {
    val r = new scala.util.Random(11)
    val es = (1 to 300).map(_ => (r.nextInt(40).toLong, r.nextInt(40).toLong))
    // duplicate every edge: collapse must make this a no-op
    val df = edges((es ++ es): _*)
    val pr = Graph.pageRank(df, "src", "dst", iters = 3)
    val total = pr.agg(sum(col("rank_units"))).head.getLong(0)
    // truncating integer units only ever LOSE mass: monotone drift,
    // bounded by a few units per node per sweep + outdeg-1 per source
    assert(total <= 1000000000L && total > 1000000000L - 10000L,
      s"rank unit mass $total")
    val single = ranks(Graph.pageRank(edges(es: _*), "src", "dst", iters = 3))
    assert(ranks(pr) === single)
  }

  test("non-whole-percent damping is rejected (integer-unit contract)") {
    val e = edges(1L -> 2L, 2L -> 1L)
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", iters = 1, damping = 0.855)
    }
  }

  test("integer units make ranks partitioning-invariant") {
    val r = new scala.util.Random(7)
    val es = (1 to 500).map(_ => (r.nextInt(60).toLong, r.nextInt(60).toLong))
    val a = ranks(Graph.pageRank(edges(es: _*).repartition(1),
      "src", "dst", iters = 2))
    val b = ranks(Graph.pageRank(edges(es: _*).repartition(17),
      "src", "dst", iters = 2))
    assert(a === b)
  }
}
