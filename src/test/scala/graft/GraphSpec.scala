package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Graph

/** PageRank over link graphs: hand-computed fixtures (symmetric cycle,
  * dangling-star), rank-mass conservation, multi-edge collapse, and
  * partitioning invariance of the decimal-sum contract. */
class GraphSpec extends SparkSpec {

  private def edges(rows: (Long, Long)*) =
    spark.createDataFrame(rows.toSeq).toDF("src", "dst")

  private def ranks(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => r.getLong(0) -> r.getDecimal(1).toPlainString).toMap

  test("two-node cycle is a fixed point at 0.5/0.5") {
    val got = ranks(Graph.pageRank(edges(1L -> 2L, 2L -> 1L),
      "src", "dst", iters = 3))
    assert(got === Map(1L -> "0.500000000", 2L -> "0.500000000"))
  }

  test("dangling star, one sweep: hand-computed ranks") {
    // a->b, c->b; b dangles. r0 = 1/3 each (0.333333333 at 9dp).
    // r1(a) = r1(c) = 0.05 + 0.85*(0 + 0.333333333/3)   = 0.144444444
    // r1(b) = 0.05 + 0.85*(0.666666666 + 0.111111111)   = 0.711111110
    val got = ranks(Graph.pageRank(edges(1L -> 2L, 3L -> 2L),
      "src", "dst", iters = 1))
    assert(got === Map(1L -> "0.144444444", 2L -> "0.711111110",
      3L -> "0.144444444"))
  }

  test("rank mass stays ~1 with dangling redistribution; multi-edges collapse") {
    val r = new scala.util.Random(11)
    val es = (1 to 300).map(_ => (r.nextInt(40).toLong, r.nextInt(40).toLong))
    // duplicate every edge: collapse must make this a no-op
    val df = edges((es ++ es): _*)
    val pr = Graph.pageRank(df, "src", "dst", iters = 3)
    val total = pr.agg(sum(col("rank"))).head.getDecimal(0).doubleValue()
    // truncating integer units only ever LOSE mass: monotone drift,
    // bounded by a few units per node per sweep + outdeg-1 per source
    assert(total <= 1.0 + 1e-12 && total > 1.0 - 1e-5, s"rank mass $total")
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
