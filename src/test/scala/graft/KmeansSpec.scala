package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

class KmeansSpec extends SparkSpec {

  test("kmeansLloydExact separates well-separated blobs, deterministically") {
    val r = new scala.util.Random(5)
    def blob(center: Double, n: Int, from: Int) =
      (0 until n).map(i => ((from + i).toLong,
        Seq.fill(8)((center + r.nextGaussian() * 0.1).toFloat)))
    // the k=2 lowest-id init takes ids 0 and 1 — BOTH inside blob A —
    // so separation must come from Lloyd iterations, not a lucky seed
    val rows = (blob(-3.0, 40, 0) ++ blob(3.0, 40, 1000))
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val out = Similarity.kmeansLloydExact(df, "vec_id", "embedding",
      k = 2, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val lowClusters = (0L until 40L).map(out).toSet
    val highClusters = (1000L until 1040L).map(out).toSet
    assert(lowClusters.size === 1, s"blob A split: $lowClusters")
    assert(highClusters.size === 1, s"blob B split: $highClusters")
    assert(lowClusters != highClusters, "blobs merged")
    // determinism: a second run yields identical assignments
    val again = Similarity.kmeansLloydExact(df, "vec_id", "embedding",
      k = 2, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(again === out)
  }

  test("kmeansLloydExact: empty clusters keep their previous state") {
    // k = 3 over 3 identical vectors: clusters 1 and 2 go empty after
    // the first assignment (all points tie to cluster 0) and must not
    // crash or corrupt the state
    val df = spark.createDataFrame(Seq(
      (0L, Seq(1.0f, 1.0f)), (1L, Seq(1.0f, 1.0f)),
      (2L, Seq(1.0f, 1.0f)))).toDF("vec_id", "embedding")
    val out = Similarity.kmeansLloydExact(df, "vec_id", "embedding",
      k = 3, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // identical points tie-break to the lowest cluster index
    assert(out.values.toSet === Set(0L))
  }
}
