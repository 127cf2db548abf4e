package graft

import org.apache.spark.sql.functions._
import graft.operators.Aggs

/** Misra-Gries frequent-items summary: the mergeable-summaries
  * guarantee under adversarial partitionings, capacity bounds, and the
  * exact two-pass consumer's determinism. */
class HeavyHittersSpec extends SparkSpec {

  // skewed multiset: key "hh_i" appears (200 - 12*i) times for i<8
  // (heavy), plus 400 singletons
  private def skewed = {
    val rows = (0 until 8).flatMap(i =>
      Seq.fill(200 - 12 * i)(s"hh_$i")) ++
      (0 until 400).map(i => s"tail_$i")
    rows.zipWithIndex.map { case (k, i) => (i.toLong, k) }
  }

  test("MG guarantee: keys above N/(m+1) survive any partitioning") {
    val data = skewed
    val n = data.size
    val exact = data.groupBy(_._2).view.mapValues(_.size).toMap
    val m = 16
    (1 to 4).foreach { seed =>
      val shuffled = new scala.util.Random(seed).shuffle(data)
      val df = spark.createDataFrame(shuffled).toDF("id", "key")
        .repartition(seed * 3) // vary merge structure too
      val cand = df.agg(udaf(Aggs.misraGriesAgg(m)).apply(col("key")))
        .head.getSeq[String](0)
      assert(cand.size <= m, s"summary exceeded capacity: ${cand.size}")
      val guaranteed = exact.collect {
        case (k, c) if c.toLong * (m + 1) > n => k
      }.toSet
      assert(guaranteed.nonEmpty, "fixture has no guaranteed keys — weak")
      assert(guaranteed.subsetOf(cand.toSet),
        s"seed $seed dropped guaranteed keys: ${guaranteed -- cand.toSet}")
    }
  }

  test("heavyHittersExact: deterministic, equals exact groupBy threshold") {
    val data = skewed
    val n = data.size
    val exact = data.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val m = 16
    val want = exact.collect {
      case (k, c) if c * m > n => (k, c)
    }.toSet
    assert(want.nonEmpty, "fixture yields no heavy hitters — weak test")
    (1 to 3).foreach { parts =>
      val df = spark.createDataFrame(
        new scala.util.Random(parts).shuffle(data)).toDF("id", "key")
        .repartition(parts * 5)
      val got = Aggs.heavyHittersExact(df, "key", m)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === want, s"parts=${parts * 5}")
    }
  }

  test("MG is exact below capacity; nulls ignored") {
    val df = spark.createDataFrame(Seq(
      (1L, "a"), (2L, "a"), (3L, "b"), (4L, null.asInstanceOf[String])))
      .toDF("id", "key")
    val cand = df.agg(udaf(Aggs.misraGriesAgg(8)).apply(col("key")))
      .head.getSeq[String](0)
    assert(cand.toSet === Set("a", "b"))
    // two keys, capacity 2: both survive (n=3, both > n/3=1 only "a"
    // is guaranteed, but nothing was ever evicted)
    val tight = df.agg(udaf(Aggs.misraGriesAgg(2)).apply(col("key")))
      .head.getSeq[String](0)
    assert(tight.contains("a"))
  }
}
