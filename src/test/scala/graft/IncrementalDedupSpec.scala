package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Incremental ingest dedup against a frozen hash index: semantics
  * (index collision drop, batch self-dedup, delta composition) and the
  * bucketed-index plan shape (the index side joins with no shuffle). */
class IncrementalDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(rows.toSeq).toDF("doc_id", "text")

  test("batch rows colliding with the index drop; batch self-dedups keep-min") {
    val frozen = docs(1L -> "alpha", 2L -> "beta")
    val idx = Dedup.hashIndex(frozen, "doc_id", "text")
    assert(idx.count() === 2)
    val batch = docs(
      10L -> "alpha",  // collides with frozen corpus -> dropped
      11L -> "gamma",  // new
      12L -> "gamma",  // batch-internal dup -> loses to 11
      13L -> "delta")  // new
    val survivors = Dedup.dedupIncremental(batch, "doc_id", "text", idx)
    assert(survivors.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(11L, 13L))
    // delta composition: appending hashIndex(survivors) makes a rerun
    // of the SAME batch drop everything
    val idx2 = idx.unionByName(
      Dedup.hashIndex(survivors, "doc_id", "text"))
    assert(Dedup.dedupIncremental(batch, "doc_id", "text", idx2)
      .count() === 0)
  }

  test("bucketed hash index: ingest anti-join shuffles only the batch side") {
    spark.sql("DROP TABLE IF EXISTS __graft_hash_idx_test")
    // a fresh session's in-memory catalog doesn't know a prior run's
    // table, so DROP can't clear its warehouse directory — remove it
    // directly or the CTAS fails with LOCATION_ALREADY_EXISTS
    val loc = new java.io.File(java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath,
      "__graft_hash_idx_test")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    if (loc.exists) rm(loc)
    val frozen = docs((1L to 200L).map(i => (i, s"frozen text $i")): _*)
    Dedup.hashIndex(frozen, "doc_id", "text")
      .write.bucketBy(8, "content_hash").sortBy("content_hash")
      .mode("overwrite").saveAsTable("__graft_hash_idx_test")
    val idx = spark.table("__graft_hash_idx_test")
    val batch = docs(
      (500L to 540L).map(i => (i, s"frozen text ${i % 20}")): _*)
    val survivors = Dedup.dedupIncremental(batch, "doc_id", "text", idx)
    val plan = survivors.queryExecution.executedPlan.toString
    // exactly the batch side may exchange for the join + window; the
    // bucketed index scan must feed the join with NO Exchange above it
    assert(plan.contains("__graft_hash_idx_test"), plan.take(3000))
    assert(plan.contains("Bucketed: true"), plan.take(3000))
    // the index-side subtree is a leaf scan: if Spark had inserted an
    // Exchange above it, the scan line would sit under one — count
    // exchanges: join(batch needs 1) + window(1); bucketed side adds 0
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"unexpected index-side shuffle:\n" +
      plan.take(3000))
    // semantics unchanged under bucketing: frozen texts are 1..200, the
    // batch repeats 'frozen text (i % 20)' — residues 1..19 collide
    // with the index, residue 0 ('frozen text 0') is genuinely new and
    // appears at ids 500/520/540; self-dedup keeps the min
    val got = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(500L))
  }
}
