package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Mirrors the reference's
  * benchmark harness discipline (`python/benchmark/hail/conftest.py`:
  * >=1 burn-in + >=3 timed iterations); per-query time is the median of the
  * timed iterations, so JVM/codegen warmup does not pollute the numbers,
  * and the iterations are fleet-interleaved so a transient host window
  * cannot own all of one query's samples.
  * A failing query fails the whole bench loudly — a benchmark that records
  * broken queries as fast is worse than one that crashes. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // streaming parity harnesses use implicit temp checkpoints; without
      // this they survive q.stop() and accrete across iterations
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation",
        "true")
      // Whole-stage-codegen class cache (static conf, default 100
      // entries): this fleet compiles a few THOUSAND distinct codegen
      // stages per pass, so by the time a query repeats, the LRU has
      // evicted its classes and every iteration re-janino-compiles the
      // whole fleet — measured 0.3-2 s of driver-serial compile per
      // heavy query per pass (ProfileQuery, r17). 10k entries holds one
      // fleet's worth of generated classes (~tens of KB each) — the
      // steady state any long-lived production driver re-running query
      // shapes reaches; scale-independent (compile cost does not grow
      // with data). Override: SPARK_GRAFT_CODEGEN_CACHE.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAILURE in query '$name': $e")
          throw e
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // localCheckpoint blocks accumulate across the ~250-query fleet
      // (every pair family materializes its fan-out point); at sf1 the
      // leftover storage filled the old gen and unrelated queries later
      // in the fleet spiked 10-30x over their isolated times. Dropping
      // persisted RDDs after each query is outside the timed section.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // under persistDisk this also empties Materialize's pin registry
      // (the clearCache below would drop the cache entries anyway, but
      // the registry would keep growing across the fleet)
      pipeline.Materialize.release(spark)
      spark.sharedState.cacheManager.clearCache()
      dt
    }
    // dev-loop filter: SPARK_GRAFT_BENCH_ONLY=q1,q2 times a subset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    queries.foreach { case (n, f) => runOnce(n, f) } // burn-in
    // Iterations are FLEET-INTERLEAVED (pass 1 runs every query, then
    // pass 2, ...), not per-query back-to-back: a transient host
    // slowdown then lands in at most ~one pass of each query's samples
    // and the per-query median rejects it. Back-to-back sampling put
    // all 3 samples of a query inside the same bad window — the r11
    // driver artifact carried 12-15x medians on untouched code from
    // exactly that mechanism.
    val passes = (1 to iters).map { _ =>
      queries.map { case (name, fn) => runOnce(name, fn) }
    }
    // keep the full spread, not just the median: streaming/shuffle
    // queries show >2x run-to-run variance across sessions, and a
    // median-only artifact hides it (r9 verdict, finding #2)
    val spreads = queries.zipWithIndex.map { case ((name, _), i) =>
      val times = passes.map(_(i)).sorted
      name -> ((times.head, times(times.length / 2), times.last))
    }
    val results = spreads.map { case (n, (_, med, _)) => n -> med }
    val total = results.map(_._2).sum
    // The one-line JSON contract: the harness captures only the tail of
    // stdout, so the line must stay well under 2000 chars. `value`/`n`
    // cover ALL queries; the per-query map is the headline subset (one
    // per operator family + every historically-expensive query), values
    // rounded to ms. The full map goes to stderr for human readers.
    val headline = Set(
      "table_join_inner", "table_order_by", "table_scan_sum",
      "table_aggregate_by_key", "table_filter", "table_distinct",
      "table_interval_join", "table_multi_way_zip_join", "query_table",
      "vcf_import", "bgen_import", "plink_import", "split_multi",
      "linreg_rows", "logistic_rows", "lmm_rows", "geno_ld_matrix",
      "geno_king", "geno_ibd", "geno_mendel_errors", "geno_tdt",
      "geno_de_novo", "geno_pc_relate", "geno_skat", "geno_concordance",
      "qc_variant_qc", "qc_sample_qc", "linalg_pca", "linalg_grm",
      "matrix_entries_table", "matrix_aggregate_rows_by_key",
      "matrix_filter_entries_agg", "matrix_write_read",
      "matrix_annotate_rows_table", "pipe_minhash_pairs",
      "pipe_simhash_pairs", "pipe_embed_dedup", "pipe_neardup_clusters",
      "pipe_ann_topk", "pipe_ann_lsh", "pipe_text_stats",
      "pipe_dedup_exact", "stream_hourly_agg", "vds_combine_densify",
      "rand_seeded", "pipe_knn_join", "pipe_image_dedup", "geno_ld_prune",
      "table_add_index", "pipe_minhash_fast",
      "pipe_quality_filters",
      "geno_simulate_mating", "pipe_winnow_pairs", "pipe_ngram_jaccard",
      "pipe_corpus_clean", "stream_winnow_pairs",
      "pipe_semdedup", "pipe_lm_score", "pipe_bpe_encode",
      "pipe_contamination_docs", "pipe_fuzzy_best_match")
    // Locale.ROOT: the one-line JSON contract must not pick up a
    // comma decimal separator from the JVM default locale.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def fmt(kvs: Seq[(String, Double)]): String = kvs
      .map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    System.err.println("BENCH FULL " + fmt(results))
    // full min/median/max spread: stderr + a committed-on-demand file
    // (the stdout line contract caps at ~2000 chars, medians only)
    val spreadJson = spreads.map { case (k, (mn, md, mx)) =>
      "\"" + k + "\":[" + num(mn) + "," + num(md) + "," + num(mx) + "]"
    }.mkString("{", ",", "}")
    System.err.println("BENCH SPREAD " + spreadJson)
    sys.env.get("SPARK_GRAFT_BENCH_SPREAD_OUT").foreach { p =>
      val w = new java.io.PrintWriter(p)
      try w.println(s"""{"sf":"$sfDir","iters":$iters,""" +
        s""""spread_min_med_max":$spreadJson}""")
      finally w.close()
    }
    val qs = fmt(results.filter { case (k, _) => headline.contains(k) })
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","n":${results.length},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
