package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the live-ingestion form of
  * `pipeline.Dedup.minhashPairs`: documents arrive on a stream, band
  * signatures are computed per micro-batch, and a per-bucket state of
  * previously seen doc ids emits (id_a, id_b) candidate pairs the moment
  * a new member lands in a bucket — including pairs whose two sides
  * arrived in different micro-batches.
  *
  * Scale shape: ONE stateful operator (`flatMapGroupsWithState` keyed by
  * (band, bucket signature)); state per bucket is the member id list,
  * capped at `maxBucketSize` — a degenerate boilerplate bucket saturates
  * and stops emitting instead of going quadratic. The batch pipeline
  * DROPS oversized buckets outright; a stream cannot retract, so
  * saturation (emit-then-stop) is the streaming analogue — the two agree
  * exactly on every bucket that stays under the cap. */
object StreamDedup {

  final case class Banded(doc: Long, band: Int, bsig: String)
  final case class CandidatePair(id_a: Long, id_b: Long)
  // public: the state encoder's generated code must reach the fields
  final case class BucketState(ids: Array[Long])

  /** Per-row (aggregation-free) minhash band signatures. The batch
    * pipeline computes minima via an exploded hash-aggregate — faster at
    * rest — but a streaming query gets only one stateful operator, which
    * must be the bucket state, so the signature here is a plain
    * projection with higher-order array minima. Families match the batch
    * pipeline bit-for-bit: "md5" (DuckDB-reproducible — the oracle path)
    * and "xxhash64" (the fast production family). */
  def bandedSignatures(docs: DataFrame, id: String, text: String,
      numHashes: Int = 8, bands: Int = 4, shingleSize: Int = 3,
      family: String = "md5"): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(rowsPerBand * bands == numHashes, "bands must divide numHashes")
    require(family == "md5" || family == "xxhash64",
      s"unknown minhash family: $family")
    val bsigOf: Seq[Column] => Column =
      if (family == "md5")
        cs => md5(concat_ws("_", cs.map(_.cast("string")): _*))
      else cs => xxhash64(cs: _*).cast("string")
    // ALL minima in one fused kernel pass (MinhashSigsExpr): the HOF
    // formulation ran md5/conv inside 8 interpreted transform lambdas —
    // the dominant cost of the stream gate. Staged as a multi-referenced
    // attribute so the kernel evaluates once per row; the band bucket
    // hash stays a codegen'd scalar md5/xxhash64.
    docs
      .select(col(id).cast("long").as("doc"),
        graft.pipeline.Text.shingles(col(text), shingleSize).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col("doc"), graft.functions.TextKernels
        .minhashSigs(col("__sh"), numHashes, family).as("__mh"))
      .select(col("doc"),
        posexplode(array((0 until bands).map(b =>
          bsigOf((0 until rowsPerBand).map(r =>
            element_at(col("__mh"), b * rowsPerBand + r + 1)))): _*))
          .as(Seq("band", "bsig")))
  }

  /** Streaming candidate pairs. Output may contain a pair once per
    * shared band (like the batch pipeline before its dropDuplicates) —
    * dedup downstream (the sink table, or `.distinct()` on a static
    * read-back). Pairs are normalized id_a < id_b. */
  def minhashPairsStream(docs: DataFrame, id: String, text: String,
      numHashes: Int = 8, bands: Int = 4, shingleSize: Int = 3,
      maxBucketSize: Int = 10000, family: String = "md5")
      : Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = bandedSignatures(docs, id, text, numHashes, bands,
      shingleSize, family).as[Banded]
    banded.groupByKey(b => (b.band, b.bsig))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, String), it: Iterator[Banded],
            state: GroupState[BucketState]) =>
          emitPairs(state.getOption.map(_.ids).getOrElse(Array.empty[Long]),
            it.map(_.doc).toSeq, maxBucketSize, state)
      }
  }

  final case class FpRow(doc: Long, fp: Long)

  /** Shared bucket-state transition for the streaming pair kernels:
    * emit (old member, new member) pairs for every fresh id, saturate
    * (emit-then-stop) past `maxBucketSize`, keep one id past the cap so
    * saturation survives restarts. */
  private def emitPairs(seen: Array[Long], incoming: Seq[Long],
      maxBucketSize: Int, state: GroupState[BucketState])
      : Iterator[CandidatePair] = {
    if (seen.length > maxBucketSize) Iterator.empty // saturated
    else {
      val seenSet = seen.toSet
      val fresh = incoming.distinct.filterNot(seenSet.contains)
      val out = Seq.newBuilder[CandidatePair]
      var members = seen.length
      fresh.zipWithIndex.foreach { case (d, i) =>
        members += 1
        if (members <= maxBucketSize) {
          (seen.iterator ++ fresh.iterator.take(i)).foreach { p =>
            out += (if (p < d) CandidatePair(p, d)
                    else CandidatePair(d, p))
          }
        }
      }
      state.update(BucketState((seen ++ fresh).take(maxBucketSize + 1)))
      out.result().iterator
    }
  }

  /** Streaming winnowing contamination detector — the live form of
    * `pipeline.Dedup.winnowPairs`: each arriving document projects to
    * its winnowing fingerprint set (one fused per-row kernel pass —
    * streaming-safe, no aggregation), and a per-fingerprint bucket
    * state emits a candidate pair the moment two documents share a
    * selected fingerprint — across micro-batches. By the winnowing
    * guarantee, any pair sharing a normalized run of k + w - 1 chars
    * surfaces no later than the second member's micro-batch. State per
    * fingerprint is the member id list, capped like the minhash kernel. */
  def winnowPairsStream(docs: DataFrame, id: String, text: String,
      k: Int = 16, w: Int = 4, maxBucketSize: Int = 10000)
      : Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = docs
      .select(col(id).cast("long").as("doc"),
        explode(graft.pipeline.Text.winnowFingerprints(col(text), k, w))
          .as("fp"))
      .as[FpRow]
    rows.groupByKey(_.fp)
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[FpRow], state: GroupState[BucketState]) =>
          emitPairs(state.getOption.map(_.ids).getOrElse(Array.empty[Long]),
            it.map(_.doc).toSeq, maxBucketSize, state)
      }
  }

  /** Run the stream to completion over a static directory (memory sink,
    * one file per trigger → real cross-batch state) and return the
    * DISTINCT candidate pairs — the parity surface the oracle checks
    * against the batch band-bucket join. */
  def runMinhashPairs(spark: org.apache.spark.sql.SparkSession,
      path: String, schema: org.apache.spark.sql.types.StructType,
      id: String, text: String, sinkName: String,
      family: String = "md5", numStatePartitions: Int = 8): DataFrame = {
    val dir = Events.stageAsDir(path, "graft_smh")
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", Events.filesPerTrigger(dir))
      .parquet(dir)
    // state partitions sized to state volume, not cores — see
    // Events.withStatePartitions
    Events.withStatePartitions(spark, numStatePartitions) {
      val q = minhashPairsStream(stream, id, text, family = family)
        .writeStream
        .format("memory")
        .queryName(sinkName)
        .outputMode(OutputMode.Append())
        .start()
      q.processAllAvailable()
      q.stop()
    }
    spark.table(sinkName).distinct()
  }

  /** Run the winnow stream to completion over a static directory and
    * return the verified pairs: DISTINCT streamed candidates joined
    * back to the full normalized (k+w-1)-gram sets of a batch read of
    * the same data, keeping pairs with >= 1 genuinely shared run. The
    * winnowing guarantee makes streamed-candidate recall exact, so this
    * equals `Dedup.winnowSubstringPairs` on the batch read — one
    * definition of "contaminated pair" for backfill and live tailing. */
  def runWinnowPairs(spark: org.apache.spark.sql.SparkSession,
      path: String, schema: org.apache.spark.sql.types.StructType,
      id: String, text: String, sinkName: String,
      k: Int = 16, w: Int = 4, numStatePartitions: Int = 32): DataFrame = {
    val dir = Events.stageAsDir(path, "graft_swn")
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", Events.filesPerTrigger(dir))
      .parquet(dir)
    // one state row per FINGERPRINT (~0.4/normalized char) — millions of
    // keys at any real corpus slice, the large-state regime
    Events.withLargeState(spark, numStatePartitions) {
      val q = winnowPairsStream(stream, id, text, k, w)
        .writeStream
        .format("memory")
        .queryName(sinkName)
        .outputMode(OutputMode.Append())
        .start()
      q.processAllAvailable()
      q.stop()
    }
    // pre-cast the id to long on the batch read: the streamed candidate
    // pairs are typed long (CandidatePair), and verifySharedRuns joins
    // ids as-is by contract
    graft.pipeline.Dedup.verifySharedRuns(
      spark.table(sinkName).distinct(),
      spark.read.parquet(path)
        .withColumn(id, org.apache.spark.sql.functions.col(id)
          .cast("long")),
      id, text, k + w - 1)
      .withColumn("n_shared", col("n_shared").cast("long"))
  }
}
