package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, exact and near-exact.
  * All stages are DataFrame-declarative: the heavy lifting (hash groupBys,
  * band-bucket equi-joins) shuffles on high-cardinality keys Catalyst can
  * hash-partition, so every stage scales horizontally; no driver-side state.
  */
object Dedup {

  /** Exact dedup: keep the row with the smallest `id` per identical content
    * hash. One hash-shuffle; at 100 TB the md5 groupBy keys are uniformly
    * distributed so there is no skew. */
  def exact(df: DataFrame, id: String, text: String): DataFrame =
    keepMinPerKey(df.withColumn("content_hash", Text.contentHash(col(text))),
      "content_hash", id)

  /** Near-exact dedup by order-insensitive token-bag fingerprint — collapses
    * word-permuted duplicates that `exact` misses. */
  def byFingerprint(df: DataFrame, id: String, text: String): DataFrame =
    keepMinPerKey(df.withColumn("fp", Text.bagFingerprint(col(text))),
      "fp", id)

  private def keepMinPerKey(df: DataFrame, key: String, id: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(id).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash + LSH candidate pairs (the standard shingle → minhash → band →
    * bucket-join pipeline). `numHashes` minhashes in `bands` bands of
    * `numHashes / bands` rows; a pair is a candidate iff it agrees on at
    * least one full band.
    *
    * Hash family: lexicographic-min of md5(shingle ++ "|" ++ seed) — a valid
    * uniform min-hash, chosen because md5 is bit-identical in every engine
    * (the DuckDB oracle reproduces the signatures exactly).
    *
    * Scale: the only shuffle is the band-signature equi-join; bucket sizes
    * concentrate on true near-dups, so the join output is ~linear in the
    * number of real duplicate pairs. Returns (id_a, id_b) with the verified
    * shingle-set Jaccard similarity. */
  def minhashPairs(df: DataFrame, id: String, text: String,
      numHashes: Int = 8, bands: Int = 4, shingleSize: Int = 3)
      : DataFrame = {
    val rowsPerBand = numHashes / bands
    require(rowsPerBand * bands == numHashes, "bands must divide numHashes")
    // materialize shingles + band signatures ONCE: a self-join over an
    // uncached plan would recompute the md5 minhash subtree on both sides
    // (Catalyst duplicates the subtree), which dominated runtime by ~50x
    val sh = df
      .select(col(id).as("doc"), Text.shingles(col(text), shingleSize)
        .as("shingles"))
      .filter(size(col("shingles")) > 0)
      .persist()
    // relational minhash: explode shingles and compute the hash family as
    // plain codegen'd md5 columns + min() aggregates (md5 inside a
    // higher-order transform lambda is interpreted — ~10x slower)
    val hashed = sh
      .select(col("doc"), explode(col("shingles")).as("s"))
      .select(col("doc") +: (0 until numHashes).map(i =>
        md5(concat(col("s"), lit(s"|$i"))).as(s"h$i")): _*)
    val sig = hashed.groupBy(col("doc")).agg(
      min(col("h0")).as("mh0"),
      (1 until numHashes).map(i => min(col(s"h$i")).as(s"mh$i")): _*)
    val banded = sig
      .select(col("doc"),
        posexplode(array((0 until bands).map(b =>
          md5(concat_ws("", (0 until rowsPerBand).map(r =>
            col(s"mh${b * rowsPerBand + r}")): _*))): _*))
          .as(Seq("band", "bsig")))
      .persist()
    banded.count() // pin before the self-join
    val cand = banded.select(col("band"), col("bsig"), col("doc").as("id_a"))
      .join(banded.select(col("band"), col("bsig"), col("doc").as("id_b")),
        Seq("band", "bsig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val withSh = cand
      .join(sh.select(col("doc").as("id_a"), col("shingles").as("sh_a")),
        "id_a")
      .join(sh.select(col("doc").as("id_b"), col("shingles").as("sh_b")),
        "id_b")
    withSh.withColumn("jaccard", round(
      size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) -
          size(array_intersect(col("sh_a"), col("sh_b")))).cast("double"),
      4))
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup pairs: 64-bit signatures, candidates = equal top-k-bit
    * prefix bucket (cheap LSH for hamming space), verified by full hamming
    * distance <= `maxDist`. */
  def simhashPairs(df: DataFrame, id: String, text: String,
      prefixBits: Int = 16, maxDist: Int = 6): DataFrame = {
    // relational simhash: explode tokens and take the 60 per-bit votes as
    // plain sum() aggregates — fully codegen'd, unlike higher-order array
    // folds (CodegenFallback, ~10x slower interpreted)
    val tok = df.select(col(id).as("doc"),
      explode(array_distinct(Text.tokens(col(text)))).as("t"))
      .withColumn("h", conv(substring(md5(col("t")), 1, 15), 16, 10)
        .cast("long"))
    val votes = tok.groupBy(col("doc")).agg(
      count(lit(1)).as("n"),
      (0 until 60).map(b =>
        sum(shiftright(col("h"), b).bitwiseAND(lit(1L))).as(s"b$b")): _*)
    val sigs = votes.select(col("doc"),
      (0 until 60).map(b =>
        when(col(s"b$b") * 2 > col("n"), math.pow(2.0, b).toLong)
          .otherwise(0L)).reduce(_ + _).as("sig"))
      .withColumn("bucket", shiftright(col("sig"), 60 - prefixBits))
      .persist()
    val l = sigs.select(col("bucket"), col("doc").as("id_a"),
      col("sig").as("sig_a"))
    val r = sigs.select(col("bucket"), col("doc").as("id_b"),
      col("sig").as("sig_b"))
    l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("dist", Text.hammingDist64(col("sig_a"), col("sig_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** n-gram Jaccard verification for an arbitrary candidate-pair set:
    * join shingle sets back and compute exact similarity. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, id: String,
      text: String, shingleSize: Int = 3): DataFrame = {
    val sh = docs.select(col(id).as("doc"),
      Text.shingles(col(text), shingleSize).as("sh"))
    pairs
      .join(sh.select(col("doc").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) -
            size(array_intersect(col("sh_a"), col("sh_b")))).cast("double"))
      .drop("sh_a", "sh_b")
  }
}
