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
    val sh = df
      .select(col(id).as("doc"), Text.shingles(col(text), shingleSize)
        .as("shingles"))
      .filter(size(col("shingles")) > 0)
    val sig = sh.withColumn("sig",
      transform(sequence(lit(0), lit(numHashes - 1)), i =>
        array_min(transform(col("shingles"), s =>
          md5(concat(s, lit("|"), i.cast("string")))))))
    val banded = sig.select(col("doc"), col("shingles"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        md5(concat_ws("", (1 to rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r)): _*))))
        .as(Seq("band", "bsig")))
    val left = banded.select(col("band"), col("bsig"),
      col("doc").as("id_a"), col("shingles").as("sh_a"))
    val right = banded.select(col("band"), col("bsig"),
      col("doc").as("id_b"), col("shingles").as("sh_b"))
    val cand = left.join(right, Seq("band", "bsig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
    cand.withColumn("jaccard", round(
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
    val sigs = df.select(col(id).as("doc"),
      Text.simHash64(col(text)).as("sig"))
      .withColumn("bucket", shiftright(col("sig"), 60 - prefixBits))
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
