package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for large-scale training-data pipelines: tokenizing,
  * shingling, fingerprinting, quality scoring, language id. All pure Column
  * expressions (codegen'd, no UDFs) so they stream through whole-stage
  * codegen at 100 TB — the hot path never leaves Tungsten. */
object Text {

  /** Whitespace word tokens of lowercased text. */
  def tokens(text: Column): Column = split(lower(text), " +")

  /** Distinct n-word shingles (1-based positions, matching the SQL oracle
    * formulation exactly). */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      array_distinct(
        transform(sequence(lit(1), size(w) - (n - 1)),
          j => concat_ws(" ",
            (0 until n).map(o => element_at(w, j + o)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Stable 128-bit content fingerprint of the exact text. */
  def contentHash(text: Column): Column = md5(text)

  /** Order/duplicate-insensitive document fingerprint: md5 of the sorted
    * distinct token multiset — collapses word-permuted near-duplicates. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(trim(text), " +"))

  /** BPE-ish subword count estimate: word-piece regex splits on
    * letter/digit/punct boundaries (a cheap stand-in for a real tokenizer's
    * token count, linear scan, codegen'd). */
  def subwordCount(text: Column): Column =
    size(split(trim(text), "(?=[^a-zA-Z0-9])|\\s+"))

  /** Quality-score features: length, punctuation ratio, stopword ratio,
    * mean word length — the standard cheap heuristics for corpus filtering. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def meanWordLen(text: Column): Column =
    length(regexp_replace(text, " +", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "for")

  def stopwordRatio(text: Column): Column = {
    val w = tokens(text)
    size(array_intersect(w, array(enStop.map(lit): _*))).cast("double") /
      greatest(size(w), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1] (higher = more natural-language-like).
    * Weights are heuristic, mirroring common corpus-filter recipes. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctOk = when(punctRatio(text) < 0.1, 1.0).otherwise(0.3)
    val wordOk = when(meanWordLen(text).between(2.0, 12.0), 1.0)
      .otherwise(0.2)
    round(lenScore * 0.4 + punctOk * 0.3 + wordOk * 0.3, 4)
  }

  /** Language id: CJK codepoint detection + per-language stopword voting —
    * the classic cheap n-gram-free heuristic. Returns a language code. */
  def langId(text: Column): Column = {
    val stops: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
      "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour"),
      "es" -> Seq("el", "los", "las", "es", "una", "que", "por", "como"))
    val w = tokens(text)
    val scores = stops.map { case (lang, ws) =>
      lang -> size(array_intersect(w, array(ws.map(lit): _*)))
    }
    val best = scores.tail.foldLeft[Column](
      struct(scores.head._2.as("s"), lit(scores.head._1).as("l"))) {
      case (acc, (lang, s)) =>
        when(s > acc("s"), struct(s.as("s"), lit(lang).as("l")))
          .otherwise(acc)
    }
    when(length(regexp_replace(text, "[^\\x{4E00}-\\x{9FFF}]", "")) >
        length(text) * 0.2, "zh")
      .otherwise(when(best("s") > 0, best("l")).otherwise("und"))
  }

  /** 64-bit SimHash over token md5s: per-bit majority vote, codegen'd
    * bit-twiddling (no UDF). Near-duplicates differ in few bits. */
  def simHash64(text: Column): Column = {
    val w = array_distinct(tokens(text))
    // token -> 64-bit hash from the first 16 hex chars of md5
    val h = (t: Column) => conv(substring(md5(t), 1, 15), 16, 10).cast("long")
    val votes = (0 until 60).map { bit =>
      val ones = size(filter(w, t =>
        shiftright(h(t), bit).bitwiseAND(lit(1L)) === 1L))
      when(ones * 2 > size(w), shiftleft(lit(1L), bit)).otherwise(0L)
    }
    votes.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hammingDist64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
