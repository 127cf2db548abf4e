package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding — the real
  * subword tokenizer a training-data pipeline runs before packing
  * (the [[Text.subwordCount]] regex is the cheap estimate; this is the
  * actual BPE of Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units").
  *
  * Scale shape: training operates on the WORD-FREQUENCY DICTIONARY,
  * not the corpus — one explode + uniform-key groupBy reduces 100 TB
  * of text to a vocabulary-sized table (natural-language vocabularies
  * are bounded; `maxWords` caps adversarial tails at the most frequent
  * words, which are the only ones that shape merges). The merge loop
  * is driver-side over that bounded dictionary — the same contract as
  * every collect in this codebase (bounded by vocabulary, never data).
  * Encoding is a per-row map with the merge table broadcast in the
  * closure: a narrow pass, no shuffle, no driver participation. */
object Bpe {

  val EndOfWord = "</w>"

  /** Corpus word frequencies: one explode + one uniform-key groupBy. */
  def wordCounts(df: DataFrame, text: String): DataFrame =
    df.select(explode(Text.tokens(col(text))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Classical BPE training over a word-frequency dictionary: words are
    * symbol sequences (characters + a terminal [[EndOfWord]]); each
    * round merges the most frequent adjacent symbol pair. Fully
    * deterministic: ties break by (count desc, left asc, right asc),
    * and the input dictionary is canonicalized first, so the merge
    * table is a pure function of the frequency map. Returns the merges
    * in rank order. */
  def train(wordFreq: Seq[(String, Long)], numMerges: Int)
      : Seq[(String, String)] = {
    // canonical order makes the fold deterministic regardless of the
    // caller's collection order
    var vocab: Vector[(Vector[String], Long)] = wordFreq
      .filter { case (w, n) => w.nonEmpty && n > 0 }
      .sortBy(_._1).toVector
      .map { case (w, n) =>
        (w.map(_.toString).toVector :+ EndOfWord, n)
      }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.LinkedHashMap
        .empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (best, _) = counts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }
        merges += best
        val joined = best._1 + best._2
        vocab = vocab.map { case (syms, n) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 &&
                syms(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), n)
        }
        round += 1
      }
    }
    merges.result()
  }

  /** Train from a corpus: aggregate word frequencies (one shuffle),
    * keep the `maxWords` most frequent (deterministic ties by word),
    * train driver-side. */
  def trainFromCorpus(df: DataFrame, text: String, numMerges: Int,
      maxWords: Int = 65536): Seq[(String, String)] = {
    val freq = wordCounts(df, text)
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    train(freq, numMerges)
  }

  /** Encode one word with a trained merge table: start from characters
    * + [[EndOfWord]], repeatedly apply the LOWEST-RANK merge present
    * (all its occurrences, left to right) — the standard BPE encode,
    * which reproduces exactly the segmentation training reached. */
  def encodeWord(word: String, ranks: Map[(String, String), Int])
      : Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var syms: Vector[String] = word.map(_.toString).toVector :+ EndOfWord
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) bestRank = r
        }
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 &&
              ranks.get((syms(j), syms(j + 1))).contains(bestRank)) {
            out += syms(j) + syms(j + 1); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** Subword tokens of a text column under a trained merge table — the
    * merge table ships in the UDF closure (merge tables are small:
    * numMerges entries), so this is a narrow per-row pass. */
  def encodeTokens(textCol: Column, merges: Seq[(String, String)])
      : Column = {
    val ranks = merges.zipWithIndex.toMap
    val enc = udf { (s: String) =>
      if (s == null) null
      else s.toLowerCase.split(" +").filter(_.nonEmpty).toSeq
        .flatMap(w => encodeWord(w, ranks))
    }
    enc(textCol)
  }

  /** Per-document subword token count under a trained merge table. */
  def tokenCounts(df: DataFrame, id: String, text: String,
      merges: Seq[(String, String)]): DataFrame =
    df.select(col(id),
      size(encodeTokens(col(text), merges)).cast("long").as("n_tokens"))
}
