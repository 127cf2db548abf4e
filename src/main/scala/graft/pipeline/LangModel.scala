package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level n-gram language-model scoring — the perplexity-style
  * quality filter (the CCNet/KenLM recipe: train a cheap LM on the
  * corpus, keep documents whose per-token negative log-likelihood is
  * low; gibberish and boilerplate land in the high-NLL tail). The
  * heuristic quality features in [[Text]] look at one document at a
  * time; this scorer is the corpus-calibrated complement.
  *
  * Model: bigram LM with add-α smoothing over the corpus vocabulary,
  *   P(w₂|w₁) = (c(w₁,w₂) + α) / (c(w₁) + α·V)
  * scored as the mean negative log-likelihood over a document's
  * bigrams. All probabilities derive from count tables the engine
  * aggregates in the same job — no external model artifact.
  *
  * Scale shape: tokenize once per doc (posexplode — a codegen'd
  * generator), form bigrams with a lead() window over (doc, pos) —
  * one uniform-key shuffle on the doc id, never a global window.
  * Count tables shuffle on the gram (uniform); the score joins are
  * plain equi-joins on the gram — vocabulary-sized right sides that
  * AQE broadcasts when they fit. Per-bigram NLL rounds to 4 decimals
  * and sums as exact DECIMAL(18,4), so the per-doc mean is
  * order-independent (DuckDB-oracle-able bit-for-bit). */
object LangModel {

  /** (doc, w1, w2) bigram stream — every adjacent token pair, NOT
    * deduplicated (an LM needs occurrence counts; [[Text.shingles]]
    * dedups for fingerprinting). */
  private def bigrams(df: DataFrame, id: String, text: String)
      : DataFrame = {
    val w = Window.partitionBy(col("doc")).orderBy(col("pos"))
    df.select(col(id).as("doc"),
        posexplode(Text.tokens(col(text))).as(Seq("pos", "w1")))
      .filter(length(col("w1")) > 0)
      .withColumn("w2", lead(col("w1"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc"), col("w1"), col("w2"))
  }

  /** Per-document bigram NLL under the corpus's own add-α bigram LM.
    * Returns (id, n_bigrams, sum_nll, sum_nll_units, nll): `sum_nll`
    * is the EXACT 4-decimal sum (the engine-portable value — means are
    * sums divided by counts, and that division's last-ulp rounding is
    * the one step two engines can disagree on), `sum_nll_units` the
    * same sum as an exact BIGINT in 1e-4 units (the integer form
    * downstream rank keys derive from), `nll` the per-bigram mean as a
    * convenience. Lower = more typical of the corpus. Documents with
    * no bigram (0- or 1-token) drop out. */
  def bigramNll(df: DataFrame, id: String, text: String,
      alpha: Double = 0.5): DataFrame = {
    // the bigram stream feeds the count tables AND the score join:
    // materialize once
    val bg = Materialize.fanout(bigrams(df, id, text))
    val big = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uni = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    // V = conditioning vocabulary (distinct first words) — one scalar
    val v = uni.count()
    val nll = round(-log(
      (col("c12") + lit(alpha)) / (col("c1") + lit(alpha * v))), 4)
      .cast("decimal(18,4)")
    bg.join(big, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(nll).as("__snd"))
      .select(col("doc").as(id), col("n_bigrams"),
        col("__snd").cast("double").as("sum_nll"),
        (col("__snd") * lit(10000)).cast("long").as("sum_nll_units"))
      .withColumn("nll", col("sum_nll") / col("n_bigrams"))
  }

  /** Corpus slice above/below an NLL quantile — the actual filter pass:
    * keep documents whose mean NLL is below the `q`-quantile of the
    * corpus. Ranks on an exact INTEGER key — the 1e-4-unit NLL sum
    * scaled by 1e6 and floor-divided by the bigram count (mean NLL in
    * 1e-10 units) — with id tiebreaks, so membership replays on any
    * engine and stack (the round-13 contract sweep: ranking on
    * `round(mean, 6)` left a double whose .5-boundary behaviour
    * differs between round IMPLEMENTATIONS — std::round of x·1e6 vs
    * exact-BigDecimal HALF_UP — and the fleet probe measured a real
    * sub-1e-12 boundary hit at sf0.01). The rank itself is the
    * two-phase distributed scan — one range exchange, never a
    * single-task window. */
  def filterByNll(df: DataFrame, id: String, text: String, q: Double,
      alpha: Double = 0.5): DataFrame = {
    val scored = bigramNll(df, id, text, alpha)
      .withColumn("nll_r",
        expr("(sum_nll_units * CAST(1000000 AS BIGINT)) div n_bigrams"))
      .transform(Materialize.fanout)
    val n = scored.count()
    val keep = math.max(1L, math.floor(n * q).toLong)
    graft.operators.Scans
      .runningCount(scored, Seq("nll_r", id), "__rk", inclusive = true)
      .filter(col("__rk") <= keep).drop("__rk", "nll_r")
  }
}
