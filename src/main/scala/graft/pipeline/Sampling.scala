package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixing / sampling for training-data pipelines: deterministic,
  * engine-portable membership so a sample drawn here can be re-derived
  * (and audited) anywhere md5 exists — no RNG state, no seed plumbing,
  * rerun-stable across partitionings and cluster sizes. */
object Sampling {

  /** Uniform hash of (salt, id) in [0, 2^60): the first 15 hex digits of
    * md5 — bit-identical in any engine, unlike builtin hash functions.
    * `concat` (not concat_ws): a NULL id must propagate to a NULL hash
    * and drop the row, exactly as `'salt|' || NULL` does in SQL — the
    * engine-portability contract would break if all null-id rows
    * collapsed onto one shared hash. */
  private def unitHash(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit("|"), id.cast("string"))),
      1, 15), 16, 10).cast("long")

  /** Per-stratum deterministic Bernoulli sampling ("data mixing"): a row
    * survives iff hash(salt, id) mod 1000 falls under its stratum's
    * parts-per-thousand rate. Integer comparisons only — no
    * double-to-long cast whose truncate-vs-round semantics could differ
    * between engines at rate boundaries. Unknown strata fall back to
    * `defaultPpt`. Changing `salt` draws an independent sample; the same
    * salt always reproduces the same membership.
    *
    * Scale: one narrow codegen'd filter pushed at the scan — no
    * shuffle, no state, no driver participation; exactly what a 100 TB
    * mixing pass must be. */
  def stratifiedSample(df: DataFrame, id: String, stratum: String,
      ratesPpt: Map[String, Int], defaultPpt: Int = 0,
      salt: String = "mix"): DataFrame = {
    require(ratesPpt.values.forall(r => r >= 0 && r <= 1000) &&
      defaultPpt >= 0 && defaultPpt <= 1000,
      "rates are parts-per-thousand in [0, 1000]")
    val rate = ratesPpt.toSeq.sortBy(_._1).foldLeft(lit(defaultPpt)) {
      case (acc, (k, v)) => when(col(stratum) === k, lit(v)).otherwise(acc)
    }
    df.filter(pmod(unitHash(col(id), salt), lit(1000L)) < rate)
  }

  /** Deterministic up/down-weighting by repetition ("epochs" per
    * stratum): emit floor(weight) copies of every row plus one more for
    * the deterministic fractional remainder — the standard way to
    * express domain weights > 1 in a mixed corpus. The copy index is
    * exposed as `rep` so downstream shuffles can decorrelate copies.
    * Scale: a generator (explode of a small int range) — output is
    * exactly weight × input in expectation with zero shuffle. */
  def repeatByWeight(df: DataFrame, id: String, stratum: String,
      weightsPct: Map[String, Int], defaultPct: Int = 100,
      salt: String = "epoch"): DataFrame = {
    require(weightsPct.values.forall(_ >= 0) && defaultPct >= 0,
      "weights are percent >= 0")
    val pct = weightsPct.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (k, v)) => when(col(stratum) === k, lit(v)).otherwise(acc)
    }
    val whole = (pct / 100).cast("long")
    val fracPct = pmod(pct, lit(100L))
    val extra = (pmod(unitHash(col(id), salt), lit(100L)) < fracPct)
      .cast("long")
    df.withColumn("__n", whole + extra)
      .filter(col("__n") > 0)
      .withColumn("rep", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }
}
