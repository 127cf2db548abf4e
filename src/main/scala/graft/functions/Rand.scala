package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic per-row seeded randomness.
  *
  * Spark's `rand(seed)` is seeded per-PARTITION and depends on row order
  * within a task — re-partitioning changes values, which breaks
  * reproducible pipelines. The reference solves this with counter-based
  * threefry keyed by (seed, row key) (`expr/ir/Random.scala`,
  * `functions/RandomSeededFunctions.scala`). We do the same thing
  * Spark-natively: a counter-based hash (`xxhash64`) of (seed, key columns)
  * gives an i.i.d.-quality uniform stream that is a pure, codegen'd
  * expression — stable under repartitioning, shuffling and retries. */
object Rand {

  /** Uniform double in [0, 1): 53 mantissa-quality bits from xxhash64. */
  def runif(seed: Long, keys: Column*): Column =
    shiftrightunsigned(xxhash64((lit(seed) +: keys): _*), 11)
      .cast("double") / lit((1L << 53).toDouble)

  /** Independent stream `i` of the same keys (counter-based). */
  def runifStream(seed: Long, i: Int, keys: Column*): Column =
    runif(seed, (lit(i) +: keys): _*)

  def rbool(seed: Long, p: Double, keys: Column*): Column =
    runif(seed, keys: _*) < p

  def rint32(seed: Long, n: Int, keys: Column*): Column =
    (runif(seed, keys: _*) * n).cast("int")

  def rint64(seed: Long, n: Long, keys: Column*): Column =
    (runif(seed, keys: _*) * n).cast("long")

  def runifRange(seed: Long, lo: Double, hi: Double, keys: Column*): Column =
    runif(seed, keys: _*) * (hi - lo) + lo

  /** Standard normal via Box–Muller over two hash streams — pure
    * expressions, no UDF. */
  def rnorm(seed: Long, keys: Column*): Column = {
    val u1 = greatest(runifStream(seed, 1, keys: _*), lit(1e-300))
    val u2 = runifStream(seed, 2, keys: _*)
    sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  def rnorm(seed: Long, mean: Double, sd: Double, keys: Column*): Column =
    rnorm(seed, keys: _*) * sd + mean

  /** Exponential via inverse CDF. */
  def rexp(seed: Long, rate: Double, keys: Column*): Column =
    -log(greatest(lit(1.0) - runif(seed, keys: _*), lit(1e-300))) / rate

  /** Beta via Jöhnk's algorithm for small params is unstable; use two-gamma
    * ratio with Marsaglia–Tsang needs loops — for expression-only parity we
    * use the inverse-CDF of a normal approx for a/b>1, else a UDF would be
    * needed; kept simple: ratio of powers (Jöhnk) valid for a,b <= 1. */
  def rbetaJohnk(seed: Long, a: Double, b: Double, keys: Column*): Column = {
    val x = pow(runifStream(seed, 1, keys: _*), 1.0 / a)
    val y = pow(runifStream(seed, 2, keys: _*), 1.0 / b)
    when(x + y <= 1.0, x / (x + y))
      .otherwise(pow(runifStream(seed, 3, keys: _*), 1.0 / a)) // fallback draw
  }

  /** Poisson via Knuth for small lambda (product of uniforms as expression
    * fold over a bounded counter window; exact for lambda <~ 30). */
  def rpois(seed: Long, lambda: Double, keys: Column*): Column = {
    val bound = math.max(8, (lambda * 6).toInt)
    val l = math.exp(-lambda)
    // count how many prefix-products of uniforms stay above e^-lambda
    val prods = (1 to bound).scanLeft(lit(1.0)) { (acc, i) =>
      acc * runifStream(seed, i, keys: _*)
    }.tail
    prods.map(p => (p > l).cast("int")).reduce(_ + _)
  }

  /** Deterministic shuffle key: sort by this to get a seeded permutation. */
  def shuffleKey(seed: Long, keys: Column*): Column = xxhash64(
    (lit(seed) +: keys): _*)
}
