package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregators — the reference aggregator set Spark lacks
  * natively (reference dir `expr/ir/agg`: `CallStatsAggregator.scala`,
  * `LinearRegressionAggregator.scala`, `ReservoirSampleAggregator.scala`,
  * `DownsampleAggregator.scala`, `ImputeTypeAggregator.scala`).
  *
  * All are `Aggregator[IN, BUF, OUT]` registered through `functions.udaf`,
  * so they run inside Spark's partial → shuffle → final aggregation exactly
  * like built-ins: constant-size buffers, map-side combine, no driver
  * funnel. */
object Aggs {

  // ---- product (exact, not exp-log) --------------------------------------

  val productAgg: Aggregator[Double, Double, Double] =
    new Aggregator[Double, Double, Double] {
      def zero: Double = 1.0
      def reduce(b: Double, a: Double): Double = b * a
      def merge(b1: Double, b2: Double): Double = b1 * b2
      def finish(b: Double): Double = b
      def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
  def product(c: Column): Column = udaf(productAgg).apply(c)

  // ---- call_stats ---------------------------------------------------------

  case class CallStatsBuf(ac: Array[Long], hom: Array[Long], an: Long)
  case class CallStatsOut(AC: Seq[Long], AF: Seq[Double], AN: Long,
      homozygote_count: Seq[Long])

  /** Allele counts / frequencies / homozygote counts over packed calls
    * (packing per `graft.functions.Calls`). */
  def callStatsAgg(nAlleles: Int)
      : Aggregator[java.lang.Integer, CallStatsBuf, CallStatsOut] =
    new Aggregator[java.lang.Integer, CallStatsBuf, CallStatsOut] {
      def zero: CallStatsBuf =
        CallStatsBuf(new Array[Long](nAlleles), new Array[Long](nAlleles), 0L)
      def reduce(b: CallStatsBuf, call: java.lang.Integer): CallStatsBuf = {
        if (call == null) b
        else {
          val c = call.intValue()
          val a1 = (c >> 1) & 0x7fff
          val a2 = (c >> 16) & 0x7fff
          val haploid = a2 == 0x7fff
          b.ac(a1) += 1
          if (!haploid) {
            b.ac(a2) += 1
            if (a1 == a2) b.hom(a1) += 1
          }
          CallStatsBuf(b.ac, b.hom, b.an + (if (haploid) 1 else 2))
        }
      }
      def merge(x: CallStatsBuf, y: CallStatsBuf): CallStatsBuf =
        CallStatsBuf(
          x.ac.zip(y.ac).map { case (a, b) => a + b },
          x.hom.zip(y.hom).map { case (a, b) => a + b },
          x.an + y.an)
      def finish(b: CallStatsBuf): CallStatsOut =
        CallStatsOut(b.ac.toSeq,
          b.ac.map(c => if (b.an == 0) 0.0 else c.toDouble / b.an).toSeq,
          b.an, b.hom.toSeq)
      def bufferEncoder: Encoder[CallStatsBuf] = Encoders.product
      def outputEncoder: Encoder[CallStatsOut] = Encoders.product
    }
  def callStats(call: Column, nAlleles: Int): Column =
    udaf(callStatsAgg(nAlleles)).apply(call)

  // ---- per-group linear regression (multi-covariate OLS) ------------------

  case class LinregIn(y: java.lang.Double, x: Seq[Double])
  case class LinregBuf(n: Long, xtx: Array[Double], xty: Array[Double],
      yty: Double)
  case class LinregOut(beta: Seq[Double], standard_error: Seq[Double],
      sigma_sq: Double, n: Long)

  /** OLS per group: accumulate X'X, X'y, y'y in a constant-size buffer;
    * solve on finish with Breeze (reference
    * `LinearRegressionAggregator.scala` accumulates the same moments).
    * `k` = number of covariates including the intercept if the caller
    * appends one. Output: betas, per-coefficient standard errors
    * (sqrt(sigma² (X'X)⁻¹_jj) with sigma² = RSS/(n-k)), residual variance,
    * and n — enough for t/p downstream. */
  def linregAgg(k: Int): Aggregator[LinregIn, LinregBuf, LinregOut] =
    new Aggregator[LinregIn, LinregBuf, LinregOut] {
      def zero: LinregBuf = LinregBuf(0L, new Array[Double](k * k),
        new Array[Double](k), 0.0)
      def reduce(b: LinregBuf, in: LinregIn): LinregBuf = {
        if (in.y == null || in.x == null || in.x.length != k) b
        else {
          val x = in.x
          var i = 0
          while (i < k) {
            var j = 0
            while (j < k) {
              b.xtx(i * k + j) += x(i) * x(j); j += 1
            }
            b.xty(i) += x(i) * in.y; i += 1
          }
          LinregBuf(b.n + 1, b.xtx, b.xty, b.yty + in.y * in.y)
        }
      }
      def merge(a: LinregBuf, c: LinregBuf): LinregBuf =
        LinregBuf(a.n + c.n,
          a.xtx.zip(c.xtx).map(t => t._1 + t._2),
          a.xty.zip(c.xty).map(t => t._1 + t._2),
          a.yty + c.yty)
      def finish(b: LinregBuf): LinregOut = {
        val nan = Seq.fill(k)(Double.NaN)
        if (b.n <= k) LinregOut(nan, nan, Double.NaN, b.n)
        else {
          try {
            val m = breeze.linalg.DenseMatrix.create(k, k, b.xtx)
            val v = breeze.linalg.DenseVector(b.xty)
            val beta = m \ v
            val rss = b.yty - (beta dot v)
            val sigmaSq = rss / (b.n - k)
            val inv = breeze.linalg.inv(m)
            val se = (0 until k).map(j =>
              math.sqrt(math.max(sigmaSq * inv(j, j), 0.0)))
            LinregOut(beta.toArray.toSeq, se, sigmaSq, b.n)
          } catch { case _: Exception =>
            LinregOut(nan, nan, Double.NaN, b.n) }
        }
      }
      def bufferEncoder: Encoder[LinregBuf] = Encoders.product
      def outputEncoder: Encoder[LinregOut] = Encoders.product
    }
  def linreg(y: Column, xs: Column, k: Int): Column =
    udaf(linregAgg(k)).apply(y, xs)

  // ---- deterministic uniform sample (bottom-k by hash) --------------------

  case class SampleBuf(items: Seq[(Long, String)])

  /** Uniform sample of k items, deterministic under any partitioning:
    * keep the k smallest xxhash64(seed, item) — a mergeable bottom-k
    * sketch with reservoir-sample statistics but stable output
    * (the reference's ReservoirSampleAggregator is RNG-order-dependent;
    * bottom-k-by-hash is the distribution-equivalent deterministic
    * construction). */
  def sampleAgg(k: Int, seed: Long)
      : Aggregator[String, SampleBuf, Seq[String]] =
    new Aggregator[String, SampleBuf, Seq[String]] {
      private def hash(s: String): Long =
        // stable 64-bit FNV-1a; independent of JVM hashCode
        s.getBytes("UTF-8").foldLeft(0xcbf29ce484222325L ^ seed) {
          (h, b) => (h ^ (b & 0xff)) * 0x100000001b3L
        }
      private def trim(s: Seq[(Long, String)]) =
        s.distinct.sortBy(_._1).take(k)
      def zero: SampleBuf = SampleBuf(Nil)
      def reduce(b: SampleBuf, a: String): SampleBuf =
        if (a == null) b else SampleBuf(trim(b.items :+ (hash(a), a)))
      def merge(a: SampleBuf, b: SampleBuf): SampleBuf =
        SampleBuf(trim(a.items ++ b.items))
      def finish(b: SampleBuf): Seq[String] = b.items.map(_._2)
      def bufferEncoder: Encoder[SampleBuf] = Encoders.product
      def outputEncoder: Encoder[Seq[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    }
  def sample(c: Column, k: Int, seed: Long = 42L): Column =
    udaf(sampleAgg(k, seed)).apply(c)

  // ---- downsample (scatter-plot thinning) ---------------------------------

  case class DownsampleBuf(cells: Map[String, (Double, Double)])

  /** Grid-cell thinning for (x, y) scatter data: keep one representative
    * point per grid cell at `factor` resolution, capped deterministically
    * (reference `DownsampleAggregator.scala`). */
  def downsampleAgg(factor: Int)
      : Aggregator[(Double, Double), DownsampleBuf, Seq[(Double, Double)]] =
    new Aggregator[(Double, Double), DownsampleBuf, Seq[(Double, Double)]] {
      private def cell(x: Double, y: Double): String =
        s"${math.round(x * factor)}:${math.round(y * factor)}"
      def zero: DownsampleBuf = DownsampleBuf(Map.empty)
      private val ord = Ordering.Tuple2[Double, Double]
      def reduce(b: DownsampleBuf, p: (Double, Double)): DownsampleBuf = {
        val c = cell(p._1, p._2)
        // keep the lexicographically-least point per cell: deterministic
        if (b.cells.get(c).forall(q => ord.lt(p, q)))
          DownsampleBuf(b.cells + (c -> p)) else b
      }
      def merge(a: DownsampleBuf, b: DownsampleBuf): DownsampleBuf =
        DownsampleBuf((a.cells.toSeq ++ b.cells.toSeq)
          .groupBy(_._1).map { case (c, ps) => c -> ps.map(_._2).min(ord) })
      def finish(b: DownsampleBuf): Seq[(Double, Double)] =
        b.cells.values.toSeq.sorted(ord)
      def bufferEncoder: Encoder[DownsampleBuf] = Encoders.kryo
      def outputEncoder: Encoder[Seq[(Double, Double)]] =
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Seq[(Double, Double)]]()
    }
  def downsample(x: Column, y: Column, factor: Int): Column =
    udaf(downsampleAgg(factor)).apply(x, y)

  // ---- impute_type (schema inference over strings) ------------------------

  case class ImputeTypeBuf(anyNonMissing: Boolean, allInt: Boolean,
      allFloat: Boolean, allBool: Boolean)
  case class ImputeTypeOut(inferred: String)

  /** Infer the narrowest type for a string column (reference
    * `ImputeTypeAggregator.scala`; python `import_table(impute=True)`). */
  val imputeTypeAgg: Aggregator[String, ImputeTypeBuf, ImputeTypeOut] =
    new Aggregator[String, ImputeTypeBuf, ImputeTypeOut] {
      private val intRe = "^-?\\d+$".r
      private val floatRe = "^-?\\d*\\.?\\d+([eE][+-]?\\d+)?$".r
      private val boolRe = "^(?i)(true|false)$".r
      def zero: ImputeTypeBuf = ImputeTypeBuf(false, true, true, true)
      def reduce(b: ImputeTypeBuf, s: String): ImputeTypeBuf =
        if (s == null || s.isEmpty) b
        else ImputeTypeBuf(true,
          b.allInt && intRe.matches(s),
          b.allFloat && floatRe.matches(s),
          b.allBool && boolRe.matches(s))
      def merge(a: ImputeTypeBuf, b: ImputeTypeBuf): ImputeTypeBuf =
        ImputeTypeBuf(a.anyNonMissing || b.anyNonMissing,
          a.allInt && b.allInt, a.allFloat && b.allFloat,
          a.allBool && b.allBool)
      def finish(b: ImputeTypeBuf): ImputeTypeOut = ImputeTypeOut(
        if (!b.anyNonMissing) "missing"
        else if (b.allBool) "boolean"
        else if (b.allInt) "int64"
        else if (b.allFloat) "float64"
        else "string")
      def bufferEncoder: Encoder[ImputeTypeBuf] = Encoders.product
      def outputEncoder: Encoder[ImputeTypeOut] = Encoders.product
    }
  def imputeType(c: Column): Column = udaf(imputeTypeAgg).apply(c)

  // ---- histogram ----------------------------------------------------------

  case class HistBuf(counts: Array[Long], nLess: Long, nGreater: Long)
  case class HistOut(bin_edges: Seq[Double], bin_freq: Seq[Long],
      n_smaller: Long, n_larger: Long)

  /** Fixed-range histogram (reference `hl.agg.hist`). */
  def histAgg(lo: Double, hi: Double, bins: Int)
      : Aggregator[java.lang.Double, HistBuf, HistOut] =
    new Aggregator[java.lang.Double, HistBuf, HistOut] {
      private val w = (hi - lo) / bins
      def zero: HistBuf = HistBuf(new Array[Long](bins), 0L, 0L)
      def reduce(b: HistBuf, v: java.lang.Double): HistBuf = {
        if (v == null) b
        else if (v < lo) HistBuf(b.counts, b.nLess + 1, b.nGreater)
        else if (v > hi) HistBuf(b.counts, b.nLess, b.nGreater + 1)
        else {
          val i = math.min(((v - lo) / w).toInt, bins - 1)
          b.counts(i) += 1
          b
        }
      }
      def merge(a: HistBuf, b: HistBuf): HistBuf = HistBuf(
        a.counts.zip(b.counts).map(t => t._1 + t._2),
        a.nLess + b.nLess, a.nGreater + b.nGreater)
      def finish(b: HistBuf): HistOut = HistOut(
        (0 to bins).map(i => lo + i * w), b.counts.toSeq, b.nLess,
        b.nGreater)
      def bufferEncoder: Encoder[HistBuf] = Encoders.product
      def outputEncoder: Encoder[HistOut] = Encoders.product
    }
  def hist(c: Column, lo: Double, hi: Double, bins: Int): Column =
    udaf(histAgg(lo, hi, bins)).apply(c)
}
