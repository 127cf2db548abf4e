package graft.methods

import breeze.linalg.{diag, eigSym, DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.mllib.linalg.{DenseMatrix => MlDenseMatrix, Vectors => MlVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{MatrixTable, Table}
import graft.functions.Calls

/** Linear mixed model (reference `statgen.py` `linear_mixed_model` /
  * `linear_mixed_regression_rows`, `stats/LinearMixedModel.py`; the
  * FaST-LMM spectral trick): y = Xβ + g + ε with g ~ N(0, σ²g K),
  * ε ~ N(0, σ²g δ I). Eigendecomposing K = U S Uᵀ rotates the model to
  * independent errors with per-component variance (S_i + δ), so the REML
  * fit is a 1-D optimization over δ and every per-variant test is a
  * weighted OLS in the rotated basis.
  *
  * Spark shape: K is sample×sample (the driver-size dimension, like
  * `Pca.grm`); the eigendecomposition and δ-optimization are driver-side
  * Breeze. The genotype rotation G·U — the data-size work — is ONE
  * distributed `RowMatrix.multiply` against the broadcast local U
  * (order-preserving, no shuffle), and the per-variant weighted
  * regression is a local kernel over each rotated row with broadcast
  * ỹ/X̃/weights. */
object Lmm {

  final case class LmmFit(delta: Double, sigmaG2: Double, h2: Double,
      logReml: Double, u: BDM[Double], s: BDV[Double],
      yRot: BDV[Double], xRot: BDM[Double])

  /** REML fit of the variance-ratio δ by golden-section over log δ. */
  def fit(kinship: BDM[Double], y: BDV[Double], x: BDM[Double]): LmmFit = {
    val es = eigSym(kinship)
    val u = es.eigenvectors
    val s = es.eigenvalues.map(v => math.max(v, 0.0))
    val yr = u.t * y
    val xr = u.t * x
    val n = y.length; val k = x.cols
    def remlNegLL(logDelta: Double): Double = {
      val delta = math.exp(logDelta)
      val w = s.map(_ + delta)
      val winv = w.map(1.0 / _)
      val xtw = xr.t * diag(winv)
      val xtwx = xtw * xr
      val beta = xtwx \ (xtw * yr)
      val res = yr - xr * beta
      var rss = 0.0
      var logw = 0.0
      var i = 0
      while (i < n) { rss += res(i) * res(i) * winv(i)
        logw += math.log(w(i)); i += 1 }
      val sigma2 = rss / (n - k)
      val (_, ldXtwx) = breeze.linalg.logdet(xtwx)
      0.5 * ((n - k) * math.log(sigma2) + logw + ldXtwx)
    }
    // golden-section on log δ ∈ [-8, 8] seeded by a coarse grid
    val grid = (-80 to 80).map(i => i / 10.0)
    var (lo, hi) = {
      val best = grid.minBy(remlNegLL)
      (best - 0.1, best + 0.1)
    }
    val phi = (math.sqrt(5.0) - 1) / 2
    var c = hi - phi * (hi - lo); var d = lo + phi * (hi - lo)
    var fc = remlNegLL(c); var fd = remlNegLL(d)
    var it = 0
    while (hi - lo > 1e-6 && it < 100) {
      if (fc < fd) { hi = d; d = c; fd = fc
        c = hi - phi * (hi - lo); fc = remlNegLL(c) }
      else { lo = c; c = d; fc = fd
        d = lo + phi * (hi - lo); fd = remlNegLL(d) }
      it += 1
    }
    val logDelta = (lo + hi) / 2
    val delta = math.exp(logDelta)
    val w = s.map(_ + delta)
    val winv = w.map(1.0 / _)
    val xtw = xr.t * diag(winv)
    val beta = (xtw * xr) \ (xtw * yr)
    val res = yr - xr * beta
    val rss = (0 until n).map(i => res(i) * res(i) * winv(i)).sum
    val sigmaG2 = rss / (n - k)
    LmmFit(delta, sigmaG2, 1.0 / (1.0 + delta), -remlNegLL(logDelta),
      u, s, yr, xr)
  }

  /** Per-variant association under the fitted LMM: rotate the
    * mean-imputed dosage matrix by U (one distributed multiply), then a
    * weighted OLS of ỹ on [X̃, x̃] per variant; reports the genotype
    * beta, chi_sq (Wald) and p_value. `pheno` keyed by the col key
    * supplies y and covariates (intercept added). */
  def linearMixedRegressionRows(mt: MatrixTable,
      pheno: org.apache.spark.sql.DataFrame, yCol: String,
      covCols: Seq[String] = Nil,
      kinship: Option[BDM[Double]] = None): Table = {
    val n = mt.nCols
    val phenoSchema = pheno.schema
    val keyIdx = mt.colKey.map(phenoSchema.fieldIndex)
    val colKeyIdx = mt.colKey.map(mt.colSchema.fieldIndex)
    val phenoMap = pheno.collect()
      .map(r => keyIdx.map(r.get) -> r).toMap
    val ordered = mt.colValues.map(cv =>
      phenoMap(colKeyIdx.map(cv.get)))
    def num(r: Row, c: String): Double = r.get(r.fieldIndex(c)) match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case b: Boolean => if (b) 1.0 else 0.0
    }
    val y = BDV(ordered.map(num(_, yCol)).toArray)
    val x = BDM.tabulate(n, covCols.length + 1)((i, j) =>
      if (j == 0) 1.0 else num(ordered(i), covCols(j - 1)))
    val kin = kinship.getOrElse {
      // default: RRM-style kinship from the genotypes themselves
      val grmRows = Pca.grm(mt).collect()
      val m = BDM.zeros[Double](n, n)
      grmRows.foreach { r =>
        val i = r.getInt(0); val j = r.getInt(1); val v = r.getDouble(2)
        m(i, j) = v; m(j, i) = v
      }
      m
    }
    val f = fit(kin, y, x)
    val spark = mt.spark
    // rotated dosages: one order-preserving distributed multiply
    val dose = transform(mt.entries,
      e => Calls.nNonRefAlleles(e("GT")).cast("double"))
    val withDose = mt.rows.select(struct(mt.rowKey.map(col): _*)
      .as("__k"), dose.as("__d"))
      .select(col("__k"), col("__d"),
        (aggregate(filter(col("__d"), v => v.isNotNull), lit(0.0),
          (a, v) => a + v) /
          greatest(size(filter(col("__d"), v => v.isNotNull)), lit(1))
            .cast("double")).as("__mean"))
      .select(col("__k"),
        transform(col("__d"), v => coalesce(v, col("__mean"))).as("__g"))
    withDose.persist()
    try {
      val keys = withDose.select(col("__k")).rdd.map(_.getStruct(0))
      val vecs = withDose.select(col("__g")).rdd
        .map(r => MlVectors.dense(r.getSeq[Double](0).toArray))
      val uMl = new MlDenseMatrix(n, n, f.u.toArray)
      val rotated = new RowMatrix(vecs, -1L, n).multiply(uMl).rows
      val bcFit = spark.sparkContext.broadcast(
        (f.yRot.toArray, f.xRot.toArray, f.s.toArray, f.delta))
      val k = covCols.length + 1
      val outRdd = keys.zip(rotated).map { case (key, xt) =>
        val (yrA, xrA, sA, delta) = bcFit.value
        val yr = new BDV(yrA)
        val xr = new BDM(n, k, xrA)
        val winv = sA.map(sv => 1.0 / (sv + delta))
        // augmented design [X̃ | x̃] weighted normal equations
        val a = BDM.horzcat(xr,
          new BDM(n, 1, xt.toArray))
        val atw = a.t * diag(new BDV(winv))
        val atwa = atw * a
        val rhs = atw * yr
        val sol =
          try Some(atwa \ rhs)
          catch { case _: Exception => None }
        sol match {
          case None => Row.fromSeq(key.toSeq ++
            Seq(null, null, null, null))
          case Some(beta) =>
            val res = yr - a * beta
            var rss = 0.0
            var i = 0
            while (i < n) { rss += res(i) * res(i) * winv(i); i += 1 }
            val sigma2 = rss / (n - k - 1)
            val cov =
              try breeze.linalg.inv(atwa)
              catch { case _: Exception => null }
            if (cov == null)
              Row.fromSeq(key.toSeq ++ Seq(null, null, null, null))
            else {
              val se = math.sqrt(sigma2 * cov(k, k))
              val b = beta(k)
              val chi2 = b * b / (sigma2 * cov(k, k))
              val p = 1.0 - org.apache.commons.math3.special.Gamma
                .regularizedGammaP(0.5, chi2 / 2.0)
              Row.fromSeq(key.toSeq ++ Seq(b, se, chi2, p))
            }
        }
      }
      val keySchema = mt.rows.schema.fields
        .filter(fld => mt.rowKey.contains(fld.name))
      val schema = StructType(
        mt.rowKey.map(kn => keySchema.find(_.name == kn).get) ++ Seq(
          StructField("beta", DoubleType),
          StructField("standard_error", DoubleType),
          StructField("chi_sq", DoubleType),
          StructField("p_value", DoubleType)))
      Table(spark.createDataFrame(outRdd, schema), mt.rowKey, mt.globals)
    } finally withDose.unpersist(blocking = false)
  }
}
