package graft.methods

import breeze.linalg.{eigSym, inv, logdet, DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.mllib.linalg.{Vectors => MlVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{MatrixTable, Table}
import graft.functions.Calls

/** Linear mixed model (reference `statgen.py` `linear_mixed_model` /
  * `linear_mixed_regression_rows`, `stats/LinearMixedModel.py`; the
  * FaST-LMM spectral trick): y = Xβ + g + ε with g ~ N(0, σ²g K),
  * ε ~ N(0, σ²g δ I). With K = V S Vᵀ (rank r ≤ n), the inverse of
  * K + δI is V(diag(1/(S+δ)) − 1/δ)Vᵀ + (1/δ)I, so every weighted
  * inner product ⟨a,b⟩_W needs only the raw dot aᵀb and the r-dim
  * projections Vᵀa, Vᵀb — the REML fit is a 1-D optimization over δ on
  * O(k²+rk) precomputed blocks and each per-variant test is a
  * (k+1)×(k+1) solve. This handles the low-rank case (fewer variants
  * than samples, or a truncated basis) exactly: the orthogonal
  * complement of V contributes eigenvalue 0, i.e. weight 1/δ, without
  * ever materializing a basis for it.
  *
  * Spark shape: the basis V is n×r on the driver (it IS the rotation
  * operator, the same contract as the reference's
  * `LinearMixedModel.py`); the DEFAULT kinship path derives (V, S)
  * directly from a distributed thin SVD of the HWE-normalized genotype
  * `RowMatrix` (reference `methods/pca.py:100` blanczos /
  * `is/hail/methods/PCA.scala`) — the S×S GRM is never assembled,
  * no S²-row collect happens. A user-supplied K goes through a
  * driver-side `eigSym` into the same kernel. The per-variant pass is
  * one `mapPartitions` over the dosage rows with the broadcast basis —
  * no shuffle, no RDD zip. */
object Lmm {

  /** Spectral kinship basis: K = v·diag(s)·vᵀ with orthonormal columns;
    * v is n×r, s the r (non-negative) eigenvalues. */
  final case class SpectralKinship(v: BDM[Double], s: BDV[Double]) {
    require(v.cols == s.length)
    def n: Int = v.rows
    def r: Int = s.length
  }

  final case class LmmFit(delta: Double, sigmaG2: Double, h2: Double,
      logReml: Double, basis: SpectralKinship,
      vy: BDV[Double], vx: BDM[Double], // Vᵀy (r), VᵀX (r×k)
      yy: Double, xy: BDV[Double], xx: BDM[Double]) // raw Gram blocks

  /** REML fit from an explicit kinship matrix: driver-side eigSym into
    * the spectral kernel (full rank, r = n). */
  def fit(kinship: BDM[Double], y: BDV[Double], x: BDM[Double]): LmmFit = {
    val es = eigSym(kinship)
    fitSpectral(SpectralKinship(es.eigenvectors,
      es.eigenvalues.map(v => math.max(v, 0.0))), y, x)
  }

  /** REML fit of the variance-ratio δ by golden-section over log δ,
    * entirely on the O(rk) projected + O(k²) raw blocks. */
  def fitSpectral(basis: SpectralKinship, y: BDV[Double], x: BDM[Double])
      : LmmFit = {
    val n = y.length; val k = x.cols; val r = basis.r
    val vy = basis.v.t * y
    val vx = basis.v.t * x
    val yy = y dot y
    val xy = x.t * y
    val xx = x.t * x
    // weighted blocks at δ; w_i = 1/(s_i+δ) − 1/δ on the basis,
    // plus the isotropic 1/δ on the raw blocks
    def weighted(delta: Double): (BDM[Double], BDV[Double], Double, Double) = {
      val w = basis.s.map(si => 1.0 / (si + delta) - 1.0 / delta)
      val vxw = vx.copy
      var i = 0
      while (i < r) { vxw(i, ::) :*= w(i); i += 1 }
      val xwx = (xx * (1.0 / delta)) + (vx.t * vxw)
      val xwy = (xy * (1.0 / delta)) + (vx.t * (vy *:* w))
      val ywy = yy / delta + (vy dot (vy *:* w))
      var ld = (n - r) * math.log(delta)
      i = 0
      while (i < r) { ld += math.log(basis.s(i) + delta); i += 1 }
      (xwx, xwy, ywy, ld)
    }
    def remlNegLL(logDelta: Double): Double = {
      val delta = math.exp(logDelta)
      val (xwx, xwy, ywy, ld) = weighted(delta)
      val beta = xwx \ xwy
      val rss = ywy - (beta dot xwy)
      val sigma2 = rss / (n - k)
      val (_, ldXwx) = logdet(xwx)
      0.5 * ((n - k) * math.log(sigma2) + ld + ldXwx)
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
    val (xwx, xwy, ywy, _) = weighted(delta)
    val beta = xwx \ xwy
    val rss = ywy - (beta dot xwy)
    val sigmaG2 = rss / (n - k)
    LmmFit(delta, sigmaG2, 1.0 / (1.0 + delta), -remlNegLL(logDelta),
      basis, vy, vx, yy, xy, xx)
  }

  /** Default kinship basis (V, S) for the GRM K = MᵀM·(2/m) of the
    * HWE-normalized genotype matrix, via distributed thin SVD of the
    * variant-major `RowMatrix` — right singular vectors ARE the GRM
    * eigenvectors, squared singular values scale to its eigenvalues, so
    * the S×S matrix itself is never formed. `maxRank` truncates the
    * basis (FaST-LMM low-rank); default keeps every rank-revealing
    * component min(m, n). */
  def spectralGrm(mt: MatrixTable, maxRank: Option[Int] = None)
      : SpectralKinship = {
    val n = mt.nCols
    val (normRows, m) = Pca.hweNormalized(mt, scaleM = false)
    val vecRdd = normRows.select(col("__norm")).rdd
      .map(r => MlVectors.dense(r.getSeq[Double](0).toArray))
    vecRdd.cache() // computeSVD makes multiple passes
    try {
      val k = math.max(1, math.min(maxRank.getOrElse(n),
        math.min(n.toLong, m).toInt))
      val svd = new RowMatrix(vecRdd, m, n).computeSVD(k, computeU = false)
      val r = svd.s.size // values below rCond·σ₁ are dropped
      val scale = 2.0 / m
      val s = BDV.tabulate(r)(i => svd.s(i) * svd.s(i) * scale)
      val v = BDM.tabulate(n, r)((i, j) => svd.V(i, j))
      SpectralKinship(v, s)
    } finally vecRdd.unpersist(blocking = false)
  }

  /** Per-variant association under the fitted LMM: each mean-imputed
    * dosage vector g is projected onto the broadcast basis (Vᵀg) and the
    * augmented weighted normal equations [X̃ | g̃] are solved locally —
    * one narrow `mapPartitions`, no shuffle. Reports the genotype beta,
    * chi_sq (Wald) and p_value. `pheno` keyed by the col key supplies y
    * and covariates (intercept added). */
  def linearMixedRegressionRows(mt: MatrixTable,
      pheno: org.apache.spark.sql.DataFrame, yCol: String,
      covCols: Seq[String] = Nil,
      kinship: Option[BDM[Double]] = None,
      maxRank: Option[Int] = None): Table = {
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
    val f = kinship match {
      case Some(kin) => fit(kin, y, x) // explicit K: eigSym path
      case None => fitSpectral(spectralGrm(mt, maxRank), y, x)
    }
    val spark = mt.spark
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
    val k = covCols.length + 1
    val r = f.basis.r
    // fitted-δ weighted blocks, fixed across variants
    val delta = f.delta
    val w = f.basis.s.map(si => 1.0 / (si + delta) - 1.0 / delta)
    val vxw = f.vx.copy
    locally { var i = 0; while (i < r) { vxw(i, ::) :*= w(i); i += 1 } }
    val xwx = (f.xx * (1.0 / delta)) + (f.vx.t * vxw)
    val xwy = (f.xy * (1.0 / delta)) + (f.vx.t * (f.vy *:* w))
    val ywy = f.yy / delta + (f.vy dot (f.vy *:* w))
    val bc = spark.sparkContext.broadcast((
      f.basis.v.toArray, w.toArray, delta, // basis (n×r col-major)
      x.toArray, y.toArray, // raw design/pheno (n×k col-major, n)
      f.vx.toArray, f.vy.toArray, // projections (r×k col-major, r)
      xwx.toArray, xwy.toArray, ywy))
    val outRdd = withDose.rdd.mapPartitions { it =>
      val (vA, wA, dlt, xA, yA, vxA, vyA, xwxA, xwyA, ywyL) = bc.value
      it.map { row =>
        val key = row.getStruct(0)
        val g = row.getSeq[Double](1).toArray
        // projections and raw products of g in one pass each
        val vg = new Array[Double](r)
        var j = 0
        while (j < r) {
          var acc = 0.0; var i = 0; val off = j * n
          while (i < n) { acc += vA(off + i) * g(i); i += 1 }
          vg(j) = acc; j += 1
        }
        val gx = new Array[Double](k)
        var cIdx = 0
        while (cIdx < k) {
          var acc = 0.0; var i = 0; val off = cIdx * n
          while (i < n) { acc += xA(off + i) * g(i); i += 1 }
          gx(cIdx) = acc; cIdx += 1
        }
        var gy = 0.0; var gg = 0.0
        locally { var i = 0
          while (i < n) { gy += yA(i) * g(i); gg += g(i) * g(i); i += 1 } }
        // weighted blocks involving g
        var gWg = gg / dlt; var gWy = gy / dlt
        val gWX = Array.tabulate(k)(c => gx(c) / dlt)
        locally { var i = 0
          while (i < r) {
            val wv = wA(i) * vg(i)
            gWg += wv * vg(i)
            gWy += wv * vyA(i)
            var c = 0
            while (c < k) { gWX(c) += wv * vxA(c * r + i); c += 1 }
            i += 1
          } }
        // augmented (k+1)×(k+1) weighted normal equations
        val atwa = BDM.zeros[Double](k + 1, k + 1)
        locally { var a = 0
          while (a < k) {
            var b = 0
            while (b < k) { atwa(a, b) = xwxA(b * k + a); b += 1 }
            atwa(a, k) = gWX(a); atwa(k, a) = gWX(a)
            a += 1
          } }
        atwa(k, k) = gWg
        val rhs = BDV(xwyA :+ gWy)
        val sol =
          try Some(atwa \ rhs)
          catch { case _: Exception => None }
        sol match {
          case None => Row.fromSeq(key.toSeq ++
            Seq(null, null, null, null))
          case Some(beta) =>
            val rss = ywyL - (beta dot rhs)
            val sigma2 = rss / (n - k - 1)
            val cov =
              try inv(atwa)
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
  }
}
