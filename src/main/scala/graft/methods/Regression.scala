package graft.methods

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.UserDefinedFunction

import graft.{MatrixTable, Table}
import graft.functions.{Calls, StatTests}
import graft.operators.Aggs

/** GWAS regressions (reference `python/hail/methods/statgen.py:235`
  * `linear_regression_rows`; Scala kernel
  * `is/hail/methods/LinearRegression.scala`).
  *
  * Spark shape: the per-variant regression is a grouped aggregation over
  * the coordinate representation — `groupBy(variant)` with the custom
  * X'X/X'y/y'y `Aggregator` (constant-size buffer, partial/final hash agg,
  * no driver funnel). Missing genotypes are mean-imputed per variant via a
  * window over the same variant partitioning, which Catalyst satisfies
  * with the SAME hash exchange as the groupBy — one shuffle total, at any
  * number of variants × samples. Phenotypes/covariates arrive as a small
  * per-sample table broadcast onto the coordinate rows. */
object Regression {

  /** Per-variant OLS of `yCol` on genotype dosage (n alt alleles) plus
    * `covCols`, with intercept. Returns the variant-keyed Table with
    * beta/standard_error/t_stat/p_value for the genotype term (reference
    * field names), plus n. `pheno` must be keyed by the matrix col key. */
  def linearRegressionRows(mt: MatrixTable, pheno: DataFrame,
      yCol: String, covCols: Seq[String] = Nil): Table = {
    val k = 2 + covCols.length // intercept + genotype + covariates
    val e = mt.entriesTable.df
      .join(broadcast(pheno), mt.colKey, "inner")
    val keyCols = mt.rowKey.map(col)
    // mean-impute missing genotype dosage per variant (reference behavior);
    // the window's hash partitioning is reused by the groupBy below
    val w = Window.partitionBy(keyCols: _*)
    val rawX = Calls.nNonRefAlleles(col("GT")).cast("double")
    val x = coalesce(rawX, avg(rawX).over(w))
    val xs = array((lit(1.0) +: x +: covCols.map(c => col(c).cast("double")))
      : _*)
    val fit = e
      .withColumn("__xs", xs)
      .groupBy(keyCols: _*)
      .agg(Aggs.linreg(col(yCol).cast("double"), col("__xs"), k).as("__fit"))
    val beta = element_at(col("__fit")("beta"), 2)
    val se = element_at(col("__fit")("standard_error"), 2)
    val n = col("__fit")("n")
    val t = beta / se
    val out = fit
      .withColumn("n", n)
      .withColumn("beta", beta)
      .withColumn("standard_error", se)
      .withColumn("t_stat", t)
      .withColumn("p_value", StatTests.pT(t, (n - k).cast("double")))
      .drop("__fit")
    Table(out, mt.rowKey, mt.globals)
  }

  /** Multi-phenotype linear_regression_rows (the reference's list-of-y
    * mode, `statgen.py linear_regression_rows` with `y=[..]`): one scan
    * and one shuffle fit ALL phenotypes — the per-variant design matrix
    * is shared, each y adds only an extra aggregation buffer. Mirrors
    * the reference's complete-case rule for the multi-y mode: samples
    * missing ANY phenotype are dropped for all of them, so `n` is one
    * number per variant. Returns arrays indexed like `yCols` for
    * beta / standard_error / t_stat / p_value. */
  def linearRegressionRowsMulti(mt: MatrixTable, pheno: DataFrame,
      yCols: Seq[String], covCols: Seq[String] = Nil): Table = {
    require(yCols.nonEmpty)
    val k = 2 + covCols.length
    val completeCase = yCols.map(c => col(c).isNotNull)
      .reduce(_ && _)
    val e = mt.entriesTable.df
      .join(broadcast(pheno.filter(completeCase)), mt.colKey, "inner")
    val keyCols = mt.rowKey.map(col)
    val w = Window.partitionBy(keyCols: _*)
    val rawX = Calls.nNonRefAlleles(col("GT")).cast("double")
    val x = coalesce(rawX, avg(rawX).over(w))
    val xs = array((lit(1.0) +: x +: covCols.map(c =>
      col(c).cast("double"))): _*)
    val fits = yCols.zipWithIndex.map { case (y, i) =>
      Aggs.linreg(col(y).cast("double"), col("__xs"), k).as(s"__fit$i")
    }
    val fit = e.withColumn("__xs", xs)
      .groupBy(keyCols: _*)
      .agg(fits.head, fits.tail: _*)
    def over(f: Column => Column): Column =
      array(yCols.indices.map(i => f(col(s"__fit$i"))): _*)
    val beta = over(f => element_at(f("beta"), 2))
    val se = over(f => element_at(f("standard_error"), 2))
    val n = col("__fit0")("n")
    val out = fit
      .withColumn("n", n)
      .withColumn("beta", beta)
      .withColumn("standard_error", se)
      .withColumn("t_stat",
        zip_with(beta, se, (b, s) => b / s))
      .withColumn("p_value", transform(
        zip_with(beta, se, (b, s) => b / s),
        t => StatTests.pT(t, (n - k).cast("double"))))
      .drop(yCols.indices.map(i => s"__fit$i"): _*)
    Table(out, mt.rowKey, mt.globals)
  }

  /** Newton-Raphson logistic fit on one variant's collected design matrix
    * (samples per variant — thousands — fit locally per group, exactly the
    * reference's per-variant kernel shape,
    * `is/hail/methods/LogisticRegression.scala`). Returns
    * (beta, se, z, p, converged) for the x term (index 1). */
  private val logisticFit: UserDefinedFunction = udf {
    (xs: Seq[Seq[Double]], ys: Seq[Double]) =>
      val n = xs.length
      if (n == 0) (Double.NaN, Double.NaN, Double.NaN, Double.NaN, false)
      else {
        val k = xs.head.length
        val X = breeze.linalg.DenseMatrix(xs.map(_.toArray): _*)
        val y = breeze.linalg.DenseVector(ys.toArray)
        var beta = breeze.linalg.DenseVector.zeros[Double](k)
        var converged = false
        var iter = 0
        var H = breeze.linalg.DenseMatrix.zeros[Double](k, k)
        while (!converged && iter < 25) {
          val eta = X * beta
          val mu = eta.map(e => 1.0 / (1.0 + math.exp(-e)))
          val w = mu.map(m => m * (1.0 - m))
          val grad = X.t * (y - mu)
          val Xw = X.copy
          var i = 0
          while (i < n) {
            var j = 0
            while (j < k) { Xw(i, j) = X(i, j) * w(i); j += 1 }
            i += 1
          }
          H = X.t * Xw
          val step =
            try H \ grad
            catch { case _: Exception =>
              breeze.linalg.DenseVector.fill(k)(Double.NaN) }
          beta = beta + step
          iter += 1
          converged = breeze.linalg.norm(grad) < 1e-6
        }
        if (!converged || beta.exists(_.isNaN))
          (Double.NaN, Double.NaN, Double.NaN, Double.NaN, false)
        else {
          val hinv: breeze.linalg.DenseMatrix[Double] = breeze.linalg.inv(H)
          val se = math.sqrt(hinv(1, 1))
          val z = beta(1) / se
          val p = 2.0 * (1.0 - new org.apache.commons.math3.distribution
            .NormalDistribution().cumulativeProbability(math.abs(z)))
          (beta(1), se, z, p, true)
        }
      }
  }

  /** Newton-Raphson Poisson (log link) fit — same shape as
    * `logisticFit` with mu = exp(eta), W = mu (reference
    * `statgen.py:1650` `poisson_regression_rows`,
    * `PoissonRegression.scala`). */
  private val poissonFit: UserDefinedFunction = udf {
    (xs: Seq[Seq[Double]], ys: Seq[Double]) =>
      val n = xs.length
      if (n == 0) (Double.NaN, Double.NaN, Double.NaN, Double.NaN, false)
      else {
        val k = xs.head.length
        val X = breeze.linalg.DenseMatrix(xs.map(_.toArray): _*)
        val y = breeze.linalg.DenseVector(ys.toArray)
        var beta = breeze.linalg.DenseVector.zeros[Double](k)
        var converged = false
        var iter = 0
        var H = breeze.linalg.DenseMatrix.zeros[Double](k, k)
        while (!converged && iter < 25) {
          val mu = (X * beta).map(math.exp)
          val grad = X.t * (y - mu)
          val Xw = X.copy
          var i = 0
          while (i < n) {
            var j = 0
            while (j < k) { Xw(i, j) = X(i, j) * mu(i); j += 1 }
            i += 1
          }
          H = X.t * Xw
          val step =
            try H \ grad
            catch { case _: Exception =>
              breeze.linalg.DenseVector.fill(k)(Double.NaN) }
          beta = beta + step
          iter += 1
          converged = breeze.linalg.norm(grad) < 1e-8
        }
        if (!converged || beta.exists(_.isNaN))
          (Double.NaN, Double.NaN, Double.NaN, Double.NaN, false)
        else {
          val hinv: breeze.linalg.DenseMatrix[Double] = breeze.linalg.inv(H)
          val se = math.sqrt(hinv(1, 1))
          val z = beta(1) / se
          val p = 2.0 * (1.0 - new org.apache.commons.math3.distribution
            .NormalDistribution().cumulativeProbability(math.abs(z)))
          (beta(1), se, z, p, true)
        }
      }
  }

  /** poisson_regression_rows, Wald (reference `statgen.py:1650`): per-
    * variant Poisson regression of count `yCol` on `xOf(GT)` plus
    * covariates with intercept; complete-case, same distribution shape
    * as the logistic path. */
  def poissonRegressionRows(mt: MatrixTable, pheno: DataFrame,
      yCol: String, covCols: Seq[String] = Nil,
      xOf: Column => Column = Calls.nNonRefAlleles(_).cast("double"))
      : Table = {
    val e = mt.entriesTable.df
      .join(broadcast(pheno), mt.colKey, "inner")
      .filter(col("GT").isNotNull && col(yCol).isNotNull)
    val x = xOf(col("GT"))
    val xs = array((lit(1.0) +: x +: covCols.map(c =>
      col(c).cast("double"))): _*)
    val keyCols = mt.rowKey.map(col)
    val fit = e
      .withColumn("__xs", xs)
      .groupBy(keyCols: _*)
      .agg(
        poissonFit(collect_list(col("__xs")),
          collect_list(col(yCol).cast("double"))).as("__fit"),
        count(lit(1)).as("n"))
    Table(fit
      .withColumn("beta", col("__fit")("_1"))
      .withColumn("standard_error", col("__fit")("_2"))
      .withColumn("z_stat", col("__fit")("_3"))
      .withColumn("p_value", col("__fit")("_4"))
      .withColumn("converged", col("__fit")("_5"))
      .drop("__fit"), mt.rowKey, mt.globals)
  }

  /** Newton (optionally Firth-penalized) logistic fit on a local design.
    * Returns (beta, observed information at the optimum, log-likelihood —
    * penalized by 0.5·logdet(I) when `firth` — and convergence flag).
    * Firth's adjusted score (Firth 1993; the reference's
    * `LogisticRegressionModel` firth path) adds h_i(0.5 − mu_i) to each
    * residual, h the hat-matrix diagonal. */
  private def fitLogisticLocal(X: breeze.linalg.DenseMatrix[Double],
      y: breeze.linalg.DenseVector[Double], firth: Boolean)
      : (breeze.linalg.DenseVector[Double],
        breeze.linalg.DenseMatrix[Double], Double, Boolean) = {
    import breeze.linalg._
    val n = X.rows; val k = X.cols
    var beta = DenseVector.zeros[Double](k)
    var info = DenseMatrix.zeros[Double](k, k)
    var converged = false
    var iter = 0
    while (!converged && iter < 100) {
      val eta = X * beta
      val mu = eta.map(e => 1.0 / (1.0 + math.exp(-e)))
      val w = mu.map(m => m * (1.0 - m))
      val Xw = X(::, *) *:* w
      info = X.t * Xw
      val resid = y - mu
      if (firth) {
        // singular information (collinear/constant design): no penalized
        // fit exists — bail out as non-converged instead of throwing
        // (the UDF must be total; Spark may evaluate it on rows a later
        // filter would drop)
        val infoInv =
          try inv(info)
          catch { case _: Exception => null }
        if (infoInv == null) {
          beta = DenseVector.fill(k)(Double.NaN)
          iter = 100
        } else {
          var i = 0
          while (i < n) {
            val xi = X(i, ::).t
            val h = w(i) * (xi dot (infoInv * xi))
            resid(i) += h * (0.5 - mu(i))
            i += 1
          }
        }
      }
      val grad = X.t * resid
      val step =
        try info \ grad
        catch { case _: Exception => DenseVector.fill(k)(Double.NaN) }
      beta = beta + step
      iter += 1
      converged = norm(step) < 1e-7 && !step.exists(_.isNaN)
      if (step.exists(_.isNaN)) iter = 100
    }
    val eta = X * beta
    // stable log(1 + e^eta) = max(eta, 0) + log1p(e^-|eta|)
    var ll = 0.0
    var i = 0
    while (i < y.length) {
      ll += y(i) * eta(i) -
        (math.max(eta(i), 0.0) + math.log1p(math.exp(-math.abs(eta(i)))))
      i += 1
    }
    if (firth && converged) {
      val mu = eta.map(e => 1.0 / (1.0 + math.exp(-e)))
      val w = mu.map(m => m * (1.0 - m))
      info = X.t * (X(::, *) *:* w)
      try {
        val c = cholesky(info)
        ll += (0 until k).map(j => math.log(c(j, j))).sum
      } catch { case _: Exception => converged = false }
    }
    (beta, info, ll, converged)
  }

  private def chiSqTail1(x: Double): Double =
    // clamp at 0: the firth penalized deviance of nested fits can land
    // epsilon-negative (the penalties have different dimension)
    if (x <= 0) 1.0
    else 1.0 - org.apache.commons.math3.special.Gamma
      .regularizedGammaP(0.5, x / 2.0)

  /** UDF for the lrt/score/firth logistic tests (reference
    * `LogisticRegression.scala` wald/lrt/score/firth kernels; per-variant
    * complete-case, so the null model refits on each variant's called
    * samples). Column 1 of the design is the tested genotype term.
    * Returns (beta, se, chi_sq, p, converged). */
  private def logisticTestUdf(test: String): UserDefinedFunction = udf {
    (xs: Seq[Seq[Double]], ys: Seq[Double]) =>
      import breeze.linalg._
      val bad = (null: java.lang.Double, null: java.lang.Double,
        null: java.lang.Double, null: java.lang.Double, false)
      val n = xs.length
      if (n == 0) bad
      else {
        val k = xs.head.length
        val X = DenseMatrix(xs.map(_.toArray): _*)
        val y = DenseVector(ys.toArray)
        val nullCols = (0 until k).filter(_ != 1)
        val Xn = X(::, nullCols).toDenseMatrix
        test match {
          case "lrt" | "firth" =>
            val firth = test == "firth"
            val (bF, iF, llF, cF) = fitLogisticLocal(X, y, firth)
            val (_, _, ll0, c0) = fitLogisticLocal(Xn, y, firth)
            if (!cF || !c0) bad
            else {
              val chi2 = 2.0 * (llF - ll0)
              val se =
                try {
                  val iFInv: DenseMatrix[Double] = inv(iF)
                  math.sqrt(iFInv(1, 1))
                } catch { case _: Exception => Double.NaN }
              (java.lang.Double.valueOf(bF(1)),
                java.lang.Double.valueOf(se),
                java.lang.Double.valueOf(chi2),
                java.lang.Double.valueOf(chiSqTail1(chi2)), true)
            }
          case "score" =>
            val (b0, _, _, c0) = fitLogisticLocal(Xn, y, firth = false)
            if (!c0) bad
            else {
              // beta at the null: fitted for untested terms, 0 for x
              val mu0 = (Xn * b0).map(e => 1.0 / (1.0 + math.exp(-e)))
              val w0 = mu0.map(m => m * (1.0 - m))
              val u = X.t * (y - mu0)
              val info = X.t * (X(::, *) *:* w0)
              val stat =
                try u dot (info \ u)
                catch { case _: Exception => Double.NaN }
              if (stat.isNaN) bad
              else (null: java.lang.Double, null: java.lang.Double,
                java.lang.Double.valueOf(stat),
                java.lang.Double.valueOf(chiSqTail1(stat)), true)
            }
        }
      }
  }

  /** logistic_regression_rows (reference `statgen.py:731`): per-variant
    * logistic regression of binary `yCol` on `xOf(GT)` plus covariates
    * with intercept; `test` selects wald (default) / lrt / score / firth
    * (`is/hail/methods/LogisticRegression.scala` implements the same
    * four). The per-variant design (n samples × k) is collected into the
    * group and fitted locally — bounded by sample count, distributed
    * across variants. Rows with missing GT or y are dropped
    * (complete-case). Wald emits beta/standard_error/z_stat/p_value;
    * lrt/firth emit beta/standard_error/chi_sq_stat/p_value; score emits
    * chi_sq_stat/p_value. */
  def logisticRegressionRows(mt: MatrixTable, pheno: DataFrame,
      yCol: String, covCols: Seq[String] = Nil,
      xOf: Column => Column = Calls.nNonRefAlleles(_).cast("double"),
      test: String = "wald"): Table = {
    require(Set("wald", "lrt", "score", "firth").contains(test),
      s"unknown logistic test $test")
    val e = mt.entriesTable.df
      .join(broadcast(pheno), mt.colKey, "inner")
      .filter(col("GT").isNotNull && col(yCol).isNotNull)
    val x = xOf(col("GT"))
    val xs = array((lit(1.0) +: x +: covCols.map(c =>
      col(c).cast("double"))): _*)
    val keyCols = mt.rowKey.map(col)
    val fitUdf = if (test == "wald") logisticFit else logisticTestUdf(test)
    val fit = e
      .withColumn("__xs", xs)
      .groupBy(keyCols: _*)
      .agg(
        fitUdf(collect_list(col("__xs")),
          collect_list(col(yCol).cast("double"))).as("__fit"),
        count(lit(1)).as("n"))
    val out = test match {
      case "wald" =>
        fit.withColumn("beta", col("__fit")("_1"))
          .withColumn("standard_error", col("__fit")("_2"))
          .withColumn("z_stat", col("__fit")("_3"))
          .withColumn("p_value", col("__fit")("_4"))
          .withColumn("converged", col("__fit")("_5"))
      case "score" =>
        fit.withColumn("chi_sq_stat", col("__fit")("_3"))
          .withColumn("p_value", col("__fit")("_4"))
          .withColumn("converged", col("__fit")("_5"))
      case _ =>
        fit.withColumn("beta", col("__fit")("_1"))
          .withColumn("standard_error", col("__fit")("_2"))
          .withColumn("chi_sq_stat", col("__fit")("_3"))
          .withColumn("p_value", col("__fit")("_4"))
          .withColumn("converged", col("__fit")("_5"))
    }
    Table(out.drop("__fit"), mt.rowKey, mt.globals)
  }
}
