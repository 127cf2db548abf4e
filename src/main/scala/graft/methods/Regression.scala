package graft.methods

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
