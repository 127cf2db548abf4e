package graft.methods

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ld_score_regression (reference
  * `python/hail/experimental/ld_score_regression.py`, Bulik-Sullivan
  * 2015): estimate confounding (intercept) and SNP heritability from
  * GWAS chi-squared statistics regressed on LD scores, via the
  * reference's exact two-step estimator — step 1 fits intercept+slope
  * on variants with chi-sq below a threshold, step 2 re-fits the slope
  * with the step-1 intercept fixed, both iteratively reweighted 3x —
  * with block-jackknife standard errors combined across steps.
  *
  * Spark shape: the reference's per-entry scan/separator machinery
  * becomes a window scan plus CLOSED-FORM integer block assignment
  * (block = min(nB, ((idx+1)·nB − 1) div m1) — no 200-element literal
  * arrays per row). Each IRLS iteration is one per-phenotype weighted-
  * sum aggregation (the weighted linreg solved in closed form); the
  * whole jackknife needs ONE extra groupBy producing per-(phenotype,
  * block) sums, after which the leave-one-out algebra runs on nBlocks
  * driver-side rows. Total: ~8 small jobs regardless of variant count. */
object LdScoreRegression {

  /** `ds` is long-format summary statistics: one row per
    * (phenotype, variant). Rows with null weight/ld-score are dropped;
    * null chi-sq rows stay (they carry block-boundary information, as in
    * the reference). Returns one row per phenotype:
    * (phenotype, mean_chi_sq, intercept, intercept_standard_error,
    * snp_heritability, snp_heritability_standard_error). */
  def ldScoreRegression(ds: DataFrame, keyCols: Seq[String],
      phenoCol: String, chiSqCol: String, nSamplesCol: String,
      weightCol: String, ldScoreCol: String,
      nBlocks: Int = 200, twoStepThreshold: Double = 30.0,
      nIter: Int = 3,
      nReferencePanelVariants: Option[Long] = None): DataFrame = {
    val spark = ds.sparkSession
    val nB = nBlocks

    val w0 = ds
      .filter(col(weightCol).isNotNull && col(ldScoreCol).isNotNull &&
        keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        col(phenoCol).cast("string").as("__p"),
        col(chiSqCol).cast("double").as("__y"),
        col(nSamplesCol).cast("double").as("__n"),
        greatest(col(weightCol).cast("double"), lit(1.0)).as("__wf"),
        col(ldScoreCol).cast("double").as("__x"),
        greatest(col(ldScoreCol).cast("double"), lit(1.0)).as("__xf"),
        (col(chiSqCol).isNotNull &&
          col(chiSqCol) < twoStepThreshold).as("__in1"),
        col(chiSqCol).isNotNull.as("__in2"),
        struct(keyCols.map(col): _*).as("__k"))
    // exclusive running count of step-1 rows in key order per phenotype
    val win = Window.partitionBy(col("__p"))
      .orderBy(col("__k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val m1s = w0.groupBy("__p")
      .agg(sum(col("__in1").cast("long")).as("__m1"))
    val idx = coalesce(
      sum(col("__in1").cast("long")).over(win), lit(0L))
    // block of separator index idx: count of j in [0,nB] with
    // (j*m1) div nB <= idx, minus 1 = min(nB, ((idx+1)*nB - 1) div m1)
    def idiv(a: Column, b: Column): Column =
      floor(a.cast("double") / b.cast("double")).cast("long")
    val blk1 = when(col("__m1") > 0,
      least(lit(nB.toLong),
        idiv((col("__idx") + 1) * nB - 1, col("__m1")))).otherwise(0L)
    val isSep = idiv(col("__blk1") * col("__m1"), lit(nB.toLong)) ===
      col("__idx")
    val staged = w0
      .withColumn("__idx", idx)
      .join(broadcast(m1s), "__p")
      .withColumn("__blk1", blk1)
      .withColumn("__blk2",
        when(!col("__in1") && isSep, col("__blk1") - 1)
          .otherwise(col("__blk1")))
      .drop("__k")
      .localCheckpoint(false)

    val M = nReferencePanelVariants.getOrElse(
      staged.select("__p").groupBy("__p").count()
        .agg(max("count")).head().getLong(0)).toDouble

    // per-phenotype base statistics
    val baseStats = staged.groupBy("__p").agg(
      avg(col("__y")).as("meanY"),
      avg(col("__x")).as("meanX"),
      avg(when(col("__in2"), col("__n"))).as("meanN")).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val phenos = baseStats.keys.toSeq.sorted

    def betaMapDf(m: Map[String, (Double, Double)]): DataFrame =
      spark.createDataFrame(m.toSeq.map { case (p, (b0, b1)) =>
        (p, b0, b1) }).toDF("__p", "__b0", "__b1")

    // weight from the betas of the PREVIOUS iteration (the reference's
    // entry __w), for rows inside `flag`
    def wExpr: Column = lit(1.0) / (col("__wf") * 2.0 *
      pow(col("__b0") + col("__b1") * col("__xf"), 2))

    // ---- step 1: IRLS intercept+slope on the sub-threshold variants ----
    val initial = phenos.map { p =>
      val (my, mx, _) = baseStats(p)
      p -> ((1.0, (my - 1.0) / mx))
    }.toMap
    var step1 = initial
    var w1Betas = initial // betas defining the weights of the LAST fit
    for (_ <- 1 to nIter) {
      w1Betas = step1
      val sums = staged.join(broadcast(betaMapDf(step1)), "__p")
        .filter(col("__in1"))
        .withColumn("__w", wExpr)
        .groupBy("__p").agg(
          sum(col("__w")).as("sw"),
          sum(col("__w") * col("__x")).as("swx"),
          sum(col("__w") * col("__x") * col("__x")).as("swxx"),
          sum(col("__w") * col("__y")).as("swy"),
          sum(col("__w") * col("__x") * col("__y")).as("swxy"))
        .collect()
      step1 = sums.map { r =>
        val p = r.getString(0)
        val (sw, swx, swxx, swy, swxy) = (r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))
        val b1 = (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
        val b0 = (swy - b1 * swx) / sw
        val meanN = baseStats(p)._3
        val h2 = math.max(math.min(b1 * M / meanN, 1.0), 0.0)
        p -> ((b0, h2 * meanN / M))
      }.toMap
    }

    // ---- step 2: IRLS slope-only on y − b0_step1, all defined variants --
    var step2 = initial.map { case (p, _) => p -> initial(p) }
    var w2Betas = initial
    val b0Fixed = step1.map { case (p, (b0, _)) => p -> b0 }
    for (_ <- 1 to nIter) {
      w2Betas = step2
      val sums = staged.join(broadcast(betaMapDf(step2)), "__p")
        .filter(col("__in2"))
        .withColumn("__w", wExpr)
        .groupBy("__p").agg(
          sum(col("__w") * col("__x") * col("__x")).as("swxx"),
          sum(col("__w") * col("__x") * col("__y")).as("swxy"),
          sum(col("__w") * col("__x")).as("swx"))
        .collect()
      step2 = sums.map { r =>
        val p = r.getString(0)
        val (swxx, swxy, swx) =
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))
        val b0 = b0Fixed(p)
        val b1 = (swxy - b0 * swx) / swxx
        val meanN = baseStats(p)._3
        val h2 = math.max(math.min(b1 * M / meanN, 1.0), 0.0)
        p -> ((b0, h2 * meanN / M))
      }.toMap
    }

    // ---- one job: per-(phenotype, blk1, blk2) sums for both jackknifes
    // and the step-combination constant --------------------------------
    def wOf(bm: Map[String, (Double, Double)], suffix: String) = {
      val df = betaMapDf(bm)
        .withColumnRenamed("__b0", s"__b0$suffix")
        .withColumnRenamed("__b1", s"__b1$suffix")
      df
    }
    val withW = staged
      .join(broadcast(wOf(w1Betas, "_1")), "__p")
      .join(broadcast(wOf(w2Betas, "_2")), "__p")
      .join(broadcast(wOf(initial, "_0")), "__p")
      .withColumn("__w1", when(col("__in1"), lit(1.0) / (col("__wf") *
        2.0 * pow(col("__b0_1") + col("__b1_1") * col("__xf"), 2)))
        .otherwise(0.0))
      .withColumn("__w2", when(col("__in2"), lit(1.0) / (col("__wf") *
        2.0 * pow(col("__b0_2") + col("__b1_2") * col("__xf"), 2)))
        .otherwise(0.0))
      .withColumn("__w0", lit(1.0) / (col("__wf") * 2.0 *
        pow(col("__b0_0") + col("__b1_0") * col("__xf"), 2)))
    val blockSums = withW.groupBy(col("__p"), col("__blk1"), col("__blk2"))
      .agg(
        sum(when(col("__in1"), col("__w1")).otherwise(0.0)).as("s1w"),
        sum(when(col("__in1"), col("__w1") * col("__x"))
          .otherwise(0.0)).as("s1wx"),
        sum(when(col("__in1"), col("__w1") * col("__x") * col("__x"))
          .otherwise(0.0)).as("s1wxx"),
        sum(when(col("__in1"), col("__w1") * col("__y"))
          .otherwise(0.0)).as("s1wy"),
        sum(when(col("__in1"), col("__w1") * col("__x") * col("__y"))
          .otherwise(0.0)).as("s1wxy"),
        sum(when(col("__in2"), col("__w2") * col("__x") * col("__x"))
          .otherwise(0.0)).as("s2wxx"),
        sum(when(col("__in2"), col("__w2") * col("__x") * col("__y"))
          .otherwise(0.0)).as("s2wxy"),
        sum(when(col("__in2"), col("__w2") * col("__x"))
          .otherwise(0.0)).as("s2wx"),
        sum(col("__w0") * col("__x")).as("s0wx"),
        sum(col("__w0") * col("__x") * col("__x")).as("s0wxx"))
      .collect()

    val perPheno = blockSums.groupBy(_.getString(0))

    val out = phenos.map { p =>
      val rows = perPheno.getOrElse(p, Array.empty[Row])
      // accumulate into per-block1 and per-block2 sum vectors; blk2
      // can be -1 (the reference's idx-0 separator case) -> bucket 0 of
      // a +1-shifted array, counted in totals but never left out
      val b1s = Array.fill(nB + 1)(new Array[Double](5))
      val b2s = Array.fill(nB + 2)(new Array[Double](3))
      val tot1 = new Array[Double](5)
      val tot2 = new Array[Double](3)
      var c0num = 0.0; var c0den = 0.0
      rows.foreach { r =>
        val k1 = r.getLong(1).toInt.min(nB)
        val k2 = r.getLong(2).toInt.min(nB) + 1 // -1..nB -> 0..nB+1
        val v1 = Array(r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7))
        val v2 = Array(r.getDouble(8), r.getDouble(9), r.getDouble(10))
        for (i <- 0 until 5) { b1s(k1)(i) += v1(i); tot1(i) += v1(i) }
        for (i <- 0 until 3) { b2s(k2)(i) += v2(i); tot2(i) += v2(i) }
        c0num += r.getDouble(11); c0den += r.getDouble(12)
      }
      def fit1(s: Array[Double]): (Double, Double) = {
        val Array(sw, swx, swxx, swy, swxy) = s
        val b1 = (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
        (if (sw != 0) (swy - b1 * swx) / sw else Double.NaN, b1)
      }
      val b0 = b0Fixed(p)
      def fit2(s: Array[Double]): Double = {
        val Array(swxx, swxy, swx) = s
        (swxy - b0 * swx) / swxx
      }
      val (fin0, fin1) = (step1(p)._1, step2(p)._2)
      // leave-one-out fits per block
      val loo1 = (0 until nB).map { i =>
        fit1(Array.tabulate(5)(j => tot1(j) - b1s(i)(j)))
      }
      val loo2 = (0 until nB).map { i =>
        fit2(Array.tabulate(3)(j => tot2(j) - b2s(i + 1)(j)))
      }
      // step-1 intercept jackknife (bias-corrected pseudo-values)
      val s1b = step1(p)
      val pv0 = loo1.map(x => nB * s1b._1 - (nB - 1) * x._1)
      val var0 = (pv0.map(v => v * v).sum -
        math.pow(pv0.sum, 2) / nB) / (nB - 1) / nB
      // combined final-slope jackknife
      val c = c0num / c0den
      val finalBlock = (0 until nB).map(i =>
        loo2(i) - c * (loo1(i)._1 - fin0))
      val pv1 = finalBlock.map(x => nB * fin1 - (nB - 1) * x)
      val var1 = (pv1.map(v => v * v).sum -
        math.pow(pv1.sum, 2) / nB) / (nB - 1) / nB
      val meanN = baseStats(p)._3
      (p, baseStats(p)._1,
        fin0, math.sqrt(var0),
        (M / meanN) * fin1, math.sqrt((M / meanN) * (M / meanN) * var1))
    }
    spark.createDataFrame(out).toDF("phenotype", "mean_chi_sq",
      "intercept", "intercept_standard_error",
      "snp_heritability", "snp_heritability_standard_error")
  }
}
