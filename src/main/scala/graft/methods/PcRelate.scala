package graft.methods

import breeze.linalg.{inv, qr, DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.mllib.linalg.{Vectors => MlVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

import graft.MatrixTable
import graft.functions.Calls

/** pc_relate (reference `methods/relatedness/pc_relate.py`,
  * `is/hail/methods/PCRelate.scala`): PCA-adjusted kinship (phi) and
  * IBD0/1/2 estimates that stay calibrated under population structure.
  * Individual-specific allele frequencies mu come from regressing the
  * mean-imputed dosage on the top PCs (plus intercept); entries with a
  * non-integral (imputed) dosage or out-of-range mu are excluded
  * pairwise, exactly the reference's badgt/badmu masking.
  *
  * Spark shape: the reference computes ~8 sample×sample BlockMatrix
  * products; here all of them come out of ONE stacked-indicator Gramian
  * (`RowMatrix.computeGramianMatrix`, a distributed treeAggregate over
  * the variant dimension) of width 8S:
  * [A=g/2−mu | S=sqrt(var) | homalt | homref | mu² | (1−mu)² | GD | var],
  * with the phi-diagonal-dependent k2 product expanded algebraically
  * (DᵀD = GDᵀGD − c_j·GDᵀV − c_i·VᵀGD + c_i c_j·VᵀV). Local result is
  * 64S² doubles — the `Pca.grm` driver-size contract; swap in MLlib
  * BlockMatrix.multiply past ~10k samples. */
object PcRelate {

  private val K0Cutoff = math.pow(2.0, -5.0 / 2.0)

  /** `scores`: per-sample PC score arrays aligned with `mt.colValues`
    * order (e.g. `Pca.hweNormalizedPca(mt, k).scores` collected); pass
    * zero-length arrays for an intercept-only (unadjusted) model.
    * Returns (i, j, kin, ibd0, ibd1, ibd2) for column-index pairs
    * i < j (plus i = j when `includeSelfKinship`). */
  def pcRelate(mt: MatrixTable, scoresBySample: IndexedSeq[Array[Double]],
      minIndividualMaf: Double, minKinship: Double = Double.NegativeInfinity,
      includeSelfKinship: Boolean = false): DataFrame = {
    val n = mt.nCols
    require(scoresBySample.length == n, "one score array per sample")
    val kPcs = scoresBySample.headOption.map(_.length).getOrElse(0)
    // X = [1 | scores]; half-projection matrix inv(2R)·Qᵀ, so that
    // mu-column_v = X · (inv(2R)Qᵀ · g_v) (the reference's `mu`)
    val x = BDM.tabulate(n, kPcs + 1)((i, j) =>
      if (j == 0) 1.0 else scoresBySample(i)(j - 1))
    val qrRes = qr.reduced(x)
    val halfProj: BDM[Double] = inv(qrRes.r * 2.0) * qrRes.q.t // (k+1)×n

    val doseArr = transform(mt.entries,
      e => Calls.nNonRefAlleles(e("GT")).cast("double"))
    val called = filter(col("__d"), v => v.isNotNull)
    val meanG = when(size(called) > 0,
      aggregate(called, lit(0.0), (a, v) => a + v) /
        size(called).cast("double"))
    // STAGED projections: each expensive array becomes a named column
    // referenced many times downstream — CollapseProject keeps
    // multiply-referenced non-trivial aliases materialized, so the source
    // parse / imputation expressions evaluate ONCE per row instead of
    // being inlined into every one of the 8n block expressions (which
    // blew the expression tree past codegen limits).
    val d1 = mt.rows.select(doseArr.as("__d"))
      .select(col("__d"), meanG.as("__mean")) // hoisted: once per row
      .select(transform(col("__d"),
        v => coalesce(v, col("__mean"))).as("__g"))
    val hbArr = array((0 to kPcs).map { j =>
      (0 until n).map(i =>
        element_at(col("__g"), i + 1) * halfProj(j, i)).reduce(_ + _)
    }: _*)
    val d2 = d1.select(col("__g"), hbArr.as("__hb"))
    val muArr = array((0 until n).map { s =>
      (0 to kPcs).map(j =>
        lit(x(s, j)) * element_at(col("__hb"), j + 1)).reduce(_ + _)
    }: _*)
    val d3 = d2.select(col("__g"), muArr.as("__mu"))
    // per-sample blocks over cheap element_at references
    val blocks: Seq[Column] = {
      val perSample = (0 until n).map { s =>
        val g = element_at(col("__g"), s + 1)
        val mu = element_at(col("__mu"), s + 1)
        val badgt = g =!= 0.0 && g =!= 1.0 && g =!= 2.0
        val badmu = mu <= minIndividualMaf ||
          mu >= 1.0 - minIndividualMaf || mu <= 0.0 || mu >= 1.0
        val bad = g.isNull || badgt || badmu
        val variance = mu * (lit(1.0) - mu)
        val gd = when(g === 0.0, mu).when(g === 1.0, lit(0.0))
          .otherwise(lit(1.0) - mu)
        Seq(
          when(bad, 0.0).otherwise(g / 2.0 - mu), // A
          when(bad, 0.0).otherwise(sqrt(variance)), // S
          when(bad || g =!= 2.0, 0.0).otherwise(1.0), // homalt
          when(bad || g =!= 0.0, 0.0).otherwise(1.0), // homref
          when(bad, 0.0).otherwise(mu * mu), // mu²
          when(bad, 0.0).otherwise((lit(1.0) - mu) * (lit(1.0) - mu)),
          when(bad, 0.0).otherwise(gd), // GD
          when(bad, 0.0).otherwise(variance)) // V
      }
      (0 until 8).map(b => array(perSample.map(_(b)): _*))
    }
    val vec = concat(blocks: _*)
    val vecRdd = d3.select(vec.as("__v")).rdd
      .map(r => MlVectors.dense(r.getSeq[Double](0).toArray))
    val g = new RowMatrix(vecRdd).computeGramianMatrix()
    // block b, sample s -> column b*n + s
    def blk(b1: Int, i: Int, b2: Int, j: Int): Double =
      g(b1 * n + i, b2 * n + j)
    val A = 0; val S = 1; val HA = 2; val HR = 3
    val MU2 = 4; val OM2 = 5; val GD = 6; val V = 7
    def phiOf(i: Int, j: Int): Double = {
      val den = blk(S, i, S, j)
      if (den > 0) blk(A, i, A, j) / den else Double.NaN
    }
    val c = Array.tabulate(n)(i => 2.0 * phiOf(i, i))
    val rows = for {
      i <- 0 until n
      j <- i until n
      if includeSelfKinship || j > i
    } yield {
      val phi = phiOf(i, j)
      val vv = blk(V, i, V, j)
      val k2 =
        if (vv > 0)
          (blk(GD, i, GD, j) - c(j) * blk(GD, i, V, j) -
            c(i) * blk(V, i, GD, j) + c(i) * c(j) * vv) / vv
        else Double.NaN
      val ibs0 = blk(HA, i, HR, j) + blk(HR, i, HA, j)
      val denom = blk(MU2, i, OM2, j) + blk(OM2, i, MU2, j)
      val k0 =
        if (phi.isNaN || k2.isNaN) Double.NaN
        else if (phi <= K0Cutoff) 1.0 - 4.0 * phi + k2
        else if (denom > 0) ibs0 / denom
        else Double.NaN
      val k1 = 1.0 - (k2 + k0)
      Row(i, j, phi, k0, k1, k2)
    }
    val kept = rows.filter(r => {
      val kin = r.getDouble(2)
      !(kin < minKinship) // NaN kinship passes, like map-side filters
    })
    mt.spark.createDataFrame(
      mt.spark.sparkContext.parallelize(kept.toSeq, 1),
      StructType(Seq(
        StructField("i", org.apache.spark.sql.types.IntegerType, false),
        StructField("j", org.apache.spark.sql.types.IntegerType, false),
        StructField("kin", DoubleType),
        StructField("ibd0", DoubleType),
        StructField("ibd1", DoubleType),
        StructField("ibd2", DoubleType))))
  }

  /** Convenience: compute scores with `Pca.hweNormalizedPca(mt, k)` and
    * run pc_relate on them (the python wrapper's `k=` path). */
  def pcRelate(mt: MatrixTable, k: Int, minIndividualMaf: Double)
      : DataFrame = {
    val scores = Pca.hweNormalizedPca(mt, k).scores
      .select(col("scores")).collect()
      .map(_.getSeq[Double](0).toArray).toIndexedSeq
    pcRelate(mt, scores, minIndividualMaf)
  }
}
