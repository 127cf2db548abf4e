package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The arithmetic core of the de novo caller as ONE fused kernel
  * (reference `family_methods.py:564`): per trio entry, the
  * PL-normalized genotype probabilities, AD sums / allele-balance
  * ratios, depth ratio, and the three posterior probabilities
  * (autosomal + both hemizygous modes).
  *
  * Why a kernel: these values are each referenced several times by the
  * confidence CASE chains, and the optimizer's extract-value
  * simplification re-inlines any struct-staged Column formulation back
  * into every reference (the optimized de_novo plan grew 12×, and
  * analysis+codegen dominated the query). The kernel's output struct is
  * OPAQUE to the optimizer — `GetStructField(kernel)` cannot be inlined
  * — so the downstream CASE logic (with its three-valued-logic missing
  * gates, kept in Column land where Spark defines it) references cheap
  * field extracts.
  *
  * Null semantics mirror the Column formulation exactly: a null entry /
  * PL / AD / DP null-poisons exactly the values it fed (pp arrays whole,
  * sums, ratios); `when(cond, v)` with null cond yields null; posteriors
  * are null unless pDn + pMissed > 0. */
case class DeNovoStatsExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with CodegenFallback {

  override def prettyName: String = "graft_de_novo_stats"
  override def nullable: Boolean = true
  // entries may be null per trio member; handle nulls manually
  override def nullIntolerant: Boolean = false

  private val DeNovoPrior = 1.0 / 30000000

  private lazy val entryStruct = first.dataType.asInstanceOf[StructType]
  private lazy val numFields = entryStruct.length
  private lazy val adOrd = entryStruct.fieldIndex("AD")
  private lazy val dpOrd = entryStruct.fieldIndex("DP")
  private lazy val plOrd = entryStruct.fieldIndex("PL")

  override def dataType: DataType = StructType(Seq(
    StructField("kid_adsum", LongType),
    StructField("dad_adsum", LongType),
    StructField("mom_adsum", LongType),
    StructField("kid_ab", DoubleType),
    StructField("dad_ab", DoubleType),
    StructField("mom_ab", DoubleType),
    StructField("dp_ratio", DoubleType),
    StructField("p_auto", DoubleType),
    StructField("p_hemi_mom", DoubleType),
    StructField("p_hemi_dad", DoubleType)))

  /** PL -> normalized genotype probabilities; null when PL (or any
    * element — the Column sum null-poisons the total) is null. */
  private def ppOf(e: InternalRow): Array[Double] = {
    if (e == null || e.isNullAt(plOrd)) return null
    val pl = e.getArray(plOrd)
    val n = pl.numElements()
    val lin = new Array[Double](n)
    var tot = 0.0
    var i = 0
    while (i < n) {
      if (pl.isNullAt(i)) return null
      lin(i) = math.pow(10.0, -pl.getInt(i) / 10.0)
      tot += lin(i)
      i += 1
    }
    i = 0
    while (i < n) { lin(i) /= tot; i += 1 }
    lin
  }

  /** Σ AD as boxed Long; null when AD or any element is null. */
  private def adSum(e: InternalRow): java.lang.Long = {
    if (e == null || e.isNullAt(adOrd)) return null
    val ad = e.getArray(adOrd)
    var s = 0L
    var i = 0
    val n = ad.numElements()
    while (i < n) {
      if (ad.isNullAt(i)) return null
      s += ad.getInt(i)
      i += 1
    }
    s
  }

  /** when(sum > 0, AD[2] / sum) — null when sum null/<=0 or slot null. */
  private def abOf(e: InternalRow, sum: java.lang.Long): java.lang.Double = {
    if (sum == null || sum <= 0L) return null
    if (e == null || e.isNullAt(adOrd)) return null
    val ad = e.getArray(adOrd)
    if (ad.numElements() < 2 || ad.isNullAt(1)) return null
    ad.getInt(1).toDouble / sum.toDouble
  }

  private def dpOf(e: InternalRow): java.lang.Integer =
    if (e == null || e.isNullAt(dpOrd)) null
    else Int.box(e.getInt(dpOrd))

  private def pp(a: Array[Double], i: Int): java.lang.Double =
    if (a == null || i >= a.length) null else Double.box(a(i))

  /** when(pDn + pMissed > 0, pDn / (pDn + pMissed)) with null
    * propagation through the products. */
  private def posterior(terms: (java.lang.Double, java.lang.Double))
      : java.lang.Double = {
    val (pDn, pMissed) = terms
    if (pDn == null || pMissed == null) return null
    val tot = pDn + pMissed
    if (tot > 0) pDn / tot else null
  }

  private def mul(xs: java.lang.Double*): java.lang.Double = {
    var acc = 1.0
    var i = 0
    while (i < xs.length) {
      if (xs(i) == null) return null
      acc *= xs(i)
      i += 1
    }
    acc
  }

  private def add(a: java.lang.Double, b: java.lang.Double)
      : java.lang.Double =
    if (a == null || b == null) null else a + b

  override def eval(input: InternalRow): Any = {
    val kidAny = first.eval(input)
    val dadAny = second.eval(input)
    val momAny = third.eval(input)
    val freqAny = fourth.eval(input)
    val kid = if (kidAny == null) null
      else kidAny.asInstanceOf[InternalRow]
    val dad = if (dadAny == null) null
      else dadAny.asInstanceOf[InternalRow]
    val mom = if (momAny == null) null
      else momAny.asInstanceOf[InternalRow]

    val kidPp = ppOf(kid); val dadPp = ppOf(dad); val momPp = ppOf(mom)
    val kidSum = adSum(kid); val dadSum = adSum(dad)
    val momSum = adSum(mom)
    val kidAb = abOf(kid, kidSum)
    val dadAb = abOf(dad, dadSum)
    val momAb = abOf(mom, momSum)

    val kidDp = dpOf(kid); val dadDp = dpOf(dad); val momDp = dpOf(mom)
    val dpRatio: java.lang.Double =
      if (kidDp == null || dadDp == null || momDp == null) null
      else {
        val parDp = dadDp + momDp
        if (parDp > 0) kidDp.toDouble / parDp else null
      }

    val pHet: java.lang.Double =
      if (freqAny == null) null
      else 1.0 - math.pow(1.0 - freqAny.asInstanceOf[Double], 4.0)

    val pAuto = posterior((
      mul(pp(dadPp, 0), pp(momPp, 0), pp(kidPp, 1), DeNovoPrior),
      mul(add(mul(pp(dadPp, 1), pp(momPp, 0)),
        mul(pp(dadPp, 0), pp(momPp, 1))), pp(kidPp, 1), pHet)))
    def hemi(parPp: Array[Double]): java.lang.Double = posterior((
      mul(pp(parPp, 0), pp(kidPp, 1), DeNovoPrior),
      mul(add(pp(parPp, 1), pp(parPp, 2)), pp(kidPp, 2), pHet)))
    val pHemiMom = hemi(momPp)
    val pHemiDad = hemi(dadPp)

    new GenericInternalRow(Array[Any](
      kidSum, dadSum, momSum, kidAb, dadAb, momAb, dpRatio,
      pAuto, pHemiMom, pHemiDad))
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression, q: Expression): DeNovoStatsExpr =
    copy(first = f, second = s, third = t, fourth = q)
}

object DeNovoStats {
  def apply(kid: Column, dad: Column, mom: Column, siteFreq: Column)
      : Column =
    GraftBridge.column(DeNovoStatsExpr(GraftBridge.expression(kid),
      GraftBridge.expression(dad), GraftBridge.expression(mom),
      GraftBridge.expression(siteFreq)))
}
