package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** filter_alleles_hts entry recode as ONE fused per-row kernel
  * (reference `statgen.py:4405`; GATK downcode/subset semantics).
  *
  * Why an Expression and not Columns: the recoded PL feeds PL, GQ and
  * (subset mode) the GT argmin, and the optimizer's extract-value
  * simplification re-inlines any struct-staged intermediate back into
  * every consumer — the optimized plan grew 13× (3.7k → 49k expression
  * nodes) and analysis+codegen dominated the query at ~8 s regardless of
  * data size. This kernel is a single plan node; all index machinery
  * (genotype fold map, AD groups) is built once per row from the allele
  * remap arrays, and each entry is recoded in a tight JVM loop.
  * Interpreted (CodegenFallback): the loop body is compiled Scala, so
  * there is nothing for Janino to win back.
  *
  * Semantics are pinned bit-identically to the Column formulation it
  * replaces by the `geno_filter_alleles_hts` gate (both modes, all
  * null cases):
  *  - entry null → null; GT/AD/PL null propagate; GQ derives from the
  *    NEW PL (null when PL null or fewer than 2 genotypes)
  *  - downcode: AD sums old depths into the surviving allele (others
  *    fold into ref), PL takes the min over old genotypes that map to
  *    the new one, GT remaps alleles (phasing dropped, alleles sorted)
  *  - subset: AD/PL select the surviving slots, PL shifts so min = 0,
  *    GT is the unique argmin of the shifted PL (missing on ties)
  *  - old_to_new nulls (filtered alleles) read as 0 (fold into ref) */
case class HtsRecodeExpr(first: Expression, second: Expression,
    third: Expression, subset: Boolean)
    extends TernaryExpression with CodegenFallback {

  override def prettyName: String = "graft_hts_recode"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private lazy val elemStruct = first.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType]
  private lazy val numFields = elemStruct.length
  private lazy val gtOrd = elemStruct.fieldIndex("GT")
  private lazy val adOrd = elemStruct.fieldIndex("AD")
  private lazy val gqOrd = elemStruct.fieldIndex("GQ")
  private lazy val plOrd = elemStruct.fieldIndex("PL")
  private lazy val fieldTypes = elemStruct.fields.map(_.dataType)

  override def dataType: DataType = first.dataType

  private def gtPairJ(g: Int): Int =
    ((math.sqrt(g * 8.0 + 1) - 1) / 2).toInt
  private def haploid(a1: Int): Int = (0x7fff << 16) | (a1 << 1)
  private def diploid(a1: Int, a2: Int): Int = (a2 << 16) | (a1 << 1)

  override def nullSafeEval(entriesAny: Any, o2nAny: Any, n2oAny: Any)
      : Any = {
    val entries = entriesAny.asInstanceOf[ArrayData]
    val o2nArr = o2nAny.asInstanceOf[ArrayData]
    val n2oArr = n2oAny.asInstanceOf[ArrayData]
    val nOld = o2nArr.numElements()
    val nNew = n2oArr.numElements()
    val o2n = Array.tabulate(nOld)(i =>
      if (o2nArr.isNullAt(i)) 0 else o2nArr.getInt(i))
    val n2o = Array.tabulate(nNew)(i => n2oArr.getInt(i))
    val tOld = nOld * (nOld + 1) / 2
    val tNew = nNew * (nNew + 1) / 2

    // per-row index machinery (shared by every entry)
    val gtmap = new Array[Int](tOld) // old genotype -> downcoded new
    var og = 0
    while (og < tOld) {
      val oj = gtPairJ(og)
      val oi = og - oj * (oj + 1) / 2
      val ni = o2n(oi); val nj = o2n(oj)
      val lo = math.min(ni, nj); val hi = math.max(ni, nj)
      gtmap(og) = hi * (hi + 1) / 2 + lo
      og += 1
    }
    val subIdx = new Array[Int](tNew) // new genotype -> old PL slot
    var g = 0
    while (g < tNew) {
      val j = gtPairJ(g)
      val i = g - j * (j + 1) / 2
      val oi = n2o(i); val oj = n2o(j) // n2o increasing => oi <= oj
      subIdx(g) = oj * (oj + 1) / 2 + oi
      g += 1
    }

    val m = entries.numElements()
    val out = new Array[Any](m)
    var idx = 0
    while (idx < m) {
      if (entries.isNullAt(idx)) out(idx) = null
      else {
        val e = entries.getStruct(idx, numFields)
        val fields = new Array[Any](numFields)
        // passthrough fields (DP and any extras)
        var f = 0
        while (f < numFields) {
          if (f != gtOrd && f != adOrd && f != gqOrd && f != plOrd)
            fields(f) = if (e.isNullAt(f)) null else e.get(f, fieldTypes(f))
          f += 1
        }
        // ---- PL ---- (element nulls mirror the Column semantics:
        // array_min ignores nulls; a null source slot stays null)
        var newPl: Array[Any] = null
        if (!e.isNullAt(plOrd)) {
          val pl = e.getArray(plOrd)
          newPl = new Array[Any](tNew)
          if (subset) {
            var mn = Int.MaxValue
            var gg = 0
            while (gg < tNew) {
              val si = subIdx(gg)
              if (pl.isNullAt(si)) newPl(gg) = null
              else {
                val v = pl.getInt(si)
                newPl(gg) = v
                if (v < mn) mn = v
              }
              gg += 1
            }
            if (mn != Int.MaxValue) {
              gg = 0
              while (gg < tNew) {
                if (newPl(gg) != null)
                  newPl(gg) = newPl(gg).asInstanceOf[Int] - mn
                gg += 1
              }
            }
          } else {
            var o = 0
            while (o < tOld) {
              if (!pl.isNullAt(o)) {
                val v = pl.getInt(o)
                val ng = gtmap(o)
                if (newPl(ng) == null ||
                  v < newPl(ng).asInstanceOf[Int]) newPl(ng) = v
              }
              o += 1
            }
          }
          fields(plOrd) = new GenericArrayData(newPl.clone())
        } else fields(plOrd) = null
        // ---- GQ from the new PL (2nd smallest non-null minus smallest;
        // null when PL null or fewer than 2 non-null slots) ----
        fields(gqOrd) =
          if (newPl == null) null
          else {
            var mn1 = Int.MaxValue; var mn2 = Int.MaxValue
            var nNonNull = 0
            var gg = 0
            while (gg < newPl.length) {
              if (newPl(gg) != null) {
                nNonNull += 1
                val v = newPl(gg).asInstanceOf[Int]
                if (v < mn1) { mn2 = mn1; mn1 = v }
                else if (v < mn2) mn2 = v
              }
              gg += 1
            }
            if (nNonNull < 2) null else (mn2 - mn1): Any
          }
        // ---- GT ----
        fields(gtOrd) =
          if (subset) {
            if (newPl == null) null
            else {
              var zeroG = -1; var nZero = 0
              var gg = 0
              while (gg < tNew) {
                if (newPl(gg) != null &&
                  newPl(gg).asInstanceOf[Int] == 0) {
                  nZero += 1; if (zeroG < 0) zeroG = gg
                }
                gg += 1
              }
              if (nZero != 1) null
              else {
                val j = gtPairJ(zeroG)
                val i = zeroG - j * (j + 1) / 2
                diploid(i, j)
              }
            }
          } else {
            if (e.isNullAt(gtOrd)) null
            else {
              val gt = e.getInt(gtOrd)
              val a1 = (gt >> 1) & 0x7fff
              val a2 = (gt >> 16) & 0x7fff
              val na1 = o2n(a1)
              if (a2 == 0x7fff) haploid(na1)
              else {
                val na2 = o2n(a2)
                diploid(math.min(na1, na2), math.max(na1, na2))
              }
            }
          }
        // ---- AD ---- (a null contribution null-poisons its sum slot,
        // like `a + element_at(...)` in the Column fold)
        fields(adOrd) =
          if (e.isNullAt(adOrd)) null
          else {
            val ad = e.getArray(adOrd)
            val newAd = new Array[Any](nNew)
            if (subset) {
              var i = 0
              while (i < nNew) {
                newAd(i) =
                  if (ad.isNullAt(n2o(i))) null else ad.getInt(n2o(i))
                i += 1
              }
            } else {
              var i = 0
              while (i < nNew) { newAd(i) = 0; i += 1 }
              var o = 0
              while (o < nOld) {
                val t = o2n(o)
                if (newAd(t) != null) {
                  if (ad.isNullAt(o)) newAd(t) = null
                  else newAd(t) = newAd(t).asInstanceOf[Int] + ad.getInt(o)
                }
                o += 1
              }
            }
            new GenericArrayData(newAd)
          }
        out(idx) = new GenericInternalRow(fields)
      }
      idx += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): HtsRecodeExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HtsRecode {
  /** Recoded entries array: `entries` with GT/AD/GQ/PL rewritten under
    * the allele remap (`old_to_new` 0-based over [ref]+alts with null =
    * filtered, `new_to_old` increasing). */
  def apply(entries: Column, oldToNew: Column, newToOld: Column,
      subset: Boolean): Column =
    GraftBridge.column(HtsRecodeExpr(GraftBridge.expression(entries),
      GraftBridge.expression(oldToNew), GraftBridge.expression(newToOld),
      subset))
}
