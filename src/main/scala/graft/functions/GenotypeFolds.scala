package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** callStats over a genotype entries array as ONE fused imperative loop
  * — the custom-Expression tier of the performance ladder for the single
  * hottest genetics primitive (every QC / allele-frequency pass folds
  * every entry of a 100 TB matrix through this).
  *
  * The higher-order formulation (`aggregate` + two `zip_with`s) is
  * CodegenFallback AND rebuilds both counter arrays per entry:
  * O(samples × alleles) allocations per row, all interpreted. This
  * expression generates a tight primitive loop (or runs the same loop in
  * `eval` off the codegen path): two long[] counters, one pass, one
  * output row. Semantics are bit-identical to the HOF version the DuckDB
  * oracles pinned: null entries / null GTs contribute nothing; haploid
  * calls (a2 = 0x7fff) count allele1 only and are never hom; alleles
  * outside [0, nAlleles) are ignored (the zip ranged over 0..n-1).
  *
  * Packing (Calls.scala): bit 0 phased, bits 1..15 allele1,
  * bits 16..30 allele2 (0x7fff = haploid marker). */
case class CallStatsFoldExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_call_stats"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private lazy val elemStruct = left.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType]
  private lazy val gtOrd = elemStruct.fieldIndex("GT")
  private lazy val numFields = elemStruct.length

  override def dataType: DataType = StructType(Seq(
    StructField("called", LongType, nullable = false),
    StructField("ac", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("hom", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def nullSafeEval(entriesAny: Any, nAny: Any): Any = {
    val arr = entriesAny.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    val ac = new Array[Long](n)
    val hom = new Array[Long](n)
    var called = 0L
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val e = arr.getStruct(i, numFields)
        if (!e.isNullAt(gtOrd)) {
          val gt = e.getInt(gtOrd)
          val a1 = (gt >> 1) & 0x7fff
          val a2 = (gt >> 16) & 0x7fff
          called += 1L
          if (a1 < n) ac(a1) += 1L
          if (a2 != 0x7fff) { // diploid
            if (a2 < n) ac(a2) += 1L
            if (a1 == a2 && a1 < n) hom(a1) += 1L
          }
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](called,
      new GenericArrayData(ac), new GenericArrayData(hom)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    nullSafeCodeGen(ctx, ev, (arr, n) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val ac = ctx.freshName("ac")
      val hom = ctx.freshName("hom")
      val called = ctx.freshName("called")
      val e = ctx.freshName("e")
      val gt = ctx.freshName("gt")
      val a1 = ctx.freshName("a1")
      val a2 = ctx.freshName("a2")
      val gad = classOf[GenericArrayData].getName
      val gir = classOf[GenericInternalRow].getName
      s"""
         |long[] $ac = new long[$n];
         |long[] $hom = new long[$n];
         |long $called = 0L;
         |int $m = $arr.numElements();
         |for (int $i = 0; $i < $m; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    InternalRow $e = $arr.getStruct($i, $numFields);
         |    if (!$e.isNullAt($gtOrd)) {
         |      int $gt = $e.getInt($gtOrd);
         |      int $a1 = ($gt >> 1) & 0x7fff;
         |      int $a2 = ($gt >> 16) & 0x7fff;
         |      $called += 1L;
         |      if ($a1 < $n) $ac[$a1] += 1L;
         |      if ($a2 != 0x7fff) {
         |        if ($a2 < $n) $ac[$a2] += 1L;
         |        if ($a1 == $a2 && $a1 < $n) $hom[$a1] += 1L;
         |      }
         |    }
         |  }
         |}
         |${ev.value} = new $gir(new Object[] {
         |  java.lang.Long.valueOf($called),
         |  new $gad($ac), new $gad($hom)});
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GenotypeFolds {
  /** struct(called, ac[n], hom[n]) over a GT-bearing entries array. */
  def callStats(entries: Column, nAlleles: Column): Column =
    GraftBridge.column(CallStatsFoldExpr(
      GraftBridge.expression(entries),
      GraftBridge.expression(nAlleles.cast("int"))))
}
