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

/** Dosage statistics over the entries array in one fused loop:
  * struct(nc: called count, ac: Σ dose, acsq: Σ dose²) where dose =
  * n_alt_alleles(GT) — the shared first pass of every dosage
  * normalization (PCA / GRM / RRM / LD). Replaces three separate
  * interpreted HOF passes (`aggregate` ×2 + `size(filter(...))`). */
case class DoseStatsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_dose_stats"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private lazy val elemStruct = child.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType]
  private lazy val gtOrd = elemStruct.fieldIndex("GT")
  private lazy val numFields = elemStruct.length

  override def dataType: DataType = StructType(Seq(
    StructField("nc", LongType, nullable = false),
    StructField("ac", DoubleType, nullable = false),
    StructField("acsq", DoubleType, nullable = false)))

  private def doseOf(gt: Int): Int = {
    val a1 = (gt >> 1) & 0x7fff
    val a2 = (gt >> 16) & 0x7fff
    (if (a1 > 0) 1 else 0) +
      (if (a2 != 0x7fff && a2 > 0) 1 else 0)
  }

  override def nullSafeEval(entriesAny: Any): Any = {
    val arr = entriesAny.asInstanceOf[ArrayData]
    var nc = 0L
    var ac = 0.0
    var acsq = 0.0
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val e = arr.getStruct(i, numFields)
        if (!e.isNullAt(gtOrd)) {
          val d = doseOf(e.getInt(gtOrd)).toDouble
          nc += 1L; ac += d; acsq += d * d
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nc, ac, acsq))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val m = ctx.freshName("m")
      val nc = ctx.freshName("nc"); val ac = ctx.freshName("ac")
      val acsq = ctx.freshName("acsq"); val e = ctx.freshName("e")
      val gt = ctx.freshName("gt"); val d = ctx.freshName("d")
      val gir = classOf[GenericInternalRow].getName
      s"""
         |long $nc = 0L; double $ac = 0.0; double $acsq = 0.0;
         |int $m = $arr.numElements();
         |for (int $i = 0; $i < $m; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    InternalRow $e = $arr.getStruct($i, $numFields);
         |    if (!$e.isNullAt($gtOrd)) {
         |      int $gt = $e.getInt($gtOrd);
         |      double $d = (((($gt >> 1) & 0x7fff) > 0) ? 1 : 0)
         |        + (((($gt >> 16) & 0x7fff) != 0x7fff
         |            && (($gt >> 16) & 0x7fff) > 0) ? 1 : 0);
         |      $nc += 1L; $ac += $d; $acsq += $d * $d;
         |    }
         |  }
         |}
         |${ev.value} = new $gir(new Object[] {
         |  java.lang.Long.valueOf($nc), java.lang.Double.valueOf($ac),
         |  java.lang.Double.valueOf($acsq)});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression)
      : Expression = copy(child = c)
}

/** Centered/scaled dosage vector in one fused loop:
  * out[i] = (dose_i - mean) / denom, 0.0 when the entry/GT is missing
  * or denom is null/non-positive — exactly the
  * `coalesce(when(denom > 0, ...), 0.0)` HOF formulation all the
  * normalizations share. */
case class DoseNormExpr(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def prettyName: String = "graft_dose_norm"
  override def nullable: Boolean = true

  private lazy val elemStruct = first.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType]
  private lazy val gtOrd = elemStruct.fieldIndex("GT")
  private lazy val numFields = elemStruct.length

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val entriesAny = first.eval(input)
    if (entriesAny == null) return null
    val meanAny = second.eval(input)
    val denomAny = third.eval(input)
    val arr = entriesAny.asInstanceOf[ArrayData]
    val ok = meanAny != null && denomAny != null &&
      denomAny.asInstanceOf[Double] > 0.0
    val mean = if (ok) meanAny.asInstanceOf[Double] else 0.0
    val denom = if (ok) denomAny.asInstanceOf[Double] else 1.0
    val m = arr.numElements()
    val out = new Array[Double](m)
    var i = 0
    while (i < m) {
      if (ok && !arr.isNullAt(i)) {
        val e = arr.getStruct(i, numFields)
        if (!e.isNullAt(gtOrd)) {
          val gt = e.getInt(gtOrd)
          val a1 = (gt >> 1) & 0x7fff
          val a2 = (gt >> 16) & 0x7fff
          val d = (if (a1 > 0) 1 else 0) +
            (if (a2 != 0x7fff && a2 > 0) 1 else 0)
          out(i) = (d - mean) / denom
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val entriesGen = first.genCode(ctx)
    val meanGen = second.genCode(ctx)
    val denomGen = third.genCode(ctx)
    val i = ctx.freshName("i"); val m = ctx.freshName("m")
    val out = ctx.freshName("out"); val e = ctx.freshName("e")
    val gt = ctx.freshName("gt"); val d = ctx.freshName("d")
    val ok = ctx.freshName("ok")
    val gad = classOf[GenericArrayData].getName
    val code =
      s"""
         |${entriesGen.code}
         |boolean ${ev.isNull} = ${entriesGen.isNull};
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${meanGen.code}
         |  ${denomGen.code}
         |  boolean $ok = !${meanGen.isNull} && !${denomGen.isNull}
         |    && ${denomGen.value} > 0.0;
         |  int $m = ${entriesGen.value}.numElements();
         |  double[] $out = new double[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($ok && !${entriesGen.value}.isNullAt($i)) {
         |      InternalRow $e = ${entriesGen.value}.getStruct($i, $numFields);
         |      if (!$e.isNullAt($gtOrd)) {
         |        int $gt = $e.getInt($gtOrd);
         |        double $d = (((($gt >> 1) & 0x7fff) > 0) ? 1 : 0)
         |          + (((($gt >> 16) & 0x7fff) != 0x7fff
         |              && (($gt >> 16) & 0x7fff) > 0) ? 1 : 0);
         |        $out[$i] = ($d - ${meanGen.value}) / ${denomGen.value};
         |      }
         |    }
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    ev.copy(code =
      org.apache.spark.sql.catalyst.expressions.codegen.Block
        .BlockHelper(new StringContext(code)).code())
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Statistics of one INTEGER entry field (DP / GQ) in one fused loop:
  * struct(n, sum, sumsq, min, max); min/max null when no non-null
  * values. Same left-to-right double accumulation as the HOF chain it
  * replaces, so downstream mean/stdev algebra is bit-identical. */
case class IntFieldStatsExpr(child: Expression, field: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_field_stats"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private lazy val elemStruct = child.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType]
  private lazy val fOrd = elemStruct.fieldIndex(field)
  private lazy val numFields = elemStruct.length

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sum", DoubleType, nullable = false),
    StructField("sumsq", DoubleType, nullable = false),
    StructField("min", IntegerType, nullable = true),
    StructField("max", IntegerType, nullable = true)))

  override def nullSafeEval(entriesAny: Any): Any = {
    val arr = entriesAny.asInstanceOf[ArrayData]
    var n = 0L; var sum = 0.0; var sumsq = 0.0
    var mn = Int.MaxValue; var mx = Int.MinValue
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val e = arr.getStruct(i, numFields)
        if (!e.isNullAt(fOrd)) {
          val v = e.getInt(fOrd)
          n += 1L; sum += v.toDouble; sumsq += v.toDouble * v
          if (v < mn) mn = v
          if (v > mx) mx = v
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, sum, sumsq,
      if (n == 0) null else mn, if (n == 0) null else mx))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val m = ctx.freshName("m")
      val n = ctx.freshName("n"); val sum = ctx.freshName("sum")
      val sumsq = ctx.freshName("sumsq"); val mn = ctx.freshName("mn")
      val mx = ctx.freshName("mx"); val e = ctx.freshName("e")
      val v = ctx.freshName("v")
      val gir = classOf[GenericInternalRow].getName
      s"""
         |long $n = 0L; double $sum = 0.0; double $sumsq = 0.0;
         |int $mn = Integer.MAX_VALUE; int $mx = Integer.MIN_VALUE;
         |int $m = $arr.numElements();
         |for (int $i = 0; $i < $m; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    InternalRow $e = $arr.getStruct($i, $numFields);
         |    if (!$e.isNullAt($fOrd)) {
         |      int $v = $e.getInt($fOrd);
         |      $n += 1L; $sum += (double) $v;
         |      $sumsq += (double) $v * $v;
         |      if ($v < $mn) $mn = $v;
         |      if ($v > $mx) $mx = $v;
         |    }
         |  }
         |}
         |${ev.value} = new $gir(new Object[] {
         |  java.lang.Long.valueOf($n), java.lang.Double.valueOf($sum),
         |  java.lang.Double.valueOf($sumsq),
         |  ($n == 0L) ? null : java.lang.Integer.valueOf($mn),
         |  ($n == 0L) ? null : java.lang.Integer.valueOf($mx)});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Stacked genotype-class indicator vector in one fused loop: for S
  * entries, a 3S double array — [hom-ref block][het block][called
  * block] — the Gramian input of KING/IBD relatedness. Replaces a
  * classes `transform` + three indicator `transform`s + `concat`, all
  * interpreted. `diploidOnly = true` treats haploid calls as no-calls
  * (IBD's dose classes); `false` classes haploid ref/alt as
  * hom-ref/hom-var (KING's gtClass). */
case class ClassIndicatorsExpr(child: Expression, diploidOnly: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_class_indicators"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private lazy val elemStruct = child.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType]
  private lazy val gtOrd = elemStruct.fieldIndex("GT")
  private lazy val numFields = elemStruct.length

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(entriesAny: Any): Any = {
    val arr = entriesAny.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val out = new Array[Double](3 * m)
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val e = arr.getStruct(i, numFields)
        if (!e.isNullAt(gtOrd)) {
          val gt = e.getInt(gtOrd)
          val a1 = (gt >> 1) & 0x7fff
          val a2 = (gt >> 16) & 0x7fff
          val cls =
            if (a2 == 0x7fff) {
              if (diploidOnly) 1 else if (a1 == 0) 2 else 4
            } else if (a1 == 0 && a2 == 0) 2
            else if (a1 != a2) 3
            else 4
          if (cls == 2) out(i) = 1.0
          if (cls == 3) out(m + i) = 1.0
          if (cls != 1) out(2 * m + i) = 1.0
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val m = ctx.freshName("m")
      val out = ctx.freshName("out"); val e = ctx.freshName("e")
      val gt = ctx.freshName("gt"); val a1 = ctx.freshName("a1")
      val a2 = ctx.freshName("a2"); val cls = ctx.freshName("cls")
      val gad = classOf[GenericArrayData].getName
      val dip = if (diploidOnly) "true" else "false"
      s"""
         |int $m = $arr.numElements();
         |double[] $out = new double[3 * $m];
         |for (int $i = 0; $i < $m; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    InternalRow $e = $arr.getStruct($i, $numFields);
         |    if (!$e.isNullAt($gtOrd)) {
         |      int $gt = $e.getInt($gtOrd);
         |      int $a1 = ($gt >> 1) & 0x7fff;
         |      int $a2 = ($gt >> 16) & 0x7fff;
         |      int $cls;
         |      if ($a2 == 0x7fff) {
         |        $cls = $dip ? 1 : ($a1 == 0 ? 2 : 4);
         |      } else if ($a1 == 0 && $a2 == 0) { $cls = 2; }
         |      else if ($a1 != $a2) { $cls = 3; }
         |      else { $cls = 4; }
         |      if ($cls == 2) $out[$i] = 1.0;
         |      if ($cls == 3) $out[$m + $i] = 1.0;
         |      if ($cls != 1) $out[2 * $m + $i] = 1.0;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object GenotypeFolds {
  /** struct(called, ac[n], hom[n]) over a GT-bearing entries array. */
  def callStats(entries: Column, nAlleles: Column): Column =
    GraftBridge.column(CallStatsFoldExpr(
      GraftBridge.expression(entries),
      GraftBridge.expression(nAlleles.cast("int"))))

  /** struct(nc, ac, acsq) dosage statistics over the entries array. */
  def doseStats(entries: Column): Column =
    GraftBridge.column(DoseStatsExpr(GraftBridge.expression(entries)))

  /** (dose - mean) / denom per entry, 0.0 for missing / bad denom. */
  def doseNorm(entries: Column, mean: Column, denom: Column): Column =
    GraftBridge.column(DoseNormExpr(
      GraftBridge.expression(entries),
      GraftBridge.expression(mean.cast("double")),
      GraftBridge.expression(denom.cast("double"))))

  /** struct(n, sum, sumsq, min, max) of an int entry field (DP/GQ). */
  def intFieldStats(entries: Column, field: String): Column =
    GraftBridge.column(IntFieldStatsExpr(
      GraftBridge.expression(entries), field))

  /** 3S stacked class-indicator vector for relatedness Gramians. */
  def classIndicators(entries: Column, diploidOnly: Boolean): Column =
    GraftBridge.column(ClassIndicatorsExpr(
      GraftBridge.expression(entries), diploidOnly))
}
