package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels over `array<float>` / `array<double>`
  * embedding columns.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are
  * CodegenFallback — every element pair allocates lambda variables and
  * evaluates an interpreted expression tree, ~10× slower than a fused
  * loop. These expressions generate a tight primitive loop inside
  * whole-stage codegen instead, with semantics bit-identical to the
  * HOF formulation they replace (left-to-right double accumulation;
  * NULL if either array is NULL, lengths differ, or any element is
  * NULL — exactly what `aggregate(zip_with(...))` null-poisoning
  * produced, so the DuckDB oracles are unchanged).
  *
  * Reference behavior: `ndarray` dot in hail (`NDArrayFunctions`)
  * computes the same left-fold double sum. */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  /** scala step: acc += step(x, y) */
  protected def step(x: Double, y: Double): Double
  /** java source for the loop body step, given the x/y variable names. */
  protected def stepCode(x: String, y: String): String

  private def elemGetter(e: Expression): (ArrayData, Int) => Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => (a, i) => a.getFloat(i).toDouble
      case DoubleType => (a, i) => a.getDouble(i)
      case IntegerType => (a, i) => a.getInt(i).toDouble
      case LongType => (a, i) => a.getLong(i).toDouble
    }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
        true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects numeric arrays, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val gx = elemGetter(left)
    val gy = elemGetter(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s = s + step(gx(x, i), gy(y, i))
      i += 1
    }
    s
  }

  private def javaGet(e: Expression, arr: String, i: String): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType => s"(double) $arr.getLong($i)"
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    double $x = ${javaGet(left, a, i)};
         |    double $y = ${javaGet(right, b, i)};
         |    $s = $s + (${stepCode(x, y)});
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }
}

/** Σ xᵢ·yᵢ in double, left fold. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFold {
  override def prettyName: String = "graft_dot"
  override protected def step(x: Double, y: Double): Double = x * y
  override protected def stepCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ (xᵢ−yᵢ)² in double, left fold (IVF coarse-quantizer distance). */
case class SquaredDistance(left: Expression, right: Expression)
    extends VectorFold {
  override def prettyName: String = "graft_sqdist"
  override protected def step(x: Double, y: Double): Double = {
    val d = x - y; d * d
  }
  override protected def stepCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  def squaredDistance(a: Column, b: Column): Column =
    GraftBridge.column(SquaredDistance(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
