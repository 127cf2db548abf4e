package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distinct n-word shingles of a token array in one fused loop —
  * replaces the n-1 interpreted `zip_with` passes (each allocating
  * concatenated strings per element) under every minhash/Jaccard
  * pipeline. Output order and content match the HOF formulation the
  * DuckDB oracles pinned: n-grams in position order, first-occurrence
  * distinct, trailing partial grams dropped. */
case class ShinglesExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_shingles"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(tokensAny: Any): Any = {
    val arr = tokensAny.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val out = new java.util.LinkedHashSet[AnyRef]
    var j = 0
    while (j + n <= m) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var k = 0
      while (k < n) {
        parts(k) = arr.getUTF8String(j + k)
        k += 1
      }
      out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(
        org.apache.spark.unsafe.types.UTF8String.fromString(" "),
        parts: _*))
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    nullSafeCodeGen(ctx, ev, arr => {
      val j = ctx.freshName("j"); val m = ctx.freshName("m")
      val set = ctx.freshName("set"); val parts = ctx.freshName("parts")
      val k = ctx.freshName("k")
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $m = $arr.numElements();
         |java.util.LinkedHashSet<Object> $set =
         |  new java.util.LinkedHashSet<Object>();
         |for (int $j = 0; $j + $n <= $m; $j++) {
         |  $utf8[] $parts = new $utf8[$n];
         |  for (int $k = 0; $k < $n; $k++) {
         |    $parts[$k] = $arr.getUTF8String($j + $k);
         |  }
         |  $set.add($utf8.concatWs($utf8.fromString(" "), $parts));
         |}
         |${ev.value} = new $gad($set.toArray());
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}


object TextKernels {
  /** Distinct n-word shingles of a (split+lower builtin) token array. */
  def shinglesOfTokens(tokens: Column, n: Int): Column =
    GraftBridge.column(ShinglesExpr(GraftBridge.expression(tokens), n))
}
