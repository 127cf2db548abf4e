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


/** All `numHashes` minhash signature minima of a shingle set in ONE
  * fused pass (the per-row formulation the STREAMING dedup kernel needs
  * — a stream gets only one stateful operator, so the batch pipeline's
  * explode + hash-aggregate minima are unavailable and the per-row HOF
  * alternative ran md5/conv/substring interpreted inside 8 transform
  * lambdas, ~4 s of the stream gate's cost).
  *
  * Bit-identical to both hash families the pipelines pin:
  *  - "md5": minimum over shingles of the i-th 32-bit big-endian chunk
  *    of md5(shingle ++ "|" ++ (i/4)) — exactly
  *    conv(substring(md5(concat(s, '|j')), 1+8k, 8), 16, 10) in Column
  *    land (Spark's md5 is MessageDigest MD5 of the UTF-8 bytes)
  *  - "xxhash64": minimum of xxhash64(i, shingle), reproduced via the
  *    same XxHash64Function fold Spark's expression uses (seed 42). */
case class MinhashSigsExpr(child: Expression, numHashes: Int,
    family: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "graft_minhash_sigs"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullSafeEval(shinglesAny: Any): Any = {
    val arr = shinglesAny.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val minima = Array.fill(numHashes)(Long.MaxValue)
    if (family == "md5") {
      val md = java.security.MessageDigest.getInstance("MD5")
      val nMd5 = (numHashes + 3) / 4
      var s = 0
      while (s < m) {
        val sh = arr.getUTF8String(s).getBytes
        var j = 0
        while (j < nMd5) {
          md.reset()
          md.update(sh)
          md.update(s"|$j".getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          val dig = md.digest()
          var k = 0
          while (k < 4 && j * 4 + k < numHashes) {
            val off = k * 4
            // unsigned big-endian 32-bit chunk, as conv(hex,16,10) reads
            val v = ((dig(off) & 0xffL) << 24) |
              ((dig(off + 1) & 0xffL) << 16) |
              ((dig(off + 2) & 0xffL) << 8) | (dig(off + 3) & 0xffL)
            val i = j * 4 + k
            if (v < minima(i)) minima(i) = v
            k += 1
          }
          j += 1
        }
        s += 1
      }
    } else {
      // xxhash64 family: same fold as the XxHash64 expression over
      // (int literal i, shingle) with the default seed
      import org.apache.spark.sql.catalyst.expressions.XxHash64Function
      var s = 0
      while (s < m) {
        val sh = arr.getUTF8String(s)
        var i = 0
        while (i < numHashes) {
          val h1 = XxHash64Function.hash(i, IntegerType, 42L)
          val v = XxHash64Function.hash(sh, StringType, h1)
          if (v < minima(i)) minima(i) = v
          i += 1
        }
        s += 1
      }
    }
    new GenericArrayData(minima.map(v => v: Any))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextKernels {
  /** Distinct n-word shingles of a (split+lower builtin) token array. */
  def shinglesOfTokens(tokens: Column, n: Int): Column =
    GraftBridge.column(ShinglesExpr(GraftBridge.expression(tokens), n))

  /** Fused per-row minhash signature minima (see MinhashSigsExpr). */
  def minhashSigs(shingles: Column, numHashes: Int, family: String)
      : Column =
    GraftBridge.column(MinhashSigsExpr(GraftBridge.expression(shingles),
      numHashes, family))
}
