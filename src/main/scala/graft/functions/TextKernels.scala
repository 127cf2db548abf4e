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

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * — the rolling-hash fingerprinting scheme behind MOSS): hash every
  * character k-gram with a Rabin-Karp rolling hash, slide a window of
  * `w` consecutive k-gram hashes, and select each window's minimum
  * (rightmost on ties — "robust winnowing", so a tie run yields one
  * fingerprint, not w). Guarantees: (a) any substring match of length
  * >= w + k - 1 between two documents shares at least one selected
  * fingerprint; (b) expected density of selected positions is 2/(w+1),
  * so fingerprints are ~2n/(w+1) per n-char doc regardless of content.
  *
  * One fused per-row pass (rolling update is O(1) per position; window
  * minima amortize O(1) via rescan-on-expiry over random hashes), output
  * is the DISTINCT selected hash values in first-selection order —
  * dedup/contamination joins need the set, not positions. Each k-gram's
  * polynomial hash is finalized with a murmur-style avalanche so the
  * window-min choice is uniform over positions (raw polynomial values
  * bias the min toward lexicographically small suffixes). */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1 && w >= 1, "winnow k and w must be >= 1")
  override def prettyName: String = "graft_winnow_fingerprints"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullSafeEval(textAny: Any): Any = {
    val s = textAny
      .asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    new GenericArrayData(
      WinnowKernel.fingerprints(s, k, w).map(v => v: Any))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WinnowKernel {
  // murmur3 fmix64 finalizer (public-domain avalanche constants)
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  private final val Base = 0x100000001b3L // FNV-1a prime; mod 2^64 overflow

  /** Distinct selected fingerprints of `s` under (k, w) winnowing.
    * Degenerate inputs stay useful for dedup: an empty string has no
    * fingerprints; a string shorter than k fingerprints as its single
    * whole-string hash; fewer than w k-grams select the global minimum. */
  def fingerprints(s: String, k: Int, w: Int): Array[Long] = {
    val n = s.length
    if (n == 0) return Array.emptyLongArray
    if (n < k) {
      var h = 0L; var i = 0
      while (i < n) { h = h * Base + s.charAt(i); i += 1 }
      return Array(fmix64(h))
    }
    val m = n - k + 1
    val grams = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    grams(0) = fmix64(h)
    var bPow = 1L
    i = 0
    while (i < k - 1) { bPow *= Base; i += 1 }
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * bPow) * Base + s.charAt(i + k - 1)
      grams(i) = fmix64(h)
      i += 1
    }
    if (m <= w) {
      var best = 0; var j = 1
      while (j < m) { if (grams(j) <= grams(best)) best = j; j += 1 }
      return Array(grams(best))
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]
    var minIdx = 0
    var j = 1
    while (j < w) { if (grams(j) <= grams(minIdx)) minIdx = j; j += 1 }
    out.add(grams(minIdx))
    var start = 1
    while (start + w <= m) {
      val end = start + w - 1 // index entering the window this step
      if (minIdx < start) {
        // previous minimum slid out: rescan the window once; over
        // uniform hashes this fires with probability 1/w per step,
        // keeping the loop O(m) amortized
        minIdx = start
        var t = start + 1
        while (t <= end) { if (grams(t) <= grams(minIdx)) minIdx = t; t += 1 }
      } else if (grams(end) <= grams(minIdx)) {
        minIdx = end
      }
      out.add(grams(minIdx))
      start += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator
    var z = 0
    while (it.hasNext) { arr(z) = it.next(); z += 1 }
    arr
  }
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

  /** Winnowing fingerprint set (see WinnowFingerprintsExpr). */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFingerprintsExpr(
      GraftBridge.expression(text), k, w))
}
