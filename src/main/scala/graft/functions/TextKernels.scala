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
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_minhash_sigs"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullSafeEval(shinglesAny: Any): Any =
    compute(shinglesAny.asInstanceOf[ArrayData])

  // codegen calls this directly (one virtual call per row) instead of
  // the CodegenFallback path, which would re-evaluate the child through
  // an interpreted projection of the full input row
  def compute(arr: ArrayData): ArrayData = {
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
    new GenericArrayData(minima)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this,
      classOf[MinhashSigsExpr].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
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
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1 && w >= 1, "winnow k and w must be >= 1")
  override def prettyName: String = "graft_winnow_fingerprints"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullSafeEval(textAny: Any): Any =
    compute(textAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    new GenericArrayData(WinnowKernel.fingerprints(s.toString, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("winnowExpr", this,
      classOf[WinnowFingerprintsExpr].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
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

  /** All rolling k-gram hashes of `s` in position order (one entry per
    * start offset 0..n-k): FNV-prime polynomial rolled in O(n), each
    * value finalized through fmix64. Empty when the string is shorter
    * than k. Shared by winnowing (below) and exact-substring span
    * detection (`Dedup.duplicatedSpans`). */
  def gramHashes(s: String, k: Int): Array[Long] = {
    val n = s.length
    if (n < k) return Array.emptyLongArray
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
    grams
  }

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
    val grams = gramHashes(s, k)
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

/** All rolling k-gram hashes of the raw text, position-indexed (entry i
  * = hash of chars [i, i+k)) — the per-position stream exact-substring
  * span detection explodes. Same rolling FNV+fmix64 family the
  * winnowing kernel selects from, kept UN-selected here because span
  * dedup needs a verdict for EVERY start offset. Codegen'd direct
  * call, no interpreted fallback. */
case class GramHashesExpr(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1, "gram length k must be >= 1")
  override def prettyName: String = "graft_gram_hashes"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullSafeEval(textAny: Any): Any =
    compute(textAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    new GenericArrayData(WinnowKernel.gramHashes(s.toString, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("gramHashesExpr", this,
      classOf[GramHashesExpr].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD via `java.text.Normalizer`)
  * as a codegen'd expression — the encoding-hygiene pass a web-crawl
  * corpus needs before any char-level dedup (composed vs decomposed
  * accents hash differently while rendering identically). The form is
  * resolved once at plan time, not per row. */
case class NormalizeUnicodeExpr(child: Expression, form: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private val normForm = form match {
    case "NFC" => java.text.Normalizer.Form.NFC
    case "NFD" => java.text.Normalizer.Form.NFD
    case "NFKC" => java.text.Normalizer.Form.NFKC
    case "NFKD" => java.text.Normalizer.Form.NFKD
    case other =>
      throw new IllegalArgumentException(s"unknown unicode form: $other")
  }
  override def prettyName: String = "graft_normalize_unicode"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType

  override def nullSafeEval(textAny: Any): Any =
    compute(textAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  def compute(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, normForm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("normalizeUnicodeExpr", this,
      classOf[NormalizeUnicodeExpr].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Distinct character n-grams in one fused pass — replaces the
  * `transform(sequence(...), i -> substr(...))` HOF formulation, which
  * Spark evaluates interpreted per element (an expression-tree walk and
  * a fresh UTF8String per position — ~10 s per 5000-doc scan at n=19).
  * Byte offsets for every codepoint are computed once per row, so each
  * n-gram is a single byte-range copy; output is first-occurrence
  * distinct in position order, matching the HOF/SQL formulation
  * bit-for-bit (UTF8String comparisons are codepoint-exact). */
case class CharNgramsExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, "n must be >= 1")
  override def prettyName: String = "graft_char_ngrams"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(textAny: Any): Any =
    CharNgramsExpr.compute(
      textAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = CharNgramsExpr.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $cls.compute($s, $n);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CharNgramsExpr {
  def compute(s: org.apache.spark.unsafe.types.UTF8String, n: Int)
      : ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val bytes = s.getBytes
    val nb = bytes.length
    // codepoint-start byte offsets (one linear scan)
    var chars = 0
    var off = 0
    while (off < nb) {
      off += UTF8String.numBytesForFirstByte(bytes(off)); chars += 1
    }
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](chars + 1)
    off = 0; var i = 0
    while (off < nb) {
      offs(i) = off
      off += UTF8String.numBytesForFirstByte(bytes(off)); i += 1
    }
    offs(chars) = nb
    val out = new java.util.LinkedHashSet[UTF8String]
    i = 0
    while (i + n <= chars) {
      out.add(UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, offs(i), offs(i + n))))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** |A ∩ B| for two DISTINCT string arrays in one hash pass, without
  * materializing the intersection array. `size(array_intersect(a, b))`
  * inside a similarity formula gets inlined by CollapseProject into
  * every use site (numerator and denominator), so each pair row paid
  * 2-4 full intersect builds; this kernel returns just the count and
  * appears once per reference. Inputs must already be element-distinct
  * (every producer in the dedup pipelines emits distinct sets). */
case class DistinctIntersectCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "graft_intersect_count"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    DistinctIntersectCountExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = DistinctIntersectCountExpr.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $cls.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object DistinctIntersectCountExpr {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val (small, big) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val m = small.numElements()
    val set = new java.util.HashSet[AnyRef](Math.max(4, m * 2))
    var i = 0
    while (i < m) { set.add(small.getUTF8String(i)); i += 1 }
    var cnt = 0
    val n = big.numElements()
    i = 0
    while (i < n) {
      if (set.contains(big.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }
}

/** |A ∩ B| for two SORTED distinct string arrays by merge-walk — no
  * per-pair hash-set build (the allocation + hashing churn dominated
  * the quadratic-verify pipelines; a byte-wise compareTo walk over
  * presorted arrays is allocation-free). Sort once per document with
  * `array_sort` (binary collation = UTF8String.compareTo order), merge
  * once per pair. */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "graft_sorted_intersect_count"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = SortedIntersectCountExpr.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $cls.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object SortedIntersectCountExpr {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var cnt = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }
}

/** 60-bit SimHash of a (distinct) token array in ONE fused per-row
  * pass: per token, the unsigned value of the first 15 hex digits of
  * its md5 (exactly `conv(substring(md5(t),1,15),16,10)`); per bit, a
  * majority vote over the tokens (> half set the bit). Replaces the
  * explode + 60-sum-aggregate relational formulation — same longs
  * bit-for-bit, none of its token-table shuffle. */
case class SimHash64Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_simhash64"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def nullSafeEval(tokensAny: Any): Any =
    compute(tokensAny.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): Long = {
    val m = arr.numElements()
    val counts = new Array[Int](60)
    val md = java.security.MessageDigest.getInstance("MD5")
    var s = 0
    while (s < m) {
      md.reset()
      val dig = md.digest(arr.getUTF8String(s).getBytes)
      // unsigned value of hex digits 1..15 = bytes 0..6 + high nibble
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
      v = (v << 4) | ((dig(7) & 0xf0L) >>> 4)
      var b = 0
      while (b < 60) {
        if (((v >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      s += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) * 2 > m) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this,
      classOf[SimHash64Expr].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Fused hashed-n-gram feature buckets for DSIR-style importance
  * weighting: one pass over the token array emits the md5 bucket id of
  * every unigram and bigram, WITH multiplicity (bag-of-ngrams).
  * Bucket = conv(substr(md5(salt || '|' || gram), 1, 15), 16, 10) %
  * numBuckets — bit-identical to the builtin chain it replaces (first
  * 60 bits of the digest, big-endian), which paid an interpreted
  * higher-order `transform` lambda plus hex-string + conv parse per
  * gram. Grams hash as raw UTF-8 byte concatenation (token, space,
  * token), so no intermediate strings are built at all. Null input
  * tokens are compacted out before gram formation ([[TokenArrays]]). */
case class DsirBucketsExpr(child: Expression, numBuckets: Int,
    salt: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_dsir_buckets"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullSafeEval(tokensAny: Any): Any =
    compute(tokensAny.asInstanceOf[ArrayData])

  private val saltBytes =
    s"$salt|".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val spaceByte = Array[Byte](' ')

  def compute(arr0: ArrayData): ArrayData = {
    val arr = TokenArrays.dropNulls(arr0)
    val m = arr.numElements()
    val out = new Array[Long](if (m >= 2) 2 * m - 1 else m)
    val md = java.security.MessageDigest.getInstance("MD5")
    def first60(dig: Array[Byte]): Long = {
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
      (v << 4) | ((dig(7) & 0xffL) >>> 4)
    }
    var i = 0
    while (i < m) {
      md.reset()
      md.update(saltBytes)
      md.update(arr.getUTF8String(i).getBytes)
      out(i) = first60(md.digest()) % numBuckets
      i += 1
    }
    i = 0
    while (i < m - 1) {
      md.reset()
      md.update(saltBytes)
      md.update(arr.getUTF8String(i).getBytes)
      md.update(spaceByte)
      md.update(arr.getUTF8String(i + 1).getBytes)
      out(m + i) = first60(md.digest()) % numBuckets
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("dsirExpr", this,
      classOf[DsirBucketsExpr].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Bag (with-multiplicity) token n-grams, space-joined — the
  * non-distinct sibling of ShinglesExpr for operators whose contract
  * counts occurrences (blocklist hits, decontamination multiplicity).
  * One fused pass; the builtin `transform(sequence, slice, array_join)`
  * chain it replaces evaluated an interpreted lambda per gram. Null
  * input tokens are compacted out before gram formation
  * ([[TokenArrays]]). */
case class TokenNgramsExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, "n >= 1")
  override def prettyName: String = "graft_token_ngrams"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(tokensAny: Any): Any =
    compute(tokensAny.asInstanceOf[ArrayData])

  def compute(arr0: ArrayData): ArrayData = {
    val arr = TokenArrays.dropNulls(arr0)
    val m = arr.numElements()
    val cnt = if (m >= n) m - n + 1 else 0
    val out = new Array[Any](cnt)
    var i = 0
    while (i < cnt) {
      var j = 1
      var g = arr.getUTF8String(i)
      while (j < n) {
        g = org.apache.spark.unsafe.types.UTF8String.concat(
          g, SpaceUtf8.S, arr.getUTF8String(i + j))
        j += 1
      }
      out(i) = g
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("tokenNgramsExpr", this,
      classOf[TokenNgramsExpr].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

private object SpaceUtf8 {
  val S: org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")
}

/** Null-element guard for the array-input fused kernels
  * (TokenNgramsExpr / TokenNgramHashesExpr / DsirBucketsExpr): their
  * output declares containsNull=false, but a caller other than
  * `Text.tokens` (whose split output is null-free) may hand them an
  * array WITH null elements — which would NPE inside the md5/concat
  * loops. Null elements are compacted out before gram formation (a
  * null token contributes no gram), making the behavior defined for
  * every input. The hot null-free path pays one boolean scan and
  * returns the input array untouched. */
private[functions] object TokenArrays {
  def dropNulls(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    var i = 0
    while (i < m && !arr.isNullAt(i)) i += 1
    if (i == m) return arr
    val out = new java.util.ArrayList[AnyRef](m)
    var j = 0
    while (j < m) {
      if (!arr.isNullAt(j)) out.add(arr.getUTF8String(j))
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Bag token n-gram 60-bit md5 hashes: for every n-token run emits
  * conv(substr(md5(salt || '|' || gram), 1, 15), 16, 10) — the
  * engine-portable gram identity decontamination joins on — computed
  * from raw UTF-8 bytes with no intermediate gram strings, hex
  * strings, or conv parses. Bit-identical to the builtin chain. Null
  * input tokens are compacted out before gram formation
  * ([[TokenArrays]]). */
case class TokenNgramHashesExpr(child: Expression, n: Int, salt: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, "n >= 1")
  override def prettyName: String = "graft_token_ngram_hashes"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullSafeEval(tokensAny: Any): Any =
    compute(tokensAny.asInstanceOf[ArrayData])

  private val saltBytes =
    s"$salt|".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val spaceByte = Array[Byte](' ')

  def compute(arr0: ArrayData): ArrayData = {
    val arr = TokenArrays.dropNulls(arr0)
    val m = arr.numElements()
    val cnt = if (m >= n) m - n + 1 else 0
    val out = new Array[Long](cnt)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < cnt) {
      md.reset()
      md.update(saltBytes)
      var j = 0
      while (j < n) {
        if (j > 0) md.update(spaceByte)
        md.update(arr.getUTF8String(i + j).getBytes)
        j += 1
      }
      val dig = md.digest()
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
      out(i) = (v << 4) | ((dig(7) & 0xffL) >>> 4)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("tokenNgramHashesExpr", this,
      classOf[TokenNgramHashesExpr].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Membership counts of a long array against a FIXED broadcast-sized
  * set, binary-searched over one shared sorted array per expression
  * instance: returns struct(n_hits = elements present WITH
  * multiplicity, n_distinct = distinct elements present). The
  * stateless core of the streaming decontamination guard — per-row,
  * no join, no state. */
case class CountInSetExpr(child: Expression, set: Array[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_count_in_set"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  private val sorted: Array[Long] = { val s = set.distinct; java.util.Arrays.sort(s); s }

  override def nullSafeEval(arrAny: Any): Any =
    compute(arrAny.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val m = arr.numElements()
    var hits = 0L
    val seen = new java.util.HashSet[Long]()
    var i = 0
    while (i < m) {
      val v = arr.getLong(i)
      if (java.util.Arrays.binarySearch(sorted, v) >= 0) {
        hits += 1
        seen.add(v)
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(hits, seen.size.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("countInSetExpr", this,
      classOf[CountInSetExpr].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Identity marker flagged non-deterministic so NO optimizer rule may
  * fold it, push a predicate containing it through a Project/Join, or
  * inline the wrapped attribute into a join condition. Purpose-built
  * replacement for the `rand(7L) < 2.0` tautology the similarity
  * verifies used as a pushdown barrier: wrapping the pair-score
  * attribute in the final threshold filter keeps the expensive
  * intersect kernel in its own projection (evaluated ONCE per
  * candidate) instead of being substituted 2-3x into the verify join
  * condition by PushPredicateThroughJoin + CollapseProject. Runtime
  * cost: zero — eval and codegen are the identity. */
case class OptimizerFenceExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_optimizer_fence"
  // the whole point: deterministic=false is the one flag every
  // pushdown/folding rule checks before moving an expression
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType

  override def nullSafeEval(v: Any): Any = v

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[SortedIntersectCountExpr]] with EARLY TERMINATION: the merge-walk
  * aborts as soon as matches-so-far + min(remaining_a, remaining_b)
  * cannot reach `minNeeded` — at that point the pair's true overlap is
  * provably < minNeeded, so any returned value below it filters the
  * pair identically (overlap >= alpha iff half-up-4dp jaccard >=
  * threshold — an exact integer equivalence, see
  * [[graft.pipeline.Dedup.prefixFilterJaccardPairs]]). Pairs that CAN
  * reach the bound run the full walk and return the exact count, so
  * every emitted jaccard is exact. On verify workloads where
  * candidates cluster just under the threshold the walk does ~half the
  * compares of the unbounded kernel. */
case class BoundedSortedIntersectCountExpr(left: Expression,
    right: Expression, bound: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def prettyName: String = "graft_sorted_intersect_count_bounded"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = bound

  override def nullSafeEval(a: Any, b: Any, m: Any): Any =
    BoundedSortedIntersectCountExpr.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], m.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = BoundedSortedIntersectCountExpr.getClass.getName
      .stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b, m) =>
      s"${ev.value} = $cls.compute($a, $b, $m);")
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(left = f, right = s, bound = t)
}

object BoundedSortedIntersectCountExpr {
  def compute(a: ArrayData, b: ArrayData, minNeeded: Long): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var cnt = 0
    while (i < na && j < nb) {
      val rem = Math.min(na - i, nb - j)
      if (cnt + rem < minNeeded) return cnt
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }
}

object TextKernels {
  /** Distinct n-word shingles of a (split+lower builtin) token array. */
  def shinglesOfTokens(tokens: Column, n: Int): Column =
    GraftBridge.column(ShinglesExpr(GraftBridge.expression(tokens), n))

  /** (n_hits, n_distinct) of a long array vs a fixed sorted set
    * (see CountInSetExpr). */
  def countInSet(arr: Column, set: Array[Long]): Column =
    GraftBridge.column(CountInSetExpr(GraftBridge.expression(arr), set))

  /** Bag token n-grams, space-joined (see TokenNgramsExpr). */
  def tokenNgrams(tokens: Column, n: Int): Column =
    GraftBridge.column(TokenNgramsExpr(GraftBridge.expression(tokens), n))

  /** Bag token n-gram md5 hashes (see TokenNgramHashesExpr). */
  def tokenNgramHashes(tokens: Column, n: Int, salt: String): Column =
    GraftBridge.column(TokenNgramHashesExpr(
      GraftBridge.expression(tokens), n, salt))

  /** Hashed unigram+bigram feature buckets (see DsirBucketsExpr). */
  def dsirBuckets(tokens: Column, numBuckets: Int, salt: String): Column =
    GraftBridge.column(DsirBucketsExpr(GraftBridge.expression(tokens),
      numBuckets, salt))

  /** Fused per-row minhash signature minima (see MinhashSigsExpr). */
  def minhashSigs(shingles: Column, numHashes: Int, family: String)
      : Column =
    GraftBridge.column(MinhashSigsExpr(GraftBridge.expression(shingles),
      numHashes, family))

  /** Winnowing fingerprint set (see WinnowFingerprintsExpr). */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFingerprintsExpr(
      GraftBridge.expression(text), k, w))

  /** Distinct char n-grams, fused (see CharNgramsExpr). */
  def charNgrams(text: Column, n: Int): Column =
    GraftBridge.column(CharNgramsExpr(GraftBridge.expression(text), n))

  /** Position-indexed rolling k-gram hashes (see GramHashesExpr). */
  def gramHashes(text: Column, k: Int): Column =
    GraftBridge.column(GramHashesExpr(GraftBridge.expression(text), k))

  /** Unicode normalization (see NormalizeUnicodeExpr). */
  def normalizeUnicode(text: Column, form: String): Column =
    GraftBridge.column(NormalizeUnicodeExpr(
      GraftBridge.expression(text), form))

  /** |A ∩ B| of distinct string arrays (see DistinctIntersectCountExpr). */
  def intersectCount(a: Column, b: Column): Column =
    GraftBridge.column(DistinctIntersectCountExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Fused 60-bit simhash of a distinct-token array
    * (see SimHash64Expr). */
  def simHash64(tokens: Column): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(tokens)))

  /** |A ∩ B| of SORTED distinct string arrays by merge-walk. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCountExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** As [[sortedIntersectCount]] with early exit once the count
    * provably cannot reach `minNeeded` (exact at or above the bound;
    * see BoundedSortedIntersectCountExpr). */
  def sortedIntersectCountBounded(a: Column, b: Column,
      minNeeded: Column): Column =
    GraftBridge.column(BoundedSortedIntersectCountExpr(
      GraftBridge.expression(a), GraftBridge.expression(b),
      GraftBridge.expression(minNeeded.cast("long"))))

  /** Optimizer pushdown barrier: identity on the wrapped column,
    * flagged non-deterministic (see OptimizerFenceExpr). */
  def fence(c: Column): Column =
    GraftBridge.column(OptimizerFenceExpr(GraftBridge.expression(c)))
}
