package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Allele classification kernels (reference
  * `python/hail/expr/functions.py:3576` `numeric_allele_type`,
  * `python/hail/genetics/allele_type.py`). Pure Column expressions over the
  * row (variant) space — per-variant cost, never per-entry. */
object Alleles {

  // AlleleType codes (reference `allele_type.py:17` IntEnum order)
  val Unknown = 0
  val Snp = 1
  val Mnp = 2
  val Insertion = 3
  val Deletion = 4
  val Complex = 5
  val Star = 6
  val Symbolic = 7

  private val BaseRe = "^[ACGTNM]+$"
  private val SymbolicRe = "(^\\.)|(\\.$)|(^<)|(>$)|(\\[)|(\\])"

  /** reverse_complement (reference `expr/functions.py:6254`): reverse
    * the sequence and complement the bases, case-preserving; non-base
    * characters pass through. Pure `reverse(translate(...))` — codegen'd. */
  def reverseComplement(s: Column, rna: Boolean = false): Column =
    if (rna) reverse(translate(s, "AUTGCautgc", "UAACGuaacg"))
    else reverse(translate(s, "ATGCatgc", "TACGtacg"))

  /** Number of differing positions between two same-length strings. */
  def hammingSameLen(a: Column, b: Column): Column =
    size(filter(
      zip_with(split(a, ""), split(b, ""),
        (x, y) => x =!= y),
      d => d))

  /** Numeric allele type of (ref, alt) per the reference classification. */
  def alleleType(ref: Column, alt: Column): Column =
    when(!ref.rlike(BaseRe), Unknown)
      .otherwise(
        when(alt.rlike(BaseRe),
          when(length(ref) === length(alt),
            when(length(ref) === 1,
              when(ref =!= alt, Snp).otherwise(Unknown))
              .otherwise(
                when(hammingSameLen(ref, alt) === 1, Snp).otherwise(Mnp)))
            .when(length(ref) < length(alt) &&
              substring(ref, 1, 1) === substring(alt, 1, 1) &&
              alt.endsWith(substring(ref, 2, 1000000)), Insertion)
            .when(substring(ref, 1, 1) === substring(alt, 1, 1) &&
              ref.endsWith(substring(alt, 2, 1000000)), Deletion)
            .otherwise(Complex))
          .when(alt === "*", Star)
          .when(alt.rlike(SymbolicRe), Symbolic)
          .otherwise(Unknown))

  /** For a SNP (possibly inside same-length alleles), the (ref, alt) base
    * pair at the first differing position. */
  private def snpPair(ref: Column, alt: Column): Column =
    element_at(filter(
      zip_with(split(ref, ""), split(alt, ""),
        (x, y) => struct(x.as("r"), y.as("a"))),
      p => p("r") =!= p("a")), 1)

  /** Transition (A<->G, C<->T) vs transversion for SNP alleles. */
  def isTransition(ref: Column, alt: Column): Column = {
    val p = snpPair(ref, alt)
    val r = p("r"); val a = p("a")
    (r === "A" && a === "G") || (r === "G" && a === "A") ||
      (r === "C" && a === "T") || (r === "T" && a === "C")
  }

  def isSnp(ref: Column, alt: Column): Column =
    alleleType(ref, alt) === Snp

  /** Minimal representation of (position, ref, alt): trim shared suffix,
    * then shared prefix, adjusting position (reference `min_rep`,
    * `functions/LocusFunctions.scala`; used by split_multi). Per-variant
    * UDF — row space, off the entry hot path. */
  val minRepUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (position: Int, ref: String, alt: String) =>
      var r = ref; var a = alt; var pos = position
      while (r.length > 1 && a.length > 1 && r.last == a.last) {
        r = r.init; a = a.init
      }
      while (r.length > 1 && a.length > 1 && r.head == a.head) {
        r = r.tail; a = a.tail; pos += 1
      }
      (pos, r, a)
    }

  def minRep(position: Column, ref: Column, alt: Column): Column =
    minRepUdf(position, ref, alt).cast(
      "struct<position:int,ref:string,alt:string>")

  /** Multi-allele minimal representation (reference `hl.min_rep` over a
    * full alleles array, `functions/LocusFunctions.scala`): trim the
    * suffix shared by ref AND every alt, then the shared prefix,
    * adjusting position. Star alleles (length 1) stop trimming, as in
    * the reference. Per-variant UDF — row space, off the entry path. */
  val minRepMultiUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (position: Int, ref: String, alts: Seq[String]) =>
      var pos = position
      var r = ref
      var as = alts.toArray
      @inline def trimmable(last: Boolean): Boolean = {
        // empty alts (a discarded all-filtered row evaluated early by
        // pushdown) must be identity, not ref-trimming
        if (as.isEmpty || r.length <= 1 || as.exists(_.length <= 1)) false
        else {
          val c = if (last) r.last else r.head
          as.forall(a => (if (last) a.last else a.head) == c)
        }
      }
      while (trimmable(last = true)) {
        r = r.init; as = as.map(_.init)
      }
      while (trimmable(last = false)) {
        r = r.tail; as = as.map(_.tail); pos += 1
      }
      (pos, r, as.toSeq)
    }

  def minRepMulti(position: Column, ref: Column, alts: Column): Column =
    minRepMultiUdf(position, ref, alts).cast(
      "struct<position:int,ref:string,alt:array<string>>")
}
