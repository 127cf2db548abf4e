package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Util function set (reference `expr/ir/functions/UtilFunctions.scala`,
  * 676 LoC): the few members Spark doesn't already provide verbatim.
  * `land`/`lor` are SQL three-valued `&&`/`||` (same missingness
  * semantics); multi-arg min/max are `least`/`greatest`; `format` is
  * `printf`/`format_string`. */
object Util {

  /** triangle(n) = n(n+1)/2 — the pair-count helper the reference uses
    * for linear-index symmetric matrices. Integral-type-preserving
    * (shift, not true division: n(n+1) is always even). */
  def triangle(n: Column): Column = shiftright(n * (n + 1), 1)

  /** printf-style format with a dynamic format column (reference
    * `format`): codegen'd via Spark's `printf`. */
  def format(fmt: Column, args: Column*): Column =
    call_function("printf", (fmt +: args): _*)

  /** valuesSimilar (reference `UtilFunctions.scala` `valuesSimilar`):
    * approximate numeric equality with relative `tolerance`, treating
    * two nulls (and optionally two NaNs) as similar. */
  def valuesSimilar(a: Column, b: Column, tolerance: Double = 1e-6,
      absolute: Boolean = false): Column = {
    val bothNull = a.isNull && b.isNull
    val bothNaN = a.cast("double").isNaN && b.cast("double").isNaN
    val diff = abs(a.cast("double") - b.cast("double"))
    val close =
      if (absolute) diff <= tolerance
      else diff <= lit(tolerance) *
        greatest(abs(a.cast("double")), abs(b.cast("double")), lit(1.0))
    bothNull || (a.isNotNull && b.isNotNull && (bothNaN || close))
  }
}
