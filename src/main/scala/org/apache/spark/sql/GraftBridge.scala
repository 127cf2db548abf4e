package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters — the
  * plumbing a library needs to hand Catalyst a custom native `Expression`
  * (with `doGenCode`) without a FunctionRegistry round-trip. Lives in the
  * `org.apache.spark.sql` package solely for access; contains no logic. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
