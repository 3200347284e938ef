package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ⇄ Expression bridge. `ExpressionUtils` is `private[sql]` in
  * Spark 4, so libraries that define native Catalyst expressions expose
  * them through a shim in the `org.apache.spark.sql` package — the same
  * approach Spark ecosystem libraries use. This object and the expressions
  * behind it are the ONLY code outside `graft.*`.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Lazy wrapper — fine inside DataFrame plans, where the analyzer
    * unwraps it during plan conversion.
    */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager conversion to a real Catalyst tree — required when the result
    * must be analyzable on its own (e.g. returned from a function-registry
    * builder): the lazy `ColumnNodeExpression` wrapper is Unevaluable and
    * opaque to the analyzer there.
    */
  def convertedExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
