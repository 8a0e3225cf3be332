package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column↔Expression bridges for the native-function helpers.
  *
  * Every `xxx(spark, colName, ...)` helper used to build its Column via
  * `expr(s"fn($colName)")` — SQL string interpolation that breaks for
  * qualified or backtick-needing column names and is injection-prone
  * (r13 ADVICE on text_shingles; same pattern everywhere). Building the
  * Catalyst expression directly sidesteps the SQL parser entirely:
  * `col(name)` handles dotted paths / backtick escapes itself, and the
  * parameter is a typed Int, not spliced text.
  */
private[graft] object Cols {

  /** The (unresolved) expression for a user-facing column name. */
  def expression(name: String): Expression =
    GraftColumnBridge.expression(org.apache.spark.sql.functions.col(name))

  /** The expression under an arbitrary Column — for native-function
    * helpers applied to DERIVED columns (hash64 of a substring, a lambda
    * variable inside `transform`), not just named ones.
    */
  def expressionOf(c: Column): Expression = GraftColumnBridge.expression(c)

  def column(e: Expression): Column = GraftColumnBridge.column(e)
}
