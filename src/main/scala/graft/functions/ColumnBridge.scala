// The one file in this library compiled into Spark's own package: Spark 4
// moved Column off Catalyst Expressions onto ColumnNodes, and the two
// bridge functions (classic.ExpressionUtils.column/expression) are
// private[sql]. Libraries shipping native Catalyst expressions need
// exactly those two calls to offer typed Column helpers without routing
// through SQL-string parsing (injection-prone, breaks on qualified
// names — r13 ADVICE). Nothing else may live here.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
