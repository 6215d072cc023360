package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column↔Expression conversions (Spark
  * 4 moved Column to sql-api with an opaque node representation; the
  * classic conversions are package-private). This is the supported
  * pattern for libraries shipping native Catalyst expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
