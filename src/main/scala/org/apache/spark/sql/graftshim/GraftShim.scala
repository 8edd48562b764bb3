package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal visibility shim: `ExpressionUtils` (the Column ⇄ Expression
  * bridge in Spark 4's classic backend) is `private[sql]`, so extension
  * libraries shipping custom Catalyst expressions need a one-hop accessor
  * inside the `org.apache.spark.sql` namespace. No Spark internals are
  * re-implemented here.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
