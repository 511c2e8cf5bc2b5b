package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge.
  *
  * Spark 4 made the converters (`classic.ExpressionUtils`) private[sql];
  * custom Catalyst expressions (graft.stats.KllSketchAggExpr,
  * graft.functions.SimHash64) still need to surface as user-facing
  * `Column`s. This object lives in the org.apache.spark.sql package purely
  * to re-export those two public-in-effect functions to graft code.
  */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
