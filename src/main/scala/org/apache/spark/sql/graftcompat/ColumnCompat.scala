package org.apache.spark.sql.graftcompat

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `Column` an API-only wrapper
  * over ColumnNode and hid the expression constructors behind
  * `private[sql] ExpressionUtils`; a custom native Catalyst expression
  * still needs both directions. This one-file shim lives inside the
  * `org.apache.spark.sql` namespace purely to satisfy that access
  * qualifier — the standard pattern for Spark extension libraries. */
object ColumnCompat {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly converts the Column's node tree into ordinary Catalyst
    * expressions (UnresolvedFunction etc. — things the analyzer resolves
    * in place). `ExpressionUtils.expression` instead wraps the tree in a
    * lazy ColumnNodeExpression bridge, which function-registry builders
    * cannot return: the analyzer never looks inside it and codegen dies
    * on the unresolved wrapper. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
