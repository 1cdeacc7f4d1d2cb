package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4 made `Column` engine-agnostic (ColumnNode-backed); the classic
  * converters live in `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]`. Extension libraries conventionally bridge from
  * inside the `org.apache.spark.sql` namespace (same pattern as public
  * Spark extension projects, cf. SNIPPETS.md [1][3]).
  */
object GraftInternal {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
