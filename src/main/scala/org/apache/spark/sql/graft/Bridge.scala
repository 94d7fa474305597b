package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge to Spark's `private[sql]` Column <-> Expression
  * converters (Spark 4 wraps Column around ColumnNode; the classic
  * converter lives behind package-private API). Standard extension-library
  * pattern: one tiny file inside the org.apache.spark.sql namespace,
  * everything else stays in graft.*.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
