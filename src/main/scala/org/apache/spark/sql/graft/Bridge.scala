package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's package-private Column ⇄ Expression
  * converters (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * graft's native expressions get Column-API entry points. Same
  * pattern as public Spark-extension libraries (e.g. Qbeast's
  * DatasetFactory); no Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
