package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters, for
  * exposing custom Catalyst expressions (graft.functions._) as Columns.
  * Spark 4 hid `Column.expr`/`new Column(expr)` behind the classic
  * module; a package-local bridge is the standard extension-library
  * pattern for native expressions (no reflection, no UDF fallback).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
