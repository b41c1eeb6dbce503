package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Column <-> catalyst Expression bridge for graft's native expressions.
 *
 * Spark 4 backs `Column` by a ColumnNode and gates the classic converters
 * (`classic.ExpressionUtils`) behind `private[sql]`; a library shipping its
 * own codegen'd expressions (e.g. [[graft.frontier.SeenFilter]]'s bloom
 * probe) needs exactly those two one-line converters, so this shim exposes
 * them from inside the package — the same pattern Spark connectors use.
 */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
