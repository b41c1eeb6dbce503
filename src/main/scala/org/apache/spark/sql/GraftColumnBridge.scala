package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into `private[sql]` Column construction (Spark 4's classic
 * `ExpressionUtils.column`) so graft's native expressions can be used as
 * `Column`s directly, without a round-trip through the function registry or
 * a SQL string (which would re-embed the literal this is meant to hide —
 * see graft.sched.RuntimeConst). Standard extension-project pattern: one
 * tiny object in the org.apache.spark.sql package, no Spark internals
 * re-implemented.
 */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
