package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Registry-free bridge between graft's native Catalyst expressions and
  * the Column API. `functions.call_udf` resolves through the session's
  * function registry, which silently makes every library entry point
  * require `spark.sql.extensions=graft.GraftExtensions` — a session
  * without it fails at analysis. Constructing the Column directly from
  * the Expression removes that coupling for Scala callers; the
  * extension registration remains the SQL-surface path (`expr("…")`,
  * `spark.sql`).
  *
  * Lives in Spark's package because `ExpressionUtils.column/expression`
  * are `private[sql]` — the accepted pattern for libraries extending
  * Catalyst (same technique as frameless/deequ); only public Spark
  * classes are touched.
  */
object GraftNative {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
