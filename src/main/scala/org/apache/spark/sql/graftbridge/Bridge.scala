/*
 * Bridge into Spark's private[sql] Column <-> Expression conversions, the
 * standard technique for extension libraries that ship native Catalyst
 * expressions (the public API intentionally hides Expression since the
 * Spark 4 sql-api split). Lives under org.apache.spark.sql so private[sql]
 * members resolve; keep this file free of any logic beyond the two
 * conversions.
 */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object Bridge {
  /** Wrap a catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a user-facing Column to its catalyst Expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
