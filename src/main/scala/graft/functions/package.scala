package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ArrayDotProduct, GraftExprBridge}

/** Public column helpers backed by graft's native Catalyst
  * expressions (no Scala UDFs, no interpreted lambdas in hot paths).
  */
package object functions {

  /** dot(a, b) as double; a, b are array<float> columns. */
  def arrayDot(a: Column, b: Column): Column =
    GraftExprBridge.column(
      ArrayDotProduct(GraftExprBridge.expression(a), GraftExprBridge.expression(b)))

  /** L2 norm of a float-array column. */
  def arrayNorm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(arrayDot(a, a))
}
