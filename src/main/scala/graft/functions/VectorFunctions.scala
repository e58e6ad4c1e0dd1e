package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two float-array columns,
  * returning double.
  *
  * Replaces `aggregate(zip_with(...))` higher-order lambdas in every
  * vector hot path: higher-order functions are interpreted
  * (per-element closure invocation plus a materialized intermediate
  * array), while this expression reads both `ArrayData` buffers
  * directly in generated code — no deserialization, no allocation,
  * stays inside whole-stage codegen.
  *
  * Semantics notes (SQL-exposed via GraftExtensions, so inputs are
  * user-controlled): mismatched lengths dot over the common prefix;
  * null ELEMENTS read as 0.0 (ArrayData.getFloat on a null slot) —
  * both chosen to keep the expression total and branch-free; callers
  * needing strictness should validate dimensions upstream. A null
  * ARRAY on either side returns null (BinaryExpression null-safety).
  *
  * Lives under org.apache.spark.sql because `AbstractDataType` /
  * `ExpressionUtils` are private[sql]; the public API is
  * graft.functions.VectorFunctions.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object GraftExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
