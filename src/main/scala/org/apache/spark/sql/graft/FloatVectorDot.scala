// Hosted under org.apache.spark.sql so the expression can use the
// private[sql] typing API (AbstractDataType / ExpectsInputTypes) —
// the standard placement for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `array<float>`
  * columns, accumulated in double.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0D, +)`
  * (sequential left-to-right double accumulation — bit-compatible
  * with the SQL formulation and the DuckDB oracle), but ~an order of
  * magnitude cheaper per row: the higher-order-function version
  * allocates an intermediate 64-element array and interprets two
  * lambdas per pair, while this compiles (doGenCode) to a tight
  * primitive loop inside whole-stage codegen. At 10⁶–10⁹ candidate
  * pairs (similarity search / embedding dedup), that allocation is
  * the dominant cost.
  *
  * SURVEY §7.3 tier (b): custom Expression where the built-in
  * operators can't express the performance, not the semantics.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry point (bridges the private[sql] Column↔
  * Expression conversion for code outside this package).
  */
object FloatVectorDot {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatVectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
