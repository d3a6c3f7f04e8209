// Hosted under org.apache.spark.sql for the private[sql] typing API —
// see FloatVectorDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** gcd/lcm — present in the reference's function catalog (DataFusion
  * 44 built-ins, SURVEY §2.8) but absent from Spark's; filled in as
  * native codegen expressions rather than UDFs.
  */
case class Gcd(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "gcd"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Gcd.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.Gcd.gcd($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Gcd =
    copy(left = l, right = r)
}

object Gcd {
  /** Euclid; gcd(0, 0) = 0 (DuckDB-compatible). Runs on signed
    * values (Java % keeps the dividend's sign, which Euclid
    * tolerates) and normalizes the sign at the end — taking
    * |Long.MinValue| up front would stay negative. The one
    * unrepresentable result, gcd = 2⁶³ (both inputs ±2⁶³ or one is
    * ±2⁶³ and the other 0), fails loudly like ANSI overflow.
    */
  def gcd(a: Long, b: Long): Long = {
    var x = a
    var y = b
    while (y != 0) { val t = x % y; x = y; y = t }
    if (x == Long.MinValue)
      throw new ArithmeticException("gcd overflow: result 2^63 exceeds BIGINT range")
    math.abs(x)
  }

  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(Gcd(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

case class Lcm(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "lcm"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Lcm.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.Lcm.lcm($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Lcm =
    copy(left = l, right = r)
}

object Lcm {
  /** lcm via gcd; lcm(x, 0) = 0 (DuckDB-compatible). The product is
    * checked (Math.multiplyExact) so an out-of-range lcm fails loudly
    * like ANSI overflow instead of silently wrapping — DuckDB errors
    * on the same inputs.
    */
  def lcm(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0L
    else {
      val m = Math.multiplyExact(a / Gcd.gcd(a, b), b)
      if (m == Long.MinValue)
        throw new ArithmeticException("lcm overflow: result 2^63 exceeds BIGINT range")
      math.abs(m)
    }

  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(Lcm(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
