package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for the engine's native functions,
  * so they are callable from SQL text as well as the Column API:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)  // or
  *   spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
  *
  * [[GraftExtensions.install]] registers the same functions on an
  * already-built session (the harness builds its own sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[FloatVectorDot].getName, null, name, usage, "", "", "", "", "", "", "scala_udf")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_vector_dot"),
      info("float_vector_dot", "float_vector_dot(a, b) - double dot product of two float arrays"),
      (children: Seq[Expression]) => FloatVectorDot(children(0), children(1))),
    (FunctionIdentifier("gcd"),
      info("gcd", "gcd(a, b) - greatest common divisor"),
      (children: Seq[Expression]) => Gcd(children(0), children(1))),
    (FunctionIdentifier("lcm"),
      info("lcm", "lcm(a, b) - least common multiple"),
      (children: Seq[Expression]) => Lcm(children(0), children(1))))

  /** Register on a live session (idempotent). */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "scala_udf")
    }
}
