package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

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
      (children: Seq[Expression]) => Lcm(children(0), children(1))),
    // Spark's internal runtime-filter expressions, exposed as SQL so a
    // query can build the semi-join reduction InjectRuntimeFilter
    // performs — explicitly: a bloom sketch of the dim keys evaluated
    // as a scalar subquery, probed on the fact side before the join.
    // The aggregate merges per-partition sketches (OR of bit arrays),
    // so the build is one pass with no shuffle of the key set.
    (FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg",
        "bloom_filter_agg(xxhash64_key[, est_items[, num_bits]]) - bloom-filter sketch of a LONG key column"),
      (children: Seq[Expression]) => children match {
        case Seq(c)       => new BloomFilterAggregate(c)
        case Seq(c, e)    => new BloomFilterAggregate(c, e)
        case Seq(c, e, b) => new BloomFilterAggregate(c, e, b)
        case other => throw new IllegalArgumentException(
          s"bloom_filter_agg expects 1-3 arguments, got ${other.size}")
      }),
    (FunctionIdentifier("might_contain"),
      info("might_contain",
        "might_contain(bloom, xxhash64_value) - probabilistic membership; false means definitely absent"),
      (children: Seq[Expression]) => BloomFilterMightContain(children(0), children(1))))

  /** Register on a live session (idempotent). */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "scala_udf")
    }
}
