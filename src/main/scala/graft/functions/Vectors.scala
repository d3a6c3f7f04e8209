package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column helpers over `array<float>` embeddings.
  *
  * Built on Spark's higher-order functions (`zip_with`/`aggregate`) —
  * native Catalyst expressions, no UDF serialization. Math is done in
  * DOUBLE so results are engine-comparable (the oracle computes in
  * double too).
  *
  * Scale note: these are per-row scalar expressions — they pipeline
  * inside whole-stage-adjacent operators and add no shuffle.
  */
object Vectors {

  /** SQL fragment for a double-precision dot product of two
    * array columns (usable in expr()/oracle-mirrored logic).
    */
  def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"

  def dot(a: String, b: String): Column = expr(dotExpr(a, b))

  def norm(a: String): Column = sqrt(expr(dotExpr(a, a)))

  /** cosine(a, b) given precomputed norms (norm once per row, not per pair). */
  def cosine(a: String, b: String, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
