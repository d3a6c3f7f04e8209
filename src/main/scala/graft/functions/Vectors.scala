package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FloatVectorDot

/** Dense-vector column helpers over `array<float>` embeddings.
  *
  * The dot product is a custom codegen'd Catalyst expression
  * ([[FloatVectorDot]]) — bit-compatible with the higher-order
  * `aggregate(zip_with(...))` formulation (sequential double
  * accumulation, so the DuckDB oracle still matches) but without the
  * per-row intermediate array allocation.
  *
  * Scale note: these are per-row scalar expressions — they pipeline
  * inside whole-stage codegen and add no shuffle.
  */
object Vectors {

  def dot(a: String, b: String): Column = FloatVectorDot(col(a), col(b))

  def norm(a: String): Column = sqrt(dot(a, a))

  /** cosine(a, b) given precomputed norms (norm once per row, not per pair). */
  def cosine(a: String, b: String, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
