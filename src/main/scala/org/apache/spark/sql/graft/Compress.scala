// Hosted under org.apache.spark.sql for the private[sql] typing API —
// same placement as the other native expressions (TextHash.scala).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel behind [[DeflateSize]] — the static-forwarder
  * pattern of [[TextHashUtil]]: `doGenCode` emits one static call,
  * the compression loop is ordinary compiled JVM code.
  */
object CompressUtil {

  /** DEFLATE-compressed size (raw stream, no zlib header, fixed
    * level) of a string's UTF-8 bytes. Deterministic for a given
    * input + level on a given JDK (the oracle replays exported
    * sizes, so only run-to-run determinism is load-bearing). A
    * fresh Deflater per call keeps the expression thread-safe and
    * state-free across rows; the dictionary window is tiny (32 KiB)
    * and `end()` releases the native buffer eagerly.
    */
  def deflateSize(text: UTF8String, level: Int): Long = {
    val bytes = text.getBytes
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      // Long accumulator: raw deflate of incompressible input near
      // the 2 GB string limit exceeds Int.MaxValue (stored blocks add
      // ~5 bytes per 64 KiB) — an Int would wrap negative
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** Native expression: `string` → DEFLATE-compressed byte count at a
  * fixed compression level. The compression-RATIO quality signal
  * (comp/raw) is the cheap gibberish-and-boilerplate detector of web
  * corpus pipelines: highly repetitive spam compresses far below
  * natural text, random noise barely compresses at all — one pass,
  * no shuffle, no model.
  */
case class DeflateSize(child: Expression, level: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(level >= 0 && level <= 9, s"deflate level must be in [0, 9], got $level")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "deflate_size"

  override protected def nullSafeEval(text: Any): Any =
    CompressUtil.deflateSize(text.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CompressUtil.deflateSize($c, $level)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {
  def apply(c: Column, level: Int): Column =
    ExpressionUtils.column(DeflateSize(ExpressionUtils.expression(c), level))
}
