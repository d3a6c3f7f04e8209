// Hosted under org.apache.spark.sql so the expressions can use the
// private[sql] typing API (AbstractDataType / ExpectsInputTypes) —
// the standard placement for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind [[CharNgramHashes]] / [[SimHash64]] — same
  * static-forwarder pattern as [[MinHashUtil]]: `doGenCode` emits one
  * static call, the loop is ordinary compiled JVM code.
  */
object TextHashUtil {

  /** Sorted-distinct xxhash64 values (seed 42) of the character
    * n-grams of `text` — bit-identical to
    * `array_distinct(transform(sequence(1, length(text) - n + 1),
    * i -> xxhash64(substr(text, i, n))))`: grams are taken by
    * codepoint (`UTF8String.substringSQL`, the `substr` kernel) and
    * hashed over their UTF8 bytes, but in one compiled pass instead
    * of a per-element interpreted lambda allocating a catalyst row
    * per gram.
    */
  def charNgramHashes(text: UTF8String, n: Int): ArrayData = {
    val chars = text.numChars()
    val out = new Array[Long](math.max(chars - n + 1, 0))
    var i = 0
    while (i <= chars - n) {
      val g = text.substringSQL(i + 1, n)
      out(i) = XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, w))
  }

  /** 64-bit SimHash over a token array — bit-identical to the
    * explode + groupBy formulation (per-token `hw = xxhash64(w)`,
    * 64 per-bit vote sums `sum(if(shiftright(hw,i)&1=1, 1, -1))`,
    * bits with positive votes recombined), but one pass per document
    * where the row sits: no exploded token stream, no 64-column
    * aggregate buffer, no shuffle.
    */
  /** |a ∩ b| for sorted distinct long arrays — one merge pass, no
    * allocation (see [[SortedIntersectCount]]).
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val hw = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((hw >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** Native expression: intersection cardinality of two SORTED
  * distinct `array<long>` columns by linear merge — equal to
  * `size(array_intersect(a, b))` on such inputs (and
  * `size(array_union(a, b))` is then `size(a) + size(b) - this`),
  * without the per-row hash-set build and output-array allocation
  * those generic set operators pay. The dedup verify stages evaluate
  * this once per CANDIDATE PAIR over ~10²–10³-element gram/shingle
  * sets, which is where blocked-join dedup spends its time.
  *
  * Precondition (callers: [[graft.pipeline.Dedup]]): both inputs
  * sorted ascending + distinct — exactly what [[ShingleHashes]] and
  * [[CharNgramHashes]] emit.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashUtil.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.TextHashUtil.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SortedIntersectCount(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Native expression: `string` → sorted distinct `array<long>` of
  * character-n-gram xxhash64 values (see
  * [[TextHashUtil.charNgramHashes]]).
  */
case class CharNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "char_ngram_hashes"

  override protected def nullSafeEval(text: Any): Any =
    TextHashUtil.charNgramHashes(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextHashUtil.charNgramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

object CharNgramHashes {
  def apply(text: Column, n: Int): Column =
    ExpressionUtils.column(CharNgramHashes(ExpressionUtils.expression(text), n))
}

/** Native expression: `array<string>` tokens → 64-bit SimHash
  * (`long`). See [[TextHashUtil.simhash64]].
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(tokens: Any): Any =
    TextHashUtil.simhash64(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextHashUtil.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))
}
