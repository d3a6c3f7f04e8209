// Hosted under org.apache.spark.sql so the expressions can use the
// private[sql] typing API (AbstractDataType / ExpectsInputTypes) —
// the standard placement for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind [[ShingleHashes]] / [[MinHashSignature]].
  *
  * Kept as plain object methods (scalac emits static forwarders on
  * the `MinHashUtil` class) so the expressions' `doGenCode` can emit
  * a single static call and stay inside whole-stage codegen — the
  * loops themselves are ordinary compiled JVM code, which is the
  * whole point: per-document work happens in one tight pass instead
  * of per-row expression-tree evaluation.
  */
object MinHashUtil {

  private val Space = UTF8String.fromString(" ")

  /** Distinct xxhash64 values (seed 42, Spark's `xxhash64`) of the
    * k-token shingles of `tokens` — bit-identical to
    * `array_distinct(transform(sequence(0, n-k), i ->
    * xxhash64(concat_ws(' ', tokens[i], …, tokens[i+k-1]))))`, but
    * one pass, no per-shingle string array materialization in the
    * plan. Output is sorted ascending (set semantics downstream:
    * signature mins and array_intersect/array_union cardinalities
    * are order-independent).
    */
  def shingleHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Long](math.max(n - k + 1, 0))
    val window = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { window(j) = tokens.getUTF8String(i + j); j += 1 }
      val sh = UTF8String.concatWs(Space, window: _*)
      out(i) = XXH64.hashUnsafeBytes(sh.getBaseObject, sh.getBaseOffset, sh.numBytes, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    // unique in place (sorted): the distinct set of shingle hashes
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, w))
  }

  /** The n-hash MinHash signature of a hashed shingle set —
    * bit-identical to the aggregate formulation
    * `min(xxhash64(h, k)) GROUP BY doc` for k in [0, n): Spark's
    * `xxhash64(h, lit(k))` chains `hashInt(k, hashLong(h, 42))`
    * (int literal → hashInt), reproduced here, so signatures (hence
    * LSH bands and candidate pairs) are unchanged — only the
    * execution shape is: one pass over the shingle hashes where the
    * document row already sits, instead of explode + a
    * 128-buffer-slot aggregation shuffle.
    */
  def minhashSig(hashes: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val m = hashes.numElements()
    var i = 0
    while (i < m) {
      val h1 = XXH64.hashLong(hashes.getLong(i), 42L)
      var k = 0
      while (k < numHashes) {
        val v = XXH64.hashInt(k, h1)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }
}

/** Native expression: `array<string>` tokens → sorted distinct
  * `array<long>` of k-token-shingle xxhash64 values (see
  * [[MinHashUtil.shingleHashes]]). SURVEY §7.3 tier (b): the
  * composed-builtin formulation (transform + concat_ws +
  * array_distinct + transform + xxhash64) allocates two intermediate
  * arrays and interprets lambdas per element; this is one compiled
  * pass per document.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(tokens: Any): Any =
    MinHashUtil.shingleHashes(tokens.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MinHashUtil.shingleHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(tokens: Column, k: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(tokens), k))
}

/** Native expression: hashed shingle set (`array<long>`) → MinHash
  * signature (`array<long>` of length `numHashes`). Replaces the
  * explode + groupBy(min×128) aggregation with a per-row pass — no
  * shuffle, no 128-column aggregate buffer (and therefore no
  * dependence on spark.sql.codegen.maxFields for the compiled tier).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(hashes: Any): Any =
    MinHashUtil.minhashSig(hashes.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MinHashUtil.minhashSig($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(hashes: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(hashes), numHashes))
}
