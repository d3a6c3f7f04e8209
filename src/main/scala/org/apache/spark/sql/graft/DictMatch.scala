// Hosted under org.apache.spark.sql so the expression can use the
// private[sql] typing API (AbstractDataType / ExpectsInputTypes) —
// the standard placement for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern automaton over Unicode codepoints:
  * counts ALL occurrences (overlapping included) of every dictionary
  * term in one pass over the text.
  *
  * Why it exists: the blocklist/taxonomy-tagging stage of a web-corpus
  * pipeline (the C4 "bad words" filter shape) matches a dictionary of
  * K terms against every document. K regexp_count scans — or one
  * alternation regex, which still backtracks per position — cost
  * O(K·n) per document; the automaton is O(n + matches) regardless of
  * K, which at 100 TB × a few thousand blocklist terms is the
  * difference between one scan and a thousand. Matching is defined
  * over CODEPOINTS (DuckDB's substr unit), so the oracle's positional
  * replay agrees on any text, not just ASCII.
  *
  * Built once on the driver, shipped to executors inside the
  * expression (eval) or the codegen references array (compiled path);
  * size is dictionary-sized, never data-sized. The match loop is
  * allocation-free per transition: after construction the trie
  * freezes into per-state SORTED codepoint/next arrays probed by
  * binary search (a boxed HashMap probe per character would allocate
  * a key object per transition — GC pressure proportional to corpus
  * bytes inside the scan stage).
  */
final class AcAutomaton(terms: Array[String], caseInsensitive: Boolean = false)
    extends Serializable {
  require(terms.nonEmpty, "dictionary must not be empty")
  require(terms.forall(_.nonEmpty), "dictionary terms must be non-empty")

  /** Locale-stable per-codepoint simple lowercase — applied to BOTH
    * the dictionary (at build) and the text (per scanned codepoint),
    * so matching is defined as `lower(term)` occurring in
    * `lower(text)`. `Character.toLowerCase(int)` is the Unicode
    * simple 1:1 mapping (no locale, no length change — unlike
    * `String.toLowerCase`'s Turkish-İ/ß full mappings), which is the
    * same table DuckDB's utf8proc-backed `lower()` applies, so the
    * oracle can replay the fold per-engine and agree codepoint-wise.
    */
  private def fold(cp: Int): Int = if (caseInsensitive) Character.toLowerCase(cp) else cp

  private def foldTerm(t: String): String =
    if (!caseInsensitive) t
    else {
      val sb = new java.lang.StringBuilder(t.length)
      var i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        sb.appendCodePoint(Character.toLowerCase(cp))
        i += Character.charCount(cp)
      }
      sb.toString
    }

  private val builtTerms: Array[String] = terms.map(foldTerm)
  require(builtTerms.distinct.length == builtTerms.length,
    "dictionary terms must be distinct" +
      (if (caseInsensitive) " after case folding" else ""))

  val nTerms: Int = terms.length

  // frozen automaton: per-state sorted transition arrays + links —
  // the ONLY state serialized to executors (builder maps stay local
  // to the build method)
  private val frozen: AcAutomaton.Frozen = AcAutomaton.build(builtTerms)
  private val gotoChars = frozen.gotoChars
  private val gotoNext = frozen.gotoNext
  private val termAt = frozen.termAt
  private val fail = frozen.fail
  private val outLink = frozen.outLink

  /** trans(s, c) via binary search on the frozen arrays; -1 if absent. */
  private def edge(s: Int, c: Int): Int = {
    val ks = gotoChars(s)
    var lo = 0
    var hi = ks.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val k = ks(mid)
      if (k == c) return gotoNext(s)(mid)
      else if (k < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  private def step(s0: Int, c: Int): Int = {
    var s = s0
    while (true) {
      val nxt = edge(s, c)
      if (nxt >= 0) return nxt
      if (s == 0) return 0
      s = fail(s)
    }
    0
  }

  /** Per-term occurrence counts over `text` — index i counts term i
    * (constructor order), every match position counted, overlaps
    * included: identical to the positional brute force
    * `|{p : substr(text, p, len(term)) = term}|` per term. The one
    * per-row allocation is the String materialization for codepoint
    * iteration (the same copy every regexp expression pays); the
    * transition loop itself allocates nothing.
    */
  def matchCounts(text: UTF8String): ArrayData = {
    val counts = new Array[Long](nTerms)
    val s = text.toString
    var state = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      state = step(state, fold(cp))
      if (termAt(state) >= 0) counts(termAt(state)) += 1
      var o = outLink(state)
      while (o >= 0) { counts(termAt(o)) += 1; o = outLink(o) }
      i += Character.charCount(cp)
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }
}


object AcAutomaton {
  /** The serialized match-time state — see [[AcAutomaton]]. */
  final case class Frozen(gotoChars: Array[Array[Int]], gotoNext: Array[Array[Int]],
      termAt: Array[Int], fail: Array[Int], outLink: Array[Int]) extends Serializable

  private[graft] def build(terms: Array[String]): Frozen = {
    // build phase: boxed map keyed (state << 32 | codepoint) — fine
    // here, this runs once per dictionary on the driver
    val trans = new java.util.HashMap[java.lang.Long, Integer]()
    def key(s: Int, c: Int): java.lang.Long = (s.toLong << 32) | (c.toLong & 0xffffffffL)
    var nStates = 1
    val termAtB = scala.collection.mutable.ArrayBuffer[Int](-1)
    var t = 0
    while (t < terms.length) {
      val cps = terms(t).codePoints().toArray
      var s = 0
      var i = 0
      while (i < cps.length) {
        val nxt = trans.get(key(s, cps(i)))
        if (nxt == null) {
          trans.put(key(s, cps(i)), nStates)
          termAtB += -1
          s = nStates
          nStates += 1
        } else s = nxt
        i += 1
      }
      termAtB(s) = t
      t += 1
    }
    val failB = new Array[Int](nStates)
    val outB = Array.fill(nStates)(-1)
    // adjacency for the BFS + the frozen arrays
    val childs = Array.fill(nStates)(List.empty[(Int, Int)]) // (codepoint, node)
    trans.forEach { (k, v) =>
      val st = (k.longValue() >>> 32).toInt
      childs(st) = ((k.longValue() & 0xffffffffL).toInt, v.intValue()) :: childs(st)
    }
    val queue = new java.util.ArrayDeque[Integer]()
    childs(0).foreach { case (_, v) => failB(v) = 0; queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      // output link: the nearest proper suffix that IS a term
      outB(u) = if (termAtB(failB(u)) >= 0) failB(u) else outB(failB(u))
      childs(u).foreach { case (c, v) =>
        var f = failB(u)
        var nxt = trans.get(key(f, c))
        while (nxt == null && f != 0) { f = failB(f); nxt = trans.get(key(f, c)) }
        failB(v) = if (nxt == null || nxt == v) 0 else nxt
        queue.add(v)
      }
    }
    // freeze: per-state sorted (codepoint, next) pairs
    val gc = new Array[Array[Int]](nStates)
    val gn = new Array[Array[Int]](nStates)
    var s = 0
    while (s < nStates) {
      val kids = childs(s).sortBy(_._1)
      gc(s) = kids.map(_._1).toArray
      gn(s) = kids.map(_._2).toArray
      s += 1
    }
    Frozen(gc, gn, termAtB.toArray, failB, outB)
  }

}

/** Native expression: `string` → `array<long>` of per-dictionary-term
  * occurrence counts (overlaps included) via one Aho-Corasick pass.
  * See [[AcAutomaton]] for why this beats K regexp scans at scale.
  */
case class DictMatchCounts(child: Expression, terms: Seq[String],
    caseInsensitive: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val automaton = new AcAutomaton(terms.toArray, caseInsensitive)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "dict_match_counts"

  override protected def nullSafeEval(text: Any): Any =
    automaton.matchCounts(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the built automaton rides the codegen references array — the
    // standard vehicle for non-literal expression state
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.matchCounts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): DictMatchCounts =
    copy(child = newChild)
}

object DictMatchCounts {
  def apply(text: Column, terms: Seq[String]): Column =
    ExpressionUtils.column(DictMatchCounts(ExpressionUtils.expression(text), terms))
  def apply(text: Column, terms: Seq[String], caseInsensitive: Boolean): Column =
    ExpressionUtils.column(
      DictMatchCounts(ExpressionUtils.expression(text), terms, caseInsensitive))
}
