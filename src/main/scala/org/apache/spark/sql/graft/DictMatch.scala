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
  * size is dictionary-sized, never data-sized.
  */
final class AcAutomaton(terms: Array[String]) extends Serializable {
  require(terms.nonEmpty, "dictionary must not be empty")
  require(terms.forall(_.nonEmpty), "dictionary terms must be non-empty")
  require(terms.distinct.length == terms.length, "dictionary terms must be distinct")

  val nTerms: Int = terms.length

  // trie over codepoints: transitions keyed (state << 32 | codepoint)
  private val trans = new java.util.HashMap[java.lang.Long, Integer]()
  private var nStates = 1
  private val termAt = scala.collection.mutable.ArrayBuffer[Int](-1) // term ending at node
  private val fail = scala.collection.mutable.ArrayBuffer[Int](0)
  private val outLink = scala.collection.mutable.ArrayBuffer[Int](-1) // nearest term-end via fails

  private def key(s: Int, c: Int): java.lang.Long = (s.toLong << 32) | (c.toLong & 0xffffffffL)

  locally {
    var t = 0
    while (t < terms.length) {
      val cps = terms(t).codePoints().toArray
      var s = 0
      var i = 0
      while (i < cps.length) {
        val nxt = trans.get(key(s, cps(i)))
        if (nxt == null) {
          trans.put(key(s, cps(i)), nStates)
          termAt += -1; fail += 0; outLink += -1
          s = nStates
          nStates += 1
        } else s = nxt
        i += 1
      }
      termAt(s) = t
      t += 1
    }
    // BFS fail links (root's children fail to root)
    val queue = new java.util.ArrayDeque[Integer]()
    val edges = new java.util.ArrayList[(Long, Int)]() // snapshot: mutation-free iteration
    trans.forEach((k, v) => { edges.add((k.longValue(), v.intValue())); () })
    // children by state for BFS order: build adjacency
    val childs = Array.fill(nStates)(List.empty[(Int, Int)]) // (codepoint, node)
    edges.forEach { case (k, v) =>
      childs((k >>> 32).toInt) = ((k & 0xffffffffL).toInt, v) :: childs((k >>> 32).toInt)
    }
    childs(0).foreach { case (_, v) => fail(v) = 0; queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      // output link: the nearest proper suffix that IS a term
      outLink(u) = if (termAt(fail(u)) >= 0) fail(u) else outLink(fail(u))
      childs(u).foreach { case (c, v) =>
        var f = fail(u)
        var nxt = trans.get(key(f, c))
        while (nxt == null && f != 0) { f = fail(f); nxt = trans.get(key(f, c)) }
        fail(v) = if (nxt == null || nxt == v) 0 else nxt
        queue.add(v)
      }
    }
  }

  private val termAtArr = termAt.toArray
  private val failArr = fail.toArray
  private val outLinkArr = outLink.toArray

  private def step(s0: Int, c: Int): Int = {
    var s = s0
    while (true) {
      val nxt = trans.get(key(s, c))
      if (nxt != null) return nxt.intValue()
      if (s == 0) return 0
      s = failArr(s)
    }
    0
  }

  /** Per-term occurrence counts over `text` — index i counts term i
    * (constructor order), every match position counted, overlaps
    * included: identical to the positional brute force
    * `|{p : substr(text, p, len(term)) = term}|` per term.
    */
  def matchCounts(text: UTF8String): ArrayData = {
    val counts = new Array[Long](nTerms)
    val s = text.toString
    var state = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      state = step(state, cp)
      if (termAtArr(state) >= 0) counts(termAtArr(state)) += 1
      var o = outLinkArr(state)
      while (o >= 0) { counts(termAtArr(o)) += 1; o = outLinkArr(o) }
      i += Character.charCount(cp)
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }
}

/** Native expression: `string` → `array<long>` of per-dictionary-term
  * occurrence counts (overlaps included) via one Aho-Corasick pass.
  * See [[AcAutomaton]] for why this beats K regexp scans at scale.
  */
case class DictMatchCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val automaton = new AcAutomaton(terms.toArray)

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
}
