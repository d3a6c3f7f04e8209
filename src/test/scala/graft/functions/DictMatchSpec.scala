package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AcAutomaton, DictMatchCounts}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Aho-Corasick dictionary matcher: classic suffix-link cases,
  * overlap counting, codepoint semantics, and a seeded brute-force
  * equivalence law (the positional definition the DuckDB oracle
  * replays).
  */
class DictMatchSpec extends SparkSpec {
  import spark.implicits._

  private def counts(dict: Seq[String], text: String): Seq[Long] = {
    val arr = new AcAutomaton(dict.toArray).matchCounts(UTF8String.fromString(text))
    (0 until arr.numElements()).map(arr.getLong)
  }

  /** Positional brute force over codepoints — the definition. */
  private def brute(dict: Seq[String], text: String): Seq[Long] = {
    val cps = text.codePoints().toArray
    dict.map { t =>
      val tc = t.codePoints().toArray
      (0 to cps.length - tc.length)
        .count(p => tc.indices.forall(i => cps(p + i) == tc(i))).toLong
    }
  }

  test("classic she/he/hers fixture: suffix links emit nested matches") {
    // "ushers": "she" at 1, "he" at 2 (inside "she"), "hers" at 2
    assert(counts(Seq("he", "she", "hers", "his"), "ushers") === Seq(1L, 1L, 1L, 0L))
  }

  test("overlapping occurrences all count") {
    assert(counts(Seq("a", "aa", "aaa"), "aaaa") === Seq(4L, 3L, 2L))
    assert(counts(Seq("abab"), "ababab") === Seq(2L)) // overlap at stride 2
  }

  test("codepoint semantics: supplementary characters are one position") {
    val x = new String(Character.toChars(0x1D54F)) // 𝕏, outside the BMP
    assert(counts(Seq(s"${x}b", "b"), s"a${x}b$x") === Seq(1L, 1L))
  }

  test("seeded brute-force equivalence over random dictionaries and texts") {
    val termGen = Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString)
    val textGen = Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString)
    (0 until 40).foreach { i =>
      val dict = (0 until 6)
        .flatMap(j => termGen.apply(Gen.Parameters.default, Seed(100L * i + j)))
        .distinct
      val text = textGen.apply(Gen.Parameters.default, Seed(7L * i + 3)).getOrElse("")
      assert(counts(dict, text) === brute(dict, text), s"dict=$dict text=$text")
    }
  }

  test("expression matches the brute force through the codegen path, nulls stay null") {
    val dict = Seq("an", "scan", "slow", "low")
    val df = Seq((1L, "a slow scan and another scan"), (2L, "nothing"))
      .toDF("doc_id", "text")
      .union(Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"))
      .withColumn("hits", DictMatchCounts(col("text"), dict))
    val got = df.orderBy("doc_id").collect()
    assert(got(0).getSeq[Long](2) === brute(dict, "a slow scan and another scan"))
    assert(got(1).getSeq[Long](2) === Seq(0L, 0L, 0L, 0L))
    assert(got(2).isNullAt(2))
  }

  test("automaton survives java serialization (the executor-ship path local mode skips)") {
    val dict = Seq("he", "she", "hers", "aa")
    val auto = new AcAutomaton(dict.toArray)
    val bytes = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bytes)
    oos.writeObject(auto); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray))
      .readObject().asInstanceOf[AcAutomaton]
    val t = UTF8String.fromString("ushers aaa")
    val a = auto.matchCounts(t)
    val b = back.matchCounts(t)
    assert((0 until a.numElements()).map(a.getLong) ===
      (0 until b.numElements()).map(b.getLong))
    assert((0 until b.numElements()).map(b.getLong) === Seq(1L, 1L, 1L, 2L))
  }

  test("rollup: term labels survive Spark string-literal escaping (backslash, quote)") {
    val d = Seq((1L, "en", """a\tb and it's here""")).toDF("doc_id", "lang", "text")
    val terms = Seq("""a\tb""", "it's") // literal backslash-t; an apostrophe
    val got = graft.pipeline.TextAnalysis.dictTags(d, terms)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(got === Array(("""a\tb""", 1L), ("it's", 1L)))
  }

  test("gate: phrase terms block across token boundaries, exact shares") {
    val d = Seq(
      (1L, "en", "big data here"), // blocked by the phrase
      (2L, "en", "big shiny data"), // 'big' and 'data' present, phrase absent → kept
      (3L, "de", "slow scan slow scan"))
      .toDF("doc_id", "lang", "text")
    val got = graft.pipeline.TextAnalysis.dictGate(d, Seq("big data", "slow scan"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got === Array(
      ("de", 1L, 1L, 19L, 1000000000L),
      ("en", 2L, 1L, 13L, 500000000L)))
  }

  private def countsCi(dict: Seq[String], text: String): Seq[Long] = {
    val arr = new AcAutomaton(dict.toArray, caseInsensitive = true)
      .matchCounts(UTF8String.fromString(text))
    (0 until arr.numElements()).map(arr.getLong)
  }

  test("case-insensitive: both dictionary and text fold, exact mode unchanged") {
    // dictionary mixed/UPPER-cased, text sentence-cased: CI counts
    // every casing ("data"x2, "scan"+"Scanner", "an" in scan/Scanner);
    // exact mode still matches codepoints literally
    assert(countsCi(Seq("Data", "SCAN", "an"), "Data scan DATA Scanner") === Seq(2L, 2L, 2L))
    assert(counts(Seq("Data", "SCAN", "an"), "Data scan DATA Scanner") === Seq(1L, 0L, 2L))
  }

  test("case-insensitive equivalence law: folded brute force over random mixed-case input") {
    val termGen = Gen.chooseNum(1, 4)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'A', 'B'))).map(_.mkString)
    val textGen = Gen.chooseNum(0, 60)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'A', 'B'))).map(_.mkString)
    def foldS(s: String) = {
      val sb = new StringBuilder
      s.codePoints().forEach(cp => { sb.appendAll(Character.toChars(Character.toLowerCase(cp))); () })
      sb.toString
    }
    (0 until 40).foreach { i =>
      val dict = (0 until 6)
        .flatMap(j => termGen.apply(Gen.Parameters.default, Seed(900L * i + j)))
        .distinctBy(foldS)
      val text = textGen.apply(Gen.Parameters.default, Seed(11L * i + 5)).getOrElse("")
      assert(countsCi(dict, text) === brute(dict.map(foldS), foldS(text)),
        s"dict=$dict text=$text")
    }
  }

  test("case-insensitive: terms colliding after folding are rejected") {
    intercept[IllegalArgumentException] {
      new AcAutomaton(Array("Data", "DATA"), caseInsensitive = true)
    }
    // distinct exact-mode duplicates still rejected too
    intercept[IllegalArgumentException] { new AcAutomaton(Array("x", "x")) }
  }

  test("rollup: dictTags hand fixture — hits, docs touched, nested terms") {
    val d = Seq(
      (1L, "en", "slow slow scan"), // slow 2, low 2, scan 1, an 1
      (2L, "en", "low"), // low 1
      (3L, "de", "an scan")) // an 2, scan 1
      .toDF("doc_id", "lang", "text")
    val got = graft.pipeline.TextAnalysis.dictTags(d, Seq("an", "low", "scan", "slow"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got === Array(
      ("de", "an", 2L, 1L), ("de", "low", 0L, 0L), ("de", "scan", 1L, 1L),
      ("de", "slow", 0L, 0L),
      ("en", "an", 1L, 1L), ("en", "low", 3L, 2L), ("en", "scan", 1L, 1L),
      ("en", "slow", 2L, 1L)))
  }
}
