package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Totality of the pipeline operators on degenerate inputs — empty
  * corpora, singleton corpora, empty documents. At 100 TB these are
  * not hypothetical: one empty document must not kill a job.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("dedup operators are total on empty and singleton corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.nearDuplicates(empty).count() === 0)
    assert(Dedup.simhashPairs(empty).count() === 0)
    assert(Dedup.dropExactDuplicates(empty).count() === 0)
    val one = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    assert(Dedup.nearDuplicates(one).count() === 0)
    assert(Dedup.dropExactDuplicates(one).count() === 1)
    val emptyFull = Seq.empty[(Long, String, String, Int, String)]
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    assert(Dedup.ngramJaccardPairs(emptyFull).count() === 0)
  }

  test("embedding operators are total on tiny corpora") {
    val one = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Dedup.embeddingNearDuplicates(one, 0.1).count() === 0)
    val two = one.unionAll(Seq((1L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding"))
    // k larger than the corpus: every other vector is returned, no error
    val res = Similarity.bruteForceTopK(two, two, 5).collect()
    assert(res.length === 2)
  }

  test("text analysis is total on empty and whitespace documents") {
    val d = Seq((1L, ""), (2L, " "), (3L, "the quick fox")).toDF("doc_id", "text")
    assert(TextAnalysis.tokenStats(d).count() === 3)
    assert(TextAnalysis.fingerprints(d).count() === 3)
    assert(TextAnalysis.languageId(d.withColumn("lang", lit("en"))).count() === 3)
    val q = TextAnalysis.qualityScores(d).orderBy("doc_id").collect()
    assert(q.length === 3)
    // empty text: NULL ratios and NULL quality (never NaN — the ANSI
    // decimal cast in the score would throw on NaN), so a
    // `quality >= t` gate silently drops the doc
    val emptyRow = q(0)
    assert(emptyRow.isNullAt(emptyRow.fieldIndex("punct_ratio")))
    assert(emptyRow.isNullAt(emptyRow.fieldIndex("quality")))
    assert(!q(2).isNullAt(q(2).fieldIndex("quality")))
  }

  test("round-7 operators are total on empty inputs") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.bm25Scores(emptyDocs, Seq.empty, 1.0).count() === 0)
    assert(TextAnalysis.topDfTerms(emptyDocs, 3).count() === 0)
    assert(TextAnalysis.chunkTokens(emptyDocs).count() === 0)
    val emptyLang = Seq.empty[(Long, String)].toDF("doc_id", "lang")
    assert(Corpus.temperatureSample(emptyLang).count() === 0)
    val emptyLabels = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    val emptyQuality = Seq.empty[(Long, Double)].toDF("doc_id", "quality")
    assert(Dedup.keepBest(emptyLabels, emptyQuality).count() === 0)
    // a funnel-free event stream reports ZERO users per step, not NULL
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("user_id", "ts", "event_type")
    val rep = graft.operators.Funnel.report(emptyEv, Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(rep === Map(1 -> 0L, 2 -> 0L, 3 -> 0L))
    assert(graft.queries.Pipeline2.cohortRetentionOn(
      emptyEv.select(col("user_id"), col("ts"))).count() === 0)
  }

  test("round-11 operators are total on empty and degenerate inputs") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.winnowFingerprints(emptyDocs).count() === 0)
    assert(Dedup.normalizedDedup(emptyDocs).count() === 0)
    // punctuation-only text normalizes to "" — still one total group
    val punct = Seq((1L, "!!! ???"), (2L, ",,,")).toDF("doc_id", "text")
    val pd = Dedup.normalizedDedup(punct).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pd === Map(1L -> 2L, 2L -> 2L)) // both collapse to the empty key
    // sub-k docs produce no winnow rows (same predicate as the oracle)
    assert(TextAnalysis.winnowFingerprints(Seq((1L, "two words")).toDF("doc_id", "text"))
      .count() === 0)
    val emptyLS = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "source")
    assert(Corpus.mixDrift(emptyLS).count() === 0)
    // single lang + single source: zero drift by definition
    val uni = Seq((1L, "en", "web"), (2L, "en", "web")).toDF("doc_id", "lang", "source")
    val d = Corpus.mixDrift(uni).collect()
    assert(d.length === 1 && d(0).getDouble(2) === 0.0)
    val emptyLabels = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    assert(Corpus.leakageSafeSplit(emptyDocs, emptyLabels).count() === 0)
    // match stage: empty corpus and a no-pair corpus both yield zero rows
    assert(TextAnalysis.winnowMatches(emptyDocs).count() === 0)
    assert(TextAnalysis.winnowMatches(
      Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")).count() === 0)
    // packing efficiency: empty corpus is total; a one-doc stratum fills
    // exactly its own token count into bin 0
    val emptyPack = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "lang", "source", "text")
    assert(Corpus.packSequences(emptyPack, 200).count() === 0)
    val oneDoc = Seq((1L, "en", "web", "five words of text here")).toDF("doc_id", "lang", "source", "text")
    val packed = Corpus.packSequences(oneDoc, 200).collect()
    assert(packed.length === 1 && packed(0).getLong(packed(0).fieldIndex("bin")) === 0L)
  }

  test("round-12 operators are total on empty and degenerate inputs") {
    val emptyLT = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    assert(TextAnalysis.gopherRules(emptyLT).count() === 0)
    assert(TextAnalysis.perplexityBuckets(
      emptyLT.select(col("doc_id"), col("text"), col("lang"))).count() === 0)
    // empty TEXT (not empty corpus): rules stay NULL-free and the doc
    // simply fails its gates instead of poisoning the scan
    val blank = Seq((1L, "en", "")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.gopherRules(blank).head()
    assert(!r.isNullAt(10) && r.getBoolean(10) === false) // keep = false, not NULL
    // singleton language: rank 1 of 1 → tail (floor(1/3) = 0 heads),
    // keep = false — the degenerate tercile is well-defined
    val one = Seq((1L, "solo doc text", "xx")).toDF("doc_id", "text", "lang")
    val p = TextAnalysis.perplexityBuckets(one).collect()
    assert(p.length === 1 && p(0).getString(4) === "tail" && !p(0).getBoolean(5))
    // duplicated-span detection on an empty corpus and a no-dup corpus
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(emptyDocs).count() === 0)
    assert(Dedup.duplicatedSpans(
      Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")).count() === 0)
    // mixDriftFromCounts on an empty count table is total
    val emptyCnts = Seq.empty[(String, String, Long)].toDF("lang", "source", "cnt_ls")
    assert(Corpus.mixDriftFromCounts(emptyCnts, 0L).count() === 0)
  }

  test("round-12 continuation operators are total on degenerate inputs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val one = Seq((1L, "a b c")).toDF("doc_id", "text")
    val blank = Seq((1L, ""), (2L, "x y")).toDF("doc_id", "text")
    // boilerplate removal: empty corpus, singleton, empty-text docs
    assert(Dedup.boilerplateRemoval(empty).count() === 0)
    assert(Dedup.boilerplateRemoval(one).collect()
      .forall(r => r.getLong(2) === 0L))
    // two empty-text docs share the "" segment at df=2 → both removed
    val twoBlank = Seq((1L, ""), (2L, "")).toDF("doc_id", "text")
    assert(Dedup.boilerplateRemoval(twoBlank, segWords = 2, minDf = 2)
      .collect().forall(r => r.getLong(2) === 1L))
    // vocab coverage: empty corpus yields no checkpoint rows, no error
    assert(TextAnalysis.vocabCoverage(empty).count() === 0)
    // a 1-type corpus answers only the rank-1 checkpoint
    val v = TextAnalysis.vocabCoverage(Seq((1L, "a a a")).toDF("doc_id", "text"),
      checkpoints = Seq(1L, 3L), nBuckets = 4).collect()
    assert(v.length === 1 && v(0).getLong(3) === 3L && v(0).getLong(4) === 1000000000L)
    // bpe pairs: empty corpus and all-single-char corpus
    assert(TextAnalysis.bpePairStats(empty).count() === 0)
    assert(TextAnalysis.bpePairStats(Seq((1L, "a b a")).toDF("doc_id", "text")).count() === 0)
    // length buckets: empty corpus; empty text still has the [""] token
    assert(Corpus.lengthBuckets(empty).count() === 0)
    val lb = Corpus.lengthBuckets(blank, padMultiple = 4).orderBy("bucket_max").collect()
    assert(lb.map(_.getLong(1)).sum === 2L)
    // score calibration: empty universe and disjoint join are total
    val noFlags = Seq.empty[(Long, Boolean)].toDF("doc_id", "flag")
    val scored = Seq((1L, 2.0), (2L, 1.0)).toDF("doc_id", "score")
    assert(TextAnalysis.scoreCalibration(scored, noFlags).count() === 0)
    // singleton universe lands entirely in bin 0
    val single = TextAnalysis.scoreCalibration(
      Seq((1L, 2.0)).toDF("doc_id", "score"),
      Seq((1L, true)).toDF("doc_id", "flag"), bins = 10, nBuckets = 4).collect()
    assert(single.length === 1 && single(0).getLong(0) === 0L &&
      single(0).getLong(3) === 1000000000L)
  }

  test("round-17 operators are total on degenerate inputs") {
    import spark.implicits._
    import graft.pipeline.{Similarity, TextAnalysis}
    // batched BPE: asking for more merges than the corpus can yield
    // takes the exhaustion path (every pair already merged) and
    // terminates with whatever exists — never loops
    val tiny = Seq((1L, "en", "ab ab")).toDF("doc_id", "lang", "text")
    val m = TextAnalysis.bpeMergesBatched(tiny, nMerges = 50, batch = 8)
    assert(m.nonEmpty && m.size < 50 && m.head === (("a", "b")))
    // ...and batch larger than the candidate pool is fine
    assert(TextAnalysis.bpeMergesBatched(tiny, nMerges = 2, batch = 1024).nonEmpty)
    // unigram: an all-single-char corpus trains to a char-only table
    // (no multi-char candidates exist) and encodes 1 piece per token
    val chars = Seq((1L, "en", "a b a b")).toDF("doc_id", "lang", "text")
    val tbl = TextAnalysis.unigramTrain(chars, rounds = 2, topK = 8)
    assert(tbl.map(_._1).forall(_.length == 1))
    val e = TextAnalysis.unigramEncode(chars, tbl).collect()
    assert(e.length === 1 && e(0).getLong(3) === 4L) // 4 tokens -> 4 pieces
    // words past the 32-char type cap are excluded deterministically
    val long = Seq((1L, "en", ("x" * 40) + " ok")).toDF("doc_id", "lang", "text")
    val el = TextAnalysis.unigramEncode(long,
      TextAnalysis.unigramTrain(long, rounds = 1, topK = 4)).collect()
    assert(el.length === 1 && el(0).getLong(1) === 1L) // only "ok" counts
    // mrl pyramid: the minimal width is one sum + one diff
    val two = Seq((0L, Seq(3.0f, 1.0f))).toDF("vec_id", "embedding")
    val y2 = Similarity.mrlPyramid(two, "embedding", "y", 2)
      .select(col("y")).head().getSeq[Float](0)
    assert(y2 === Seq(4.0f, 2.0f))
    // ...and non-power-of-two widths are rejected loudly, not mangled
    intercept[IllegalArgumentException] {
      Similarity.mrlPyramid(two, "embedding", "y", 3)
    }
  }

  test("round-18 operators are total on degenerate inputs") {
    val pieces = Seq("ab" -> 100L, "c" -> 200L)
    // empty corpus: every stage empty, no divide-by-zero in waterfill
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    assert(TextAnalysis.tokenizeBudget(empty, pieces).count() === 0)
    // docs whose every token is outside the model's 1..32 band
    // vanish before the aggregate (the documented filter)
    val long = Seq((1L, "en", "x" * 40)).toDF("doc_id", "lang", "text")
    assert(TextAnalysis.tokenizeBudget(long, pieces).count() === 0)
    // zero budget: allocations are zero, nothing fits, nothing used
    val one = Seq((1L, "en", "ab c")).toDF("doc_id", "lang", "text")
    val z = TextAnalysis.tokenizeBudget(one, pieces, budgetNum = 0).head()
    assert(z.getLong(3) === 0L && z.getLong(5) === 0L && z.getLong(6) === 0L)
    // budget >= total: one language is trivially capped and fully fit
    val f = TextAnalysis.tokenizeBudget(one, pieces, budgetNum = 2, budgetDen = 1).head()
    assert(f.getBoolean(4) && f.getLong(5) === 1L && f.getLong(6) === f.getLong(2))
    // PII scrub: empty text, boundary matches, adjacent matches
    val p = Seq(
      (1L, ""),
      (2L, "a@b.cd"),                      // the whole text IS the match
      (3L, "x@y.com 1.2.3.4"),             // adjacent classes
      (4L, "1.2.3.4.5"))                   // greedy IPv4 inside a longer run
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(p).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("n_emails"), r.getAs[Long]("n_ips"),
        r.getAs[String]("redacted")))
    assert(got(0) === ((0L, 0L, "")))
    assert(got(1) === ((1L, 0L, "[EMAIL]")))
    assert(got(2) === ((1L, 1L, "[EMAIL] [IP]")))
    // leftmost match wins; the trailing ".5" survives
    assert(got(3) === ((0L, 1L, "[IP].5")))
  }

  test("round-18 second-batch operators are total on degenerate inputs") {
    // NB: whitespace-only scoring input → no predictions, not a crash
    val train = Seq((1L, "a", "x y"), (2L, "b", "y z")).toDF("doc_id", "lang", "text")
    val m = TextAnalysis.nbTrain(train, "lang", topV = 8)
    val blank = Seq((9L, "a", " "), (10L, "b", "")).toDF("doc_id", "lang", "text")
    assert(TextAnalysis.nbScore(blank, m).count() === 0)
    // single-class model: predicted is the class, margin NULL
    val m1 = TextAnalysis.nbTrain(Seq((1L, "only", "x")).toDF("doc_id", "lang", "text"), "lang", 4)
    val r1 = TextAnalysis.nbScore(Seq((2L, "only", "x q")).toDF("doc_id", "lang", "text"), m1).head()
    assert(r1.getAs[String]("predicted") === "only" && r1.isNullAt(r1.fieldIndex("margin_unats")))
    // dictTags: empty corpus → every (lang, term) cell zero-row frame
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    assert(TextAnalysis.dictTags(empty, Seq("an", "at")).count() === 0)
    // dict term longer than every text: zero hits, still total
    val short = Seq((1L, "en", "ab")).toDF("doc_id", "lang", "text")
    val dd = TextAnalysis.dictTags(short, Seq("abcdef")).head()
    assert(dd.getLong(2) === 0L && dd.getLong(3) === 0L)
    // wordpiece: empty corpus and out-of-band-only docs vanish
    val pieces = Seq("ab" -> 100L, "c" -> 200L)
    assert(TextAnalysis.wordpieceEncode(empty, pieces).count() === 0)
    val long2 = Seq((1L, "en", "x" * 40)).toDF("doc_id", "lang", "text")
    assert(TextAnalysis.wordpieceEncode(long2, pieces).count() === 0)
  }
}
