package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$Sf/documents.parquet")

  test("language-ID picks the max-hit lexicon with deterministic ties") {
    val df = Seq(
      (1L, "the cat and the dog of a house", "en"),
      (2L, "el la de que y en un los", "es"),
      (3L, "xyzzy qwerty plugh", "zz")) // zero hits everywhere → priority order
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.languageId(df).orderBy("doc_id").collect()
    assert(out(0).getString(2) === "en")
    assert(out(1).getString(2) === "es")
    assert(out(2).getString(2) === "de") // all-zero tie → first in priority order
  }

  test("quality components are bounded ratios and score is in [0, 1]") {
    val q = TextAnalysis.qualityScores(docs)
    assert(q.filter(col("punct_ratio") < 0 || col("punct_ratio") > 1).count() === 0)
    assert(q.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() === 0)
    assert(q.filter(col("quality") < 0 || col("quality") > 1).count() === 0)
  }

  test("token stats: types never exceed tokens; ttr in (0, 1]") {
    val t = TextAnalysis.tokenStats(docs)
    assert(t.filter(col("n_types") > col("n_tokens")).count() === 0)
    assert(t.filter(col("ttr") <= 0 || col("ttr") > 1).count() === 0)
  }

  test("fingerprints are whitespace-normalization invariant") {
    val a = Seq((1L, "hello  world")).toDF("doc_id", "text")
    val b = Seq((1L, "hello world")).toDF("doc_id", "text")
    val fa = TextAnalysis.fingerprints(a).head().getString(1)
    val fb = TextAnalysis.fingerprints(b).head().getString(1)
    assert(fa === fb)
  }

  test("ngram jaccard: identical same-block docs score 1.0") {
    val df = Seq(
      (1L, "abcdefghij", "en", "s1", 10L),
      (2L, "abcdefghij", "en", "s1", 10L),
      (3L, "zzzzzzzzzz", "en", "s1", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Dedup.ngramJaccardPairs(df, 3, 0.5, 20).orderBy("id_a", "id_b").collect()
    assert(pairs.length === 1)
    assert(pairs.head.getLong(0) === 1L && pairs.head.getLong(1) === 2L)
    assert(pairs.head.getDouble(2) === 1.0)
  }

  test("PII redaction replaces emails, phones, and IPs and counts each on the original text") {
    val df = Seq(
      (1L, "mail alice@example.com and bob.smith@mail.co twice"),
      (2L, "call 555-123-4567 from 192.168.0.1 now"),
      (3L, "clean text with no pii at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(df).orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 2L) // two emails
    assert(out(0).getString(4) === "mail [EMAIL] and [EMAIL] twice")
    assert(out(1).getLong(2) === 1L && out(1).getLong(3) === 1L)
    assert(out(1).getString(4) === "call [PHONE] from [IP] now")
    assert(out(2).getLong(1) === 0L && out(2).getLong(2) === 0L && out(2).getLong(3) === 0L)
    assert(out(2).getString(4) === "clean text with no pii at all")
  }

  test("decontamination flags an injected eval leak and nothing else") {
    val eval_ = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "prefix words alpha beta gamma delta epsilon suffix"), // contains a shared 5-gram
      (11L, "completely different tokens with no overlap at all"))
      .toDF("doc_id", "text")
    val flagged = TextAnalysis.decontaminate(train, eval_, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet === Set(10L))
    assert(flagged(10L) === 1L) // exactly one shared 5-gram: "alpha beta gamma delta epsilon"
  }

  test("bloom decontamination equals the exact form, even at a deliberately lossy bloom") {
    val eval_ = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "prefix words alpha beta gamma delta epsilon suffix"),
      (11L, "completely different tokens with no overlap at all"),
      (12L, "zero one two three four five six ok")).toDF("doc_id", "text")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = asMap(TextAnalysis.decontaminate(train, eval_, 5))
    // a comfortably-sized bloom
    assert(asMap(TextAnalysis.decontaminateBloom(train, eval_, 5)) === exact)
    // a 64-bit bloom over ~10 grams is saturated — nearly every probe
    // is a false positive — and the exact verify STILL yields the
    // identical answer (the no-false-negatives + verify contract)
    assert(asMap(TextAnalysis.decontaminateBloom(train, eval_, 5,
      expectedItems = 8L, numBits = 64L)) === exact)
    // fully disjoint corpora flag nothing
    val clean = Seq((20L, "nothing here matches the held out suite text")).toDF("doc_id", "text")
    assert(TextAnalysis.decontaminateBloom(clean, eval_, 5).count() === 0L)
    // an empty eval suite yields a typed empty result, not an NPE on
    // the NULL sketch
    val noEval = eval_.filter(col("doc_id") < 0)
    val empty = TextAnalysis.decontaminateBloom(train, noEval, 5)
    assert(empty.columns.toSeq === Seq("doc_id", "n_shared") && empty.count() === 0L)
  }

  test("streaming decontamination: one-doc-per-batch drip equals the batch gate, zero state") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val eval_ = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "prefix words alpha beta gamma delta epsilon suffix"),
      (11L, "completely different tokens with no overlap at all"),
      (12L, "alpha beta gamma delta epsilon zeta trailer here")).toDF("doc_id", "text")
    val spool = Files.createTempDirectory("graft-test-decontam-spool")
    // one parquet file per document -> maxFilesPerTrigger=1 is a
    // one-DOC-per-batch drip, the harshest batch-boundary schedule
    train.collect().foreach { r =>
      Seq((r.getLong(0), r.getString(1))).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(spool.toString)
    }
    val outDir = Files.createTempDirectory("graft-test-decontam-out")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(spool.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        TextAnalysis.decontaminate(batch, eval_, 5)
          .write.mode("append").parquet(outDir.toString)
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // stateless by construction: foreachBatch over a per-batch
    // transform registers no stateful operators
    assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty))
    val streamed = spark.read.parquet(outDir.toString).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = TextAnalysis.decontaminate(train, eval_, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch && batch.keySet === Set(10L, 12L))
  }

  test("corpus-frequency score ranks common-word docs above rare-word docs") {
    val docs = Seq(
      (1L, "the the the the"),         // most frequent token
      (2L, "rare1 rare2 rare3 rare4"), // singletons
      (3L, "the the rare5 rare6"))
      .toDF("doc_id", "text")
    val scores = TextAnalysis.corpusFrequencyScore(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scores(1L) > scores(3L) && scores(3L) > scores(2L))
  }

  test("latest-wins upsert keeps the max-version row via a partial aggregate, not a window") {
    val rows = Seq(
      (1L, "a", 0L), (1L, "b", 2L), (1L, "c", 1L),
      (2L, "x", 0L),
      (3L, "m", 5L), (3L, "n", 5L)) // tie on version: either survives, but exactly one
      .toDF("k", "payload", "version")
    val latest = graft.operators.Upsert.latestWins(rows, Seq("k"), Seq(col("version")))
    val got = latest.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "b")
    assert(got(2L) === "x")
    assert(Set("m", "n").contains(got(3L)))
    assert(latest.count() === 3)
    // scale shape: hash aggregate with map-side combine, no Window sort
    val plan = latest.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }

  test("bm25 matches a hand-computed Okapi score; non-matching docs drop out") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "dog egg fox"))
      .toDF("doc_id", "text")
    // idf given as literals (the operator's contract); avgdl = 3.0
    val got = TextAnalysis.bm25Scores(docs, Seq(("apple", 1.0), ("banana", 0.5)), 3.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // d1: dl=3 → norm = 0.25+0.75*1 = 1.0; apple tf=2: 1.0*4.4/3.2;
    //     banana tf=1: 0.5*2.2/2.2 = 0.5 → 1.375 + 0.5
    assert(got(1L) === ((2L, 1.875)))
    // d2: dl=2 → norm = 0.75; banana tf=1: 0.5*2.2/(1+0.9) = 0.5789…
    assert(got(2L) === ((1L, BigDecimal(0.5 * 2.2 / (1 + 1.2 * 0.75))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(!got.contains(3L)) // zero hits → filtered
  }

  test("topDfTerms ranks by document frequency with alphabetical ties") {
    val docs = Seq(
      (1L, "common alpha"), (2L, "common beta"), (3L, "common beta alpha"),
      (4L, "zeta zeta zeta")) // repeated within one doc counts once
      .toDF("doc_id", "text")
    val got = TextAnalysis.topDfTerms(docs, 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("common", 3L), ("alpha", 2L), ("beta", 2L)))
  }

  test("token chunking: stride-overlapping windows, short tail, sub-stride doc = one chunk") {
    val ninety = (1 to 90).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, ninety), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokens(docs, 50, 40).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    val byDoc = got.groupBy(_._1)
    // 90 tokens → starts 0, 40, 80 → sizes 50, 50, 10
    assert(byDoc(1L).map(c => c._2 -> c._3).sortBy(_._1).toSeq ===
      Seq(0 -> 50L, 1 -> 50L, 2 -> 10L))
    // overlap: chunk 1 starts at token 41 (t41..t90 window head)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md5.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val chunk1 = (41 to 90).map(i => s"t$i").mkString(" ")
    assert(byDoc(1L).find(_._2 == 1).get._4 === hex(chunk1))
    assert(byDoc(2L).map(c => c._2 -> c._3).toSeq === Seq(0 -> 3L))
  }

  test("repetition stats rank a looping doc above a diverse one; short docs excluded") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over one lazy sleeping dog"),
      (3L, "too short")) // 2 tokens: no 3-grams
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(2), x.getDouble(3)))).toMap
    assert(!r.contains(3L))
    val (ttrSpam, dup3Spam) = r(1L)
    val (ttrFox, dup3Fox) = r(2L)
    assert(dup3Spam > 0.8 && dup3Fox === 0.0)
    assert(ttrSpam < ttrFox && ttrFox === 1.0)
  }

  test("winnowing guarantees a shared fingerprint for any w+k-1 token overlap and stays sparse") {
    // docs 1 and 2 share the 6-token run "a b c d e f" (= w + k - 1
    // with k=3, w=4) embedded in different surroundings — the paper's
    // guarantee says they MUST share at least one fingerprint
    val docs = Seq(
      (1L, "p q r a b c d e f s t u v w x y z"),
      (2L, "m n a b c d e f o"),
      (3L, "one two three"), // 1 gram: the partial pos-0 window
      (4L, "totally different words here with no overlap at all"))
      .toDF("doc_id", "text")
    // recompute fingerprint SETS from the same internals the operator
    // aggregates, so the set-level guarantee is checkable
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        posexplode(expr("transform(sequence(0, size(toks) - 3), i -> array_join(slice(toks, i + 1, 3), ' '))"))
          .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(col("gram")), 1, 12), 16, 10).cast("long").as("h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    val part = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val fps = grams
      .withColumn("n_grams", count(lit(1)).over(part))
      .withColumn("minh", min(col("h")).over(win))
      .filter(col("pos") <= greatest(col("n_grams") - 4, lit(0L)))
      .select("doc_id", "minh").distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared 6-token run must share a fingerprint")
    assert((fps(1L) & fps(4L)).isEmpty, "disjoint docs must not collide")
    // the aggregate view agrees with the recomputed sets
    val agg = TextAnalysis.winnowFingerprints(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    fps.foreach { case (id, set) =>
      assert(agg(id)._2 === set.size.toLong)
      assert(agg(id)._3 === set.sum)
    }
    // 3-token doc: one gram, the partial pos-0 window, exactly one fp
    assert(agg(3L) === ((1L, 1L, agg(3L)._3)))
    // sparsity: far fewer fingerprints than grams on a real-length doc
    assert(agg(1L)._2 <= agg(1L)._1 / 2 + 1)
  }

  test("winnow match stage pairs overlapping docs, honors minShared, and the df cap drops boilerplate") {
    val docs = Seq(
      (1L, "p q r a b c d e f g h s t u v"),   // shares the long run with 2
      (2L, "m n a b c d e f g h o z z2 z3"),
      (3L, "completely unrelated text with other words entirely"),
      (4L, "single tiny overlap a b c only here nothing else shared"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowMatches(docs, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)), "the 8-token shared run must match")
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
    // a boilerplate fingerprint present in EVERY doc is df-capped away
    val boiler = (1L to 12L).map(i => (i, s"doc number $i BOILER PLATE LINE HERE always"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.winnowMatches(boiler, minShared = 1, maxDf = 3).count() === 0)
    // without the cap the same corpus pairs quadratically
    assert(TextAnalysis.winnowMatches(boiler, minShared = 1, maxDf = 1000).count() > 0)
  }

  test("gopher rules: each rule fires on its crafted violator and only there") {
    val good = "the quick brown fox jumps over a lazy dog and then it runs far away " +
      "to the old mill where it rests in peace for a while before heading home again soon"
    val df = Seq(
      (1L, good),                                           // passes all four
      (2L, "too short a doc"),                              // fails words (< 30)
      (3L, ("spam ham " * 20).trim),                        // fails repetition (dup3 high), words ok
      (4L, Seq.fill(32)("zyx wvut").mkString(" ")),         // fails stopwords (0 hits)
      (5L, Seq.fill(32)("extraordinarily magnificent").mkString(" "))) // fails word_len (> 5.0)
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val r = TextAnalysis.gopherRules(df).collect()
      .map(x => x.getLong(0) -> x).toMap
    def flags(id: Long) = (r(id).getBoolean(6), r(id).getBoolean(7),
      r(id).getBoolean(8), r(id).getBoolean(9), r(id).getBoolean(10))
    assert(flags(1L) === ((true, true, true, true, true)))
    assert(flags(2L) === ((false, true, true, true, false)))
    assert(flags(3L)._3 === false); assert(flags(3L)._1 === true)
    assert(flags(4L)._4 === false)
    assert(flags(5L)._2 === false)
    // sub-3-token doc: no 3-grams, repetition passes vacuously (dup3 = 0)
    val tiny = TextAnalysis.gopherRules(
      Seq((9L, "of it")).toDF("doc_id", "text").withColumn("lang", lit("en"))).head()
    assert(tiny.getDouble(4) === 0.0)
    assert(tiny.getBoolean(8) === true)
  }

  test("perplexity buckets: exact terciles per language, keep = not tail, width-invariant") {
    val d = docs
    val out = TextAnalysis.perplexityBuckets(d)
    val rows = out.collect()
    // per-language: ranks are a 1..n permutation and tercile sizes are exact
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val n = rs.length
      assert(rs.map(_.getLong(3)).sorted.toSeq === (1L to n).toSeq)
      val heads = rs.count(_.getString(4) == "head")
      assert(heads === n / 3, s"head tercile must be floor(n/3): got $heads of $n")
      rs.foreach(r => assert(r.getBoolean(5) === (r.getString(4) != "tail")))
    }
    // the bucketed two-pass equals the serial single-window shape
    val serial = TextAnalysis.perplexityBuckets(d, nBuckets = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4)))).toMap
    rows.foreach(r => assert(serial(r.getLong(0)) === ((r.getLong(3), r.getString(4)))))
    // head = most fluent: within a language, every head score >= every tail score
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val headMin = rs.filter(_.getString(4) == "head").map(_.getLong(2)).min
      val tailMax = rs.filter(_.getString(4) == "tail").map(_.getLong(2)).max
      assert(headMin >= tailMax)
    }
  }

  test("vocab coverage: exact ranks, cumulative sums, and bucket-count invariance") {
    import spark.implicits._
    // freq: c=4, a=3, b=2, d=1  (10 tokens, 4 types)
    val d = Seq((1L, "c c a b"), (2L, "c a b d"), (3L, "c a")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(d, checkpoints = Seq(1L, 2L, 3L, 4L), nBuckets = 8)
      .orderBy("vocab_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, "c", 4L, 4L, 400000000L),
      (2L, "a", 3L, 7L, 700000000L),
      (3L, "b", 2L, 9L, 900000000L),
      (4L, "d", 1L, 10L, 1000000000L)))
    // two-pass bucketed ranking ≡ the serial single-bucket shape
    val serial = TextAnalysis.vocabCoverage(d, checkpoints = Seq(1L, 2L, 3L, 4L), nBuckets = 1)
      .orderBy("vocab_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === serial.toSeq)
    // fixture sanity: full coverage at the last checkpoint = total tokens
    val fixture = TextAnalysis.vocabCoverage(docs).collect()
    assert(fixture.nonEmpty)
    fixture.foreach(r => assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000000L))
  }

  test("bpe pair stats: weighted adjacent pairs, ties broken by pair text") {
    import spark.implicits._
    // "ab" x3 → pair ab:3 ; "abc" x1 → ab:1, bc:1 ; "x" contributes nothing
    val d = Seq((1L, "ab ab abc x"), (2L, "ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairStats(d, n = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq === Seq("ab" -> 4L, "bc" -> 1L))
    // top-n truncates deterministically on (freq desc, pair asc)
    val top1 = TextAnalysis.bpePairStats(d, n = 1).collect().map(_.getString(0))
    assert(top1.toSeq === Seq("ab"))
    // single-char-word-only corpus yields an empty pair table, not an error
    val chars = Seq((1L, "a b c a")).toDF("doc_id", "text")
    assert(TextAnalysis.bpePairStats(chars, n = 5).count() === 0L)
  }

  test("compression ratio gate: repetitive text fails low, noise fails high, prose keeps") {
    import spark.implicits._
    val spam = "buy now " * 200                      // compresses to almost nothing
    // short full-printable-range noise: ~6.6 bits/char entropy plus
    // deflate's fixed overhead pushes the ratio above the high band
    // (hex-only "noise" is 4 bits/char and compresses ~45%)
    val noise = (1 to 120).map { i =>
      val h = scala.util.hashing.MurmurHash3.stringHash(i.toString)
      (33 + math.floorMod(h, 94)).toChar
    }.mkString
    // genuinely varied prose (no repeated blocks — deflate would eat
    // them): lands mid-band like the fixture's median ratio
    val prose = "the quick brown fox jumps over the lazy dog while " +
      "seventeen astronomers calibrate their telescopes against distant " +
      "quasars and a violinist practices arpeggios in the next room as " +
      "rain drums quietly on the copper roof of the old observatory " +
      "where yellowed charts describe constellations nobody visits anymore"
    val d = Seq((1L, spam), (2L, noise), (3L, prose), (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.compressionStats(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (spamN, spamC, spamR, spamK) = got(1L)
    val (_, _, noiseR, noiseK) = got(2L)
    val (_, _, proseR, proseK) = got(3L)
    val (emptyN, _, emptyR, emptyK) = got(4L)
    assert(spamR < proseR && proseR < noiseR, s"$spamR / $proseR / $noiseR")
    assert(spamK === 0L && noiseK === 0L && proseK === 1L)
    assert(emptyN === 0L && emptyR === 1000000000L && emptyK === 0L)
    // ratio is the exact floored ppb of the emitted pair
    assert(spamR === spamC * 1000000000L / spamN)
    // deterministic: same sizes on a re-evaluation
    val again = TextAnalysis.compressionStats(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again === got.view.mapValues(_._2).toMap)
  }

  test("vocab spectrum: hand-built frequency-of-frequencies, exact bands and ppb shares") {
    // tf: hapax x3 (h1 h2 h3), tf=2 x1 (d), tf=7 x1 (m), tf=150 x1 (big)
    val text1 = "h1 h2 d " + Seq.fill(7)("m").mkString(" ") + " " + Seq.fill(90)("big").mkString(" ")
    val text2 = "h3 d " + Seq.fill(60)("big").mkString(" ")
    val d = Seq((1L, text1), (2L, text2)).toDF("doc_id", "text")
    val got = TextAnalysis.vocabSpectrum(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // bands: 1 -> 3 hapax types; 2 -> 1 type (2 tokens); 6 -> 1 type (7 tokens);
    // 8 -> 1 type (150 tokens); 6 total types
    assert(got === Map(
      1L -> ((3L, 3L, 3L * 1000000000L / 6L)),
      2L -> ((1L, 2L, 1000000000L / 6L)),
      6L -> ((1L, 7L, 1000000000L / 6L)),
      8L -> ((1L, 150L, 1000000000L / 6L))))
    // double spaces produce empty split tokens — they must not count
    val messy = Seq((1L, "a  b   a")).toDF("doc_id", "text")
    val m = TextAnalysis.vocabSpectrum(messy).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m === Map(1L -> ((1L, 1L)), 2L -> ((1L, 2L))))
  }

  test("fertility: exact per-language chars-per-token and doc sizing") {
    val d = Seq(
      (1L, "en", 10L, "ab cd ef"),      // 3 tokens, declared 10 chars
      (2L, "en", 20L, "abcdefgh ij"),   // 2 tokens
      (3L, "de", 9L, "einzeltoken"),    // 1 token
      (4L, "de", 3L, "a  b"))           // double space: empty split token must not count
      .toDF("doc_id", "lang", "n_chars", "text")
    val got = TextAnalysis.fertility(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // en: 2 docs, 5 tokens, 30 chars -> 5e9/30 = 166666666, 5000/2 = 2500
    assert(got("en") === ((2L, 5L, 30L, 166666666L, 2500L)))
    // de: 2 docs, 3 tokens, 12 chars -> 250000000, 1500
    assert(got("de") === ((2L, 3L, 12L, 250000000L, 1500L)))
  }

  test("lexical diversity: boilerplate stratum collapses, unique stratum scores 10^9") {
    val unique = (1 to 3).map(i =>
      (i.toLong, "en", "fresh", (i * 100 to i * 100 + 9).map(j => s"u$j").mkString(" ")))
    // three copies of one template: each doc has 8 distinct shingles,
    // the stratum has 8 distinct over 24 total -> ppb = 333333333
    val template = (10 to 12).map(i =>
      (i.toLong, "en", "farm", (1 to 10).map(j => s"t$j").mkString(" ")))
    // a doc too short to shingle is excluded entirely
    val short = Seq((20L, "en", "fresh", "just two"))
    val d = (unique ++ template ++ short).toDF("doc_id", "lang", "source", "text")
    val got = TextAnalysis.lexicalDiversity(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // fresh: 3 docs x 8 shingles, all distinct
    assert(got(("en", "fresh")) === ((3L, 24L, 24L, 1000000000L)))
    assert(got(("en", "farm")) === ((3L, 24L, 8L, 333333333L)))
  }

  test("unigram LM: frequent bigram becomes one piece, DP value decodes to the " +
      "path, backward walk is lossless, rollup is exact") {
    import spark.implicits._
    val d = Seq(
      (1L, "en", "ab ab ab ab"),
      (2L, "en", "cd"),
      (3L, "de", "ab cd")).toDF("doc_id", "lang", "text")
    val pieces = TextAnalysis.unigramTrain(d, rounds = 2, topK = 8)
    val pm = pieces.toMap
    // coverage: every observed character is a piece; the dominant
    // bigrams earned entries too
    assert(Seq("a", "b", "c", "d").forall(pm.contains))
    assert(pm.contains("ab") && pm.contains("cd"))
    // 'ab' is far more frequent than its characters' solo uses, so
    // one 'ab' piece must beat 'a'+'b' (2 pieces AND higher cost)
    val enc = TextAnalysis.unigramEncode(d, pieces).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // en: 5 tokens (4x 'ab', 1x 'cd'), 2 types, all single-piece -> 5 pieces
    assert(enc("en") === ((5L, 2L, 5L)))
    // de: 2 tokens, 2 types, 2 pieces
    assert(enc("de") === ((2L, 2L, 2L)))
    // laws on a generated-ish corpus: decode consistency and lossless
    // backward walk under the trained table
    val words = Seq("abcd", "dcba", "aabb", "abab", "d", "cc", "abcdabcd".take(6))
    val wdf = words.zipWithIndex.map { case (w, i) => (i.toLong, "en", w) }
      .toDF("doc_id", "lang", "text")
    val tbl = TextAnalysis.unigramTrain(wdf, rounds = 1, topK = 8)
    val rows = words.toDF("w")
      .withColumn("pcost", typedlit(tbl.toMap))
      .withColumn("sc", expr(TextAnalysis.UniScExpr))
      .withColumn("val", expr("element_at(sc, size(sc))"))
      .withColumn("ps", expr(TextAnalysis.UniPiecesExpr))
      .select(col("w"), col("val"), col("ps"))
      .collect()
    rows.foreach { r =>
      val (w, v, ps) = (r.getString(0), r.getLong(1), r.getSeq[String](2))
      // the encoded value's piece count equals the walked path's
      assert(v % 64 === ps.size.toLong, s"decode mismatch for '$w'")
      // pieces concatenate (reversed — backward walk) to the word
      assert(ps.reverse.mkString("") === w, s"lossy path for '$w': $ps")
      // and the walked path's cost re-adds to the encoded value
      val costOf = tbl.toMap
      val cost = ps.map(p => costOf(p)).sum
      assert(v === cost * 64 + ps.size, s"cost mismatch for '$w'")
    }
  }

  test("unigram ambiguity: hand-computed tie counting, and training collapses " +
      "the seed lattice on the fixture") {
    import spark.implicits._
    // 'abc' under costs where 'ab|c' and 'a|bc' tie in (cost, pieces):
    // both cost 4 with 2 pieces -> ways = 2; 'xy' has one optimum
    val d = Seq((1L, "en", "abc abc xy")).toDF("doc_id", "lang", "text")
    val tbl = Seq("a" -> 2L, "b" -> 9L, "c" -> 2L, "ab" -> 2L, "bc" -> 2L,
      "x" -> 1L, "y" -> 1L)
    val got = TextAnalysis.unigramAmbiguity(d, tbl).collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getLong(1) === 2L)           // n_types: abc, xy
    assert(r.getLong(2) === 1L)           // only abc is ambiguous
    assert(r.getLong(5) === 2L)           // both abc tokens counted
    assert(r.getLong(7) === 2L)           // max_ways = the two tied paths
    // end-to-end staged query: the seed lattice carries ambiguity,
    // the trained table has collapsed it (the graded contrast)
    val staged = graft.queries.Pipeline3.textUnigramAmbiguity(spark, Sf)
      .groupBy("stage").agg(sum(col("n_ambig_tokens")).as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(staged("seed") > staged("trained"),
      s"training did not reduce lattice ambiguity: $staged")
  }

  test("bpe apply: hand-computed merge sequence, overlap/boundary laws, exact fertility rollup") {
    import spark.implicits._
    // vocabulary: banana x3 (en), bandana x1 + an x2 (de)
    val d = Seq(
      (1L, "en", "banana banana banana"),
      (2L, "de", "bandana an an")).toDF("doc_id", "lang", "text")
    // round 1: (a,n) freq 9+2+2=13 wins; round 2: (b,an) and (an,a)
    // tie at 4, 'an' < 'b' breaks to (an,a); round 3: (b,an) at 4
    val merges = TextAnalysis.bpeMerges(d, nMerges = 3)
    assert(merges === Seq(("a", "n"), ("an", "a"), ("b", "an")))
    // encoding under the learned table
    def pieces(w: String, m: Seq[(String, String)]): Seq[String] =
      Seq(w).toDF("w").select(TextAnalysis.bpePieces(col("w"), m).as("p"))
        .collect().head.getSeq[String](0).toSeq
    assert(pieces("banana", merges) === Seq("ban", "ana"))
    assert(pieces("bandana", merges) === Seq("ban", "d", "ana"))
    assert(pieces("an", merges) === Seq("an"))
    // canonical left-to-right non-overlap: runs merge pairwise
    assert(pieces("aaaa", Seq(("a", "a"))) === Seq("aa", "aa"))
    assert(pieces("aaa", Seq(("a", "a"))) === Seq("aa", "a"))
    // a merge never false-matches across a symbol boundary: after
    // (c,a) builds [ca][b], (a,b) must not fire inside it
    assert(pieces("cab", Seq(("c", "a"), ("a", "b"))) === Seq("ca", "b"))
    // fertility rollup: en = 3 tokens -> 6 pieces (ppb 2e9),
    // de = 3 tokens -> 3+1+1 = 5 pieces (floored ppb 5/3)
    val enc = TextAnalysis.bpeEncode(d, merges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(enc("en") === ((3L, 1L, 6L, 2000000000L)))
    assert(enc("de") === ((3L, 2L, 5L, 1666666666L)))
  }

  test("wordpiece greedy vs viterbi: hand-computed contrast, unknown fallback") {
    // "abc": greedy takes the longest piece first (ab+c, 12 µnats)
    // where the DP finds a+bc (11 µnats) — same piece count, pure
    // cost excess; "ab" greedy-optimal; "q" unknown → 1-char sentinel
    val pieces = Seq("a" -> 10L, "ab" -> 2L, "b" -> 10L, "bc" -> 1L, "c" -> 10L)
    val d = Seq((1L, "en", "abc ab q")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.wordpieceEncode(d, pieces).head()
    assert(r.getAs[Long]("n_tokens") === 3L)
    assert(r.getAs[Long]("viterbi_pieces") === 4L)
    assert(r.getAs[Long]("greedy_pieces") === 4L)
    assert(r.getAs[Long]("greedy_cost_micro") === 12L + 2L + 1099511627776L)
    assert(r.getAs[Long]("excess_cost_micro") === 1L)
    assert(r.getAs[Long]("n_suboptimal_tokens") === 1L)
    assert(r.getAs[Long]("inflation_ppb") === 1000000000L)
  }

  test("wordpiece greedy can also differ in piece count, not just cost") {
    // greedy takes 'abcd' whole (1 piece, 100 µnats); the DP prefers
    // a+bcd (2 pieces, 2 µnats) — piece DEFLATION with cost excess
    val pieces = Seq("abcd" -> 100L, "a" -> 1L, "bcd" -> 1L)
    val d = Seq((1L, "en", "abcd")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.wordpieceEncode(d, pieces).head()
    assert(r.getAs[Long]("viterbi_pieces") === 2L)
    assert(r.getAs[Long]("greedy_pieces") === 1L)
    assert(r.getAs[Long]("excess_cost_micro") === 98L)
    assert(r.getAs[Long]("n_suboptimal_tokens") === 1L)
    assert(r.getAs[Long]("inflation_ppb") === 500000000L)
  }

  test("NB train: hand-computed micro-nat cost tables, df-ranked vocab, OOV pooling") {
    // doc-frequency: y=2, x=1, z=1 → topV=2 keeps y then x (tie → asc), z pools to OOV
    val train = Seq((1L, "a", "x x y"), (2L, "b", "y y z")).toDF("doc_id", "lang", "text")
    val m = TextAnalysis.nbTrain(train, "lang", topV = 2)
    assert(m.classes === Vector("a", "b"))
    assert(m.vocabCosts.keySet === Set("x", "y"))
    // totals: a=3, b=3; smooth = |vocab|+1 = 3 → denominator ln 6 everywhere
    // cost(c,w) = round(1e6·(ln 6 − ln(n+1))); priors = round(1e6·ln 2)
    assert(m.priors === Vector(693147L, 693147L))
    assert(m.vocabCosts("x") === Vector(693147L, 1791759L)) // n=2 | n=0
    assert(m.vocabCosts("y") === Vector(1098612L, 693147L)) // n=1 | n=2
    assert(m.oovCosts === Vector(1791759L, 1098612L)) // n=0 | n=1 (z)
  }

  test("NB score: argmin class, exact margin, OOV fallback, empty doc dropped") {
    val train = Seq((1L, "a", "x x y"), (2L, "b", "y y z")).toDF("doc_id", "lang", "text")
    val m = TextAnalysis.nbTrain(train, "lang", topV = 2)
    val test_ = Seq((10L, "a", "x z"), (11L, "b", "y"), (12L, "a", "  "))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.nbScore(test_, m).orderBy("doc_id").collect()
    assert(got.length === 2) // the all-whitespace doc has no tokens to condition on
    // "x z": a = 693147+693147+1791759 = 3178053, b = 693147+1791759+1098612 = 3583518
    assert(got(0).getAs[String]("predicted") === "a")
    assert(got(0).getAs[Long]("nb_cost_unats") === 3178053L)
    assert(got(0).getAs[Long]("margin_unats") === 405465L)
    // "y": a = 1791759, b = 1386294 → b wins by the same margin
    assert(got(1).getAs[String]("predicted") === "b")
    assert(got(1).getAs[Long]("nb_cost_unats") === 1386294L)
    assert(got(1).getAs[Long]("margin_unats") === 405465L)
  }

  test("NB score: exact cost tie resolves to the lexicographically smallest class") {
    // symmetric classes → every cost pair ties → argmin must pick "a", margin 0
    val train = Seq((1L, "b", "x"), (2L, "a", "x")).toDF("doc_id", "lang", "text")
    val m = TextAnalysis.nbTrain(train, "lang", topV = 4)
    val got = TextAnalysis.nbScore(Seq((10L, "?", "x q")).toDF("doc_id", "lang", "text"), m)
      .head()
    assert(got.getAs[String]("predicted") === "a")
    assert(got.getAs[Long]("margin_unats") === 0L)
  }

  test("NB train: model is partitioning- and row-order-invariant (driver-gate determinism)") {
    // The r18 driver artifact red-flagged the NB rows once with a hash
    // mismatch no re-run reproduced; this law pins the property a
    // mismatch would need to violate — the trained model is a pure
    // function of the SET of training rows. Same data through 1
    // partition, 7 partitions, reversed input order, and a shuffled
    // key-space repartition must produce the byte-identical model
    // (vocab ties break on (df desc, token asc); counts/doc counts are
    // hash aggregates; cost arithmetic is integer micro-nats).
    val rows = (1L to 60L).map { i =>
      val lang = if (i % 3 == 0) "de" else "en"
      (i, lang, s"tok${i % 7} tok${i % 5} shared tok${i % 11} ${if (i % 2 == 0) "even" else "odd"}")
    }
    val base = rows.toDF("doc_id", "lang", "text")
    val variants = Seq(
      base.repartition(1),
      base.repartition(7),
      rows.reverse.toDF("doc_id", "lang", "text"),
      base.repartition(13, col("doc_id")))
    val models = variants.map(TextAnalysis.nbTrain(_, "lang", topV = 8))
    models.tail.foreach { m =>
      assert(m.classes === models.head.classes)
      assert(m.priors === models.head.priors)
      assert(m.vocabCosts === models.head.vocabCosts)
      assert(m.oovCosts === models.head.oovCosts)
    }
    // and scoring under equal models is value-identical row-for-row
    val test_ = (100L to 120L).map(i => (i, "?", s"tok${i % 7} shared tok${i % 11}"))
      .toDF("doc_id", "lang", "text")
    val scored = models.map(m => TextAnalysis.nbScore(test_, m)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq)
    scored.tail.foreach(s => assert(s === scored.head))
  }

  test("PII scrub: exact counts, class-token redaction, no-PII rows untouched") {
    val d = Seq(
      (1L, "en", "reach contact42@example.com or 10.0.3.7 now 555-123-4567 x"),
      (2L, "en", "no pii here"),
      (3L, "de", "a.b@c.de and a.b@c.de twice"),
      (4L, "de", "ip 255.255.255.255 only"))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.piiScrub(d).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("n_emails"), r.getAs[Long]("n_ips"),
        r.getAs[Long]("n_phones"), r.getAs[String]("redacted")))
    assert(got(0) === ((1L, 1L, 1L, "reach [EMAIL] or [IP] now [PHONE] x")))
    // no PII: counts zero, text byte-identical (redaction is the identity)
    assert(got(1) === ((0L, 0L, 0L, "no pii here")))
    // repeated matches each count and each redact
    assert(got(2) === ((2L, 0L, 0L, "[EMAIL] and [EMAIL] twice")))
    assert(got(3) === ((0L, 1L, 0L, "ip [IP] only")))
  }
}
