package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$Sf/documents.parquet")

  test("exact dedup collapses injected duplicates") {
    val withDups = docs.unionAll(docs.limit(10))
    assert(Dedup.dropExactDuplicates(withDups).count() === docs.count())
    val groups = Dedup.exactHashGroups(withDups)
    assert(groups.filter(col("cnt") === 2).count() === 10)
  }

  test("minhash-LSH finds an injected near-duplicate pair") {
    val base = docs.select("doc_id", "text")
    // clone doc 0 with a tiny edit under a fresh id → jaccard ≈ 1
    val clone = docs.filter(col("doc_id") === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text"))
    val pairs = Dedup.nearDuplicates(base.unionAll(clone), 0.8).collect()
    assert(pairs.exists(r => r.getLong(0) === 0L && r.getLong(1) === 100000L))
  }

  test("minhash signature has NumHashes entries and is deterministic") {
    val sig = Dedup.minhashSignatures(Dedup.wordShingles(docs.limit(5)))
    val rows = sig.orderBy("doc_id").collect()
    assert(rows.forall(_.getSeq[Long](1).size === Dedup.NumHashes))
    val rows2 = Dedup.minhashSignatures(Dedup.wordShingles(docs.limit(5))).orderBy("doc_id").collect()
    assert(rows.map(_.getSeq[Long](1)).toSeq === rows2.map(_.getSeq[Long](1)).toSeq)
  }

  test("minhash kernel is bit-identical to the explode+groupBy aggregate formulation") {
    val sample = docs.select("doc_id", "text").limit(50)
    val got = Dedup.minhashSignatures(Dedup.wordShingles(sample))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
    // the pre-kernel formulation: explode shingles, xxhash64 each, 128
    // min(xxhash64(h1, k)) aggregate buffer slots — the shape the
    // kernel's scaladoc claims hash-chain equivalence with
    val ex = Dedup.wordShingles(sample)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h1"))
    val mins = (0 until Dedup.NumHashes).map(k => min(xxhash64(col("h1"), lit(k))).as(s"h$k"))
    val want = ex.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until Dedup.NumHashes).map(k => col(s"h$k")): _*).as("sig"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
    assert(got.toSeq === want.toSeq)
    // and the hashed-shingle-set kernel equals hashed string shingles
    val toks = sample.select(col("doc_id"), split(col("text"), " ").as("w"))
    val gotSets = Dedup.shingleHashSets(toks).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    val wantSets = Dedup.wordShingles(sample)
      .select(col("doc_id"), expr("transform(shingles, s -> xxhash64(s))").as("hs"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    assert(gotSets.toSeq === wantSets.toSeq)
  }

  test("simhash and char-ngram kernels are bit-identical to the composed-builtin formulations") {
    val sample = docs.select("doc_id", "text").limit(50)
    // SimHash64 vs explode + 64 per-bit vote sums
    val tok = sample
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("hw", xxhash64(col("w")))
    val votes = (0 until 64).map(i =>
      sum(when(expr(s"shiftright(hw, $i) & 1") === 1, 1).otherwise(-1)).as(s"b$i"))
    val bits = (0 until 64).map(i =>
      expr(s"IF(b$i > 0, CAST(${1L << i} AS BIGINT), CAST(0 AS BIGINT))"))
    val wantSim = tok.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_ bitwiseOR _).as("sig"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    val gotSim = Dedup.simhashSignatures(sample)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(gotSim.toSeq === wantSim.toSeq)
    // CharNgramHashes vs array_distinct(transform(sequence, substr, xxhash64))
    val gotG = sample.filter(length(col("text")) >= 3)
      .select(col("doc_id"), org.apache.spark.sql.graft.CharNgramHashes(col("text"), 3).as("g"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    val wantG = sample.filter(length(col("text")) >= 3)
      .select(col("doc_id"),
        expr("array_distinct(transform(sequence(1, length(text) - 2), i -> xxhash64(substr(text, i, 3))))").as("g"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    assert(gotG.toSeq === wantG.toSeq)
  }

  test("simhash: identical docs at hamming 0, near docs close") {
    val a = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(a, 0).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getLong(0) === 1L && pairs.head.getLong(1) === 2L)
    assert(pairs.head.getInt(2) === 0)
  }

  test("embedding near-dup pairs are symmetric-free and thresholded") {
    val e = spark.read.parquet(s"$Sf/embeddings.parquet")
    val pairs = Dedup.embeddingNearDuplicates(e, 0.45).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(_.getDouble(2) >= 0.45))
  }

  test("semDedup: keep rule is exact — farthest-from-centroid survives, every drop has an earlier neighbor") {
    val e = spark.read.parquet(s"$Sf/embeddings.parquet")
    val out = Dedup.semDedup(e, 0.45, nCells = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.length === e.count())        // one verdict per vector
    assert(out.map(_._1).distinct.length === out.length)
    val dropped = out.filter(_._4 == 0L)
    assert(dropped.nonEmpty, "fixture must exercise the prune")        // threshold is met somewhere
    assert(out.exists(_._4 == 1L))
    // re-derive the rule from the cosine ground truth: b dropped iff
    // some same-cell x with (ccos, id) lexicographically earlier is a
    // threshold-neighbor
    val vecs = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      // widen BEFORE the multiply, mirroring FloatVectorDot's
      // (double)a[i] * (double)b[i] — a float-precision product can
      // round the 4th decimal differently at a threshold boundary
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val ai = a(i).toDouble; val bi = b(i).toDouble
        dot += ai * bi; na += ai * ai; nb += bi * bi; i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.foreach { case (id, cell, ccos, keep) =>
      val earlierNeighbor = out.exists { case (xid, xcell, xccos, _) =>
        xid != id && xcell == cell &&
          (xccos < ccos || (xccos == ccos && xid < id)) &&
          cos(vecs(xid), vecs(id)) >= 0.45
      }
      assert((keep == 0L) === earlierNeighbor, s"vec $id: keep=$keep vs expected ${!earlierNeighbor}")
    }
  }

  test("blocked embedding self-join covers every pair exactly once, no nested loop") {
    val e = spark.read.parquet(s"$Sf/embeddings.parquet")
    // blocks=1 degenerates to the plain all-pairs set; block counts
    // must not change the result, only the execution shape
    def pairSet(blocks: Int) =
      Dedup.embeddingNearDuplicates(e, 0.30, blocks).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = pairSet(1)
    assert(expected.nonEmpty)
    assert(pairSet(16) === expected)
    assert(pairSet(5) === expected)
    val plan = Dedup.embeddingNearDuplicates(e, 0.45)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("ANN embedding dedup: subset of exact tier, candidates subquadratic") {
    val e = spark.read.parquet(s"$Sf/embeddings.parquet")
    val n = e.count()
    val allPairs = n * (n - 1) / 2
    val cand = Dedup.annCandidatePairs(e).persist()
    try {
      val nCand = cand.count()
      assert(nCand < allPairs / 2, s"candidates $nCand not subquadratic vs $allPairs")
      // ann output = exact output restricted to the candidate set —
      // the verify stage is the same exact cosine, so every emitted
      // pair is a true pair (precision 1); recall is the candidate
      // generator's to lose
      val exact = Dedup.embeddingNearDuplicates(e, 0.45).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val ann = Dedup.embeddingNearDuplicatesAnn(e, 0.45).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(ann.subsetOf(exact), s"ann pairs not a subset of exact: ${ann.diff(exact)}")
      val candSet = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exact.count(p => candSet((p._1, p._2))) === ann.size)
    } finally cand.unpersist()
  }

  test("ANN candidate volume grows ~linearly when cells scale with the corpus") {
    // deterministic pseudo-random corpus: dim-8 vectors from xxhash64
    def corpus(n: Int) = spark.range(n).selectExpr(
      "id AS vec_id",
      "transform(sequence(1, 8), j -> CAST((pmod(xxhash64(id * 8 + j), 1000) - 500) / 500.0 AS FLOAT)) AS embedding")
    // cells sized proportionally (fixed expected cell width of 25):
    // doubling the corpus should ~double candidates, not quadruple
    val c1 = Dedup.annCandidatePairs(corpus(400), nCells = 16, nprobe = 2).count()
    val c2 = Dedup.annCandidatePairs(corpus(800), nCells = 32, nprobe = 2).count()
    assert(c2 < 3 * c1, s"candidates scaled superlinearly: $c1 -> $c2")
    assert(c2 > c1, s"sanity: $c1 -> $c2")
  }

  test("LSH bucket cap bounds a pathological bucket, leaves real corpora unchanged") {
    // 60 identical docs: every band collapses into one hot bucket
    val hot = (0 until 60).map(i => (i.toLong, "aaa bbb ccc ddd eee fff ggg hhh"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(Dedup.wordShingles(hot))
    assert(Dedup.oversizedLshBuckets(sigs, maxBucketSize = 50).count() > 0)
    // dropped-bucket members route through the exact-duplicate
    // fallback: 60 identical docs -> 59 star pairs anchored at doc 0,
    // not the 1770 all-pairs of an uncapped bucket and not silence
    val star = Dedup.lshCandidatePairs(sigs, maxBucketSize = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star === (1 until 60).map(i => (0L, i.toLong)).toSet)
    assert(Dedup.lshCandidatePairs(sigs, maxBucketSize = 60).count() === 60L * 59 / 2)
    // the real fixture has no bucket near the default cap: identical output
    val realSigs = Dedup.minhashSignatures(Dedup.wordShingles(docs.select("doc_id", "text")))
    def pairs(cap: Int) = Dedup.lshCandidatePairs(realSigs, maxBucketSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(Dedup.MaxBucketSize) === pairs(Int.MaxValue))
  }

  test("hot-bucket duplicates are still caught end-to-end through the fallback") {
    // a degenerate boilerplate group big enough to trip a small cap,
    // plus a genuine near-dup pair in a healthy bucket
    val boiler = (0 until 30).map(i => (i.toLong, "aaa bbb ccc ddd eee fff ggg hhh"))
    val near = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again today"),
      (101L, "the quick brown fox jumps over the lazy dog again and again tonight"))
    val d = (boiler ++ near).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(Dedup.wordShingles(d))
    val pairs = Dedup.lshCandidatePairs(sigs, maxBucketSize = 20)
    // end-to-end: verified near-dups include the fallback star (jac
    // 1.0 identical docs) AND the healthy near pair; clustering then
    // reconstructs the full 30-doc group from the star
    val verified = Dedup.nearDuplicatesFromTokens(
      d.select(col("doc_id"), split(col("text"), " ").as("w")), 0.8)
    val vset = verified.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((1 until 30).map(i => (0L, i.toLong)).toSet.subsetOf(vset), s"fallback star missing: $vset")
    assert(vset.contains((100L, 101L)), s"healthy near pair missing: $vset")
    val clusters = Dedup.connectedComponents(verified)
    assert(clusters.filter(col("cluster_id") === 0L).count() === 30)
    assert(pairs.count() >= 29)
  }

  test("no persisted blocks outlive a dedup call (round-3 leak fix)") {
    val base = docs.select("doc_id", "text")
    assert(Dedup.nearDuplicates(base, 0.8).count() >= 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
    val sigs = Dedup.minhashSignatures(Dedup.wordShingles(base.limit(50)))
    assert(Dedup.lshCandidatePairs(sigs).count() >= 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    assert(Dedup.ngramJaccardPairs(docs.limit(100)).count() >= 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("ngram block-cap drop is symmetric in the pair (id-independent)") {
    // oversized (en, web, band=1) block: 15 identical 30-char docs, ids 100..114
    val hotText = "abcdefghijklmnopqrstuvwxyz0123" // 30 chars → band 1
    val hot = (100 until 115).map(i => (i.toLong, "en", "web", hotText.length, hotText))
    // healthy band-2 neighbors at ids BOTH below and above the hot ids:
    // 41 chars → band 2, |41-30| = 11 ≤ maxLenDiff, shares most 3-grams
    val nbText = hotText + "456789_abcd" // 41 chars
    val healthy = Seq((1L, "en", "web", nbText.length, nbText),
      (200L, "en", "web", nbText.length, nbText))
    val d = (hot ++ healthy).toDF("doc_id", "lang", "source", "n_chars", "text")
    assert(Dedup.oversizedNgramBlocks(d, maxBlockSize = 10).count() === 1)
    val pairs = Dedup.ngramJaccardPairs(d, maxBlockSize = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // bridging pairs into the oversized block are dropped REGARDLESS
    // of which side has the smaller id; the healthy pair survives, and
    // the block's 15 identical members come back via the
    // exact-duplicate fallback as a star anchored at id 100
    assert(pairs === Set((1L, 200L)) ++ (101 until 115).map(i => (100L, i.toLong)),
      s"expected healthy pair + fallback star, got $pairs")
  }

  test("adaptive block count is bounded and result-invariant") {
    assert(Dedup.adaptiveBlocks(0) === 4)
    assert(Dedup.adaptiveBlocks(1000) === 4)
    assert(Dedup.adaptiveBlocks(100_000_000L) === 256) // ceiling
    assert(Dedup.adaptiveBlocks(32_000_000L, 1_000_000L) === 256)
    val e = spark.read.parquet(s"$Sf/embeddings.parquet")
    val auto = Dedup.embeddingNearDuplicatesAuto(e, 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fixed = Dedup.embeddingNearDuplicates(e, 0.45, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto === fixed)
  }

  test("edit-distance dedup finds an injected small edit at its exact distance") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running onward"
    val df = Seq(
      (1L, "en", "web", base.length.toLong, base),
      (2L, "en", "web", (base.length + 1).toLong, base + "!"),    // dist 1
      (3L, "en", "web", base.length.toLong, base.replace("quick", "thick")), // dist 2
      (4L, "en", "web", 60L, "a completely different sentence that shares no material at all xx"))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val pairs = Dedup.editDistancePairs(df, maxDist = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) === 1L)
    assert(pairs((1L, 3L)) === 2L)
    assert(pairs((2L, 3L)) === 3L)
    assert(pairs.size === 3) // doc 4 pairs with nobody
  }

  test("fallback is restore-only: never bridges provenance the blocked join keeps apart") {
    // two oversized blocks with IDENTICAL text but different lang: the
    // uncapped operator never pairs across (lang, source), so neither
    // may the exact-duplicate fallback — a digest-only grouping would
    // star-pair all 24 docs together
    val hotText = "abcdefghijklmnopqrstuvwxyz0123" // 30 chars → band 1
    val d = ((100 until 112).map(i => (i.toLong, "en", "web", hotText.length.toLong, hotText)) ++
      (200 until 212).map(i => (i.toLong, "de", "web", hotText.length.toLong, hotText)))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    assert(Dedup.oversizedNgramBlocks(d, maxBlockSize = 10).count() === 2)
    val ngramPairs = Dedup.ngramJaccardPairs(d, maxBlockSize = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val enStar = (101 until 112).map(i => (100L, i.toLong)).toSet
    val deStar = (201 until 212).map(i => (200L, i.toLong)).toSet
    assert(ngramPairs === enStar ++ deStar, s"cross-provenance pairs leaked: $ngramPairs")
    val editPairs = Dedup.editDistancePairs(d, maxBlockSize = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(editPairs === enStar ++ deStar, s"cross-provenance pairs leaked: $editPairs")
  }

  test("fallback bridges an identical-gram group split across adjacent oversized bands") {
    // "abab…" at 39 chars (band 1) and 40 chars (band 2): one gram
    // set {aba, bab}, length gap 1 ≤ maxLenDiff — the uncapped join
    // pairs them (adjacent bands explode into the same join key), so
    // when BOTH blocks are oversized the fallback must reconnect the
    // group: two per-band stars plus one rep-to-rep bridge pair
    val t39 = "ab" * 19 + "a"
    val t40 = "ab" * 20
    val d = ((0 until 12).map(i => (i.toLong, "en", "web", t39.length.toLong, t39)) ++
      (100 until 112).map(i => (i.toLong, "en", "web", t40.length.toLong, t40)))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    assert(Dedup.oversizedNgramBlocks(d, maxBlockSize = 10).count() === 2)
    val pairs = Dedup.ngramJaccardPairs(d, maxBlockSize = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val stars = (1 until 12).map(i => (0L, i.toLong)).toSet ++
      (101 until 112).map(i => (100L, i.toLong)).toSet
    assert(pairs === stars + ((0L, 100L)), s"expected stars + rep bridge, got $pairs")
    // and clustering reconstructs ONE 24-doc group from them
    val clusters = Dedup.connectedComponents(Dedup.ngramJaccardPairs(d, maxBlockSize = 10))
      .collect().map(r => r.getLong(1)).distinct
    assert(clusters.toSeq === Seq(0L))
  }

  test("fallback is restore-only: identical gram sets at a length gap stay unpaired") {
    // "abab…" at 40 and 120 chars shares ONE 3-gram set {aba, bab} but
    // sits 80 chars apart — far past maxLenDiff, in non-adjacent bands
    // (2 and 6) — so the uncapped operator would never pair them; the
    // fallback must keep the two oversized groups as separate stars
    val short = "ab" * 20 // 40 chars → band 2
    val long = "ab" * 60  // 120 chars → band 6
    val d = ((0 until 12).map(i => (i.toLong, "en", "web", short.length.toLong, short)) ++
      (100 until 112).map(i => (i.toLong, "en", "web", long.length.toLong, long)))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    assert(Dedup.oversizedNgramBlocks(d, maxBlockSize = 10).count() === 2)
    val pairs = Dedup.ngramJaccardPairs(d, maxBlockSize = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val shortStar = (1 until 12).map(i => (0L, i.toLong)).toSet
    val longStar = (101 until 112).map(i => (100L, i.toLong)).toSet
    assert(pairs === shortStar ++ longStar, s"cross-band pairs leaked: $pairs")
  }

  test("containment: doc-inside-doc found asymmetrically, ratio-capped, directional") {
    def words(r: Range, p: String) = r.map(i => s"$p$i").mkString(" ")
    val a = words(0 until 30, "w")                         // the quote
    val b = a + " " + words(0 until 90, "x")               // contains a, ~4x chars
    val c = a + " " + words(0 until 900, "y")              // contains a, ~30x chars — past the ratio cap
    val d = words(0 until 30, "z")                         // unrelated
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, d))
      .map { case (id, t) => (id, "en", "web", t.length.toLong, t) }
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val got = Dedup.containmentPairs(docs, 4, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // a ⊂ b at full containment (all 27 4-shingles of a appear in b);
    // the reverse direction and the unrelated doc never appear, and
    // the 30x container is excluded by the log2-band ratio cap
    assert(got.keySet === Set((1L, 2L)), s"got $got")
    assert(got((1L, 2L)) === 1.0)
    // symmetric jaccard on the same pair is far below the threshold —
    // the asymmetry is the point
    val jacLike = 27.0 / (27 + 117 - 27)
    assert(jacLike < 0.5)
  }

  test("containment hot-shingle cap: over-cap identical groups come back as a star") {
    def words(r: Range, p: String) = r.map(i => s"$p$i").mkString(" ")
    val boiler = words(0 until 20, "b") // 15 identical copies → every shingle df 15 > cap 10
    val a = words(0 until 30, "w")
    val b = a + " " + words(0 until 90, "x") // healthy containment pair rides along
    val docs = ((100 until 115).map(i => (i.toLong, boiler)) ++ Seq((1L, a), (2L, b)))
      .map { case (id, t) => (id, "en", "web", t.length.toLong, t) }
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    assert(Dedup.hotContainmentShingles(docs, 4, maxPostings = 10).count() === 17) // 20-4+1 shingles
    val got = Dedup.containmentPairs(docs, 4, 0.5, maxPostings = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val star = (101 until 115).map(i => (100L, i.toLong) -> 1.0).toMap
    assert(got === star + ((1L, 2L) -> 1.0), s"got $got")
  }

  test("containment fallback fires for groups made fully hot by EXTERNAL embedders") {
    // 5 identical boilerplate copies (below any own-group cap) + 7
    // larger docs each embedding the same text verbatim: every
    // boilerplate shingle has df 12 > cap 10, so the copies lose all
    // postings — the fallback must still star them
    def words(r: Range, p: String) = r.map(i => s"$p$i").mkString(" ")
    val boiler = words(0 until 20, "b")
    val docs = ((100 until 105).map(i => (i.toLong, boiler)) ++
      (200 until 207).map(i => (i.toLong, boiler + " " + words(0 until 60, s"u$i"))))
      .map { case (id, t) => (id, "en", "web", t.length.toLong, t) }
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val got = Dedup.containmentPairs(docs, 4, 0.5, maxPostings = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val star = (101 until 105).map(i => (100L, i.toLong)).toSet
    // the copies' intra-group pairs come back as the star; the
    // copy-inside-embedder pairs stay dropped (all their shared
    // shingles are hot — the documented residual), and the embedders
    // pair with nobody (their unique tails share nothing)
    assert(got === star, s"got $got")
  }

  test("keepBest elects the highest-quality cluster member, min id on ties") {
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (5L, 20L), (6L, 20L))
      .toDF("doc_id", "cluster_id")
    val quality = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (5L, 0.7), (6L, 0.7))
      .toDF("doc_id", "quality")
    val got = Dedup.keepBest(labels, quality).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(got === Set(
      (1L, 10L, 2L, false), (2L, 10L, 2L, true), (3L, 10L, 2L, false),
      (5L, 20L, 5L, true), (6L, 20L, 5L, false)))
  }

  test("connected components: chains merge, islands stay apart, convergence is multi-round") {
    // components: {1..10} as a pure chain (diameter 9 → forces several
    // propagation rounds), {20,21}, and a triangle {30,31,32}
    val pairs = ((1L to 9L).map(i => (i, i + 1)) ++ Seq((20L, 21L), (30L, 31L), (31L, 32L), (30L, 32L)))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 10L).forall(got(_) === 1L))
    assert(got(20L) === 20L && got(21L) === 20L)
    assert(Seq(30L, 31L, 32L).forall(got(_) === 30L))
    assert(got.size === 15)
  }

  test("exact duplicated spans: boundaries, merge, and the cross-doc rule") {
    // docs 1/2 share tokens 0..9 verbatim (a 10-token prefix) and
    // nothing else; doc 3 repeats ITS OWN 8-gram twice but shares
    // nothing cross-doc; doc 4 is unique
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val rep = (0 until 8).map(i => s"r$i").mkString(" ")
    val d = Seq(
      (1L, s"$shared a b c d e f g h i"),
      (2L, s"$shared j k l m n o p q r"),
      (3L, s"$rep x y $rep"),
      (4L, (0 until 30).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(d, 8, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // docs 1/2: duplicated 8-gram positions 0,1,2 -> ONE merged span
    // [0, 10) = 10 tokens; doc 3's self-repeat is NOT >= 2 docs
    assert(got === Map(1L -> ((1L, 10L)), 2L -> ((1L, 10L))))
    // with minDocs = 1 the self-repeat counts: doc 3 gains spans
    val self = Dedup.duplicatedSpans(d, 8, 1).collect()
      .map(r => r.getLong(0)).toSet
    assert(self.contains(3L))
    // span hashes of the two sharers agree (same [0, 10) span set)
    val hashes = Dedup.duplicatedSpans(d, 8, 2).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(hashes(1L) === hashes(2L))
  }

  test("connected components of an empty pair set is empty, not an error") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() === 0)
    assert(Dedup.connectedComponentsLogRounds(empty).count() === 0)
  }

  test("large-star/small-star: a 100-node chain converges in O(log^2 n) star rounds, same labels") {
    // diameter 99: plain propagation needs ~99 rounds; the alternating
    // algorithm must compress it in logarithmically many
    val chain = (0L until 99L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (stars, rounds) = Dedup.alternatingStarRounds(chain, maxStarRounds = 30)
    assert(rounds <= 10, s"expected O(log^2 n) rounds for a 100-chain, used $rounds")
    // converged to (near-)stars: every component minimum is reachable
    // within <= 2 hops, so the finishing propagation is 1-2 rounds —
    // and the final labels equal the plain form's
    val got = Dedup.connectedComponentsLogRounds(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 100)
    assert((0L to 99L).forall(got(_) === 0L), got.toSeq.sortBy(_._1).take(10).toString)
    assert(stars.count() >= 99) // vertex set preserved through the rounds
  }

  test("large-star/small-star agrees with plain propagation on random graphs") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 80).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val df = edges.toDF("id_a", "id_b")
    val plain = Dedup.connectedComponents(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val alt = Dedup.connectedComponentsLogRounds(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alt === plain)
  }

  test("connected components match a brute-force union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 60).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val want = parent.keys.map(v => v -> find(v)).toMap
    assert(got === want)
  }

  test("ngram block cap bounds a hot (lang, source, band) block") {
    val text = ("abcdefghij " * 3).trim
    val hot = (0 until 40).map(i => (i.toLong, "en", "web", text.length, text))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    // capped block -> 39 fallback star pairs at jac 1.0 (identical
    // docs), not the 780 all-pairs and not silence
    val capped = Dedup.ngramJaccardPairs(hot, maxBlockSize = 10).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      (1 until 40).map(i => (0L, i.toLong)).toSet)
    assert(capped.forall(_.getDouble(2) === 1.0))
    assert(Dedup.ngramJaccardPairs(hot, maxBlockSize = 40).count() === 40L * 39 / 2)
    // default cap is inert on the real fixture
    def pairs(cap: Int) = Dedup.ngramJaccardPairs(docs, maxBlockSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(Dedup.MaxBucketSize) === pairs(Int.MaxValue))
  }

  test("normalized dedup groups case/punct/whitespace variants that raw exact dedup keeps apart") {
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD."),
      (4L, "goodbye world"))
      .toDF("doc_id", "text")
    val r = Dedup.normalizedDedup(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    // 1,2,3 collapse to one group with survivor 1; 4 stands alone
    assert(r(1L) === ((3L, 1L, true)))
    assert(r(2L) === ((3L, 1L, false)))
    assert(r(3L) === ((3L, 1L, false)))
    assert(r(4L) === ((1L, 4L, true)))
    // the raw exact pass sees four distinct contents
    assert(Dedup.exactHashGroups(docs).count() === 4L)
  }

  test("boilerplate removal drops EVERY copy of a hot segment, unlike keep-first paragraph dedup") {
    // 2-word segments; "nav bar" is shared chrome across docs 1-3,
    // each doc also has unique tail content
    val d = Seq(
      (1L, "nav bar alpha beta"),
      (2L, "nav bar gamma delta"),
      (3L, "nav bar epsilon zeta"),
      (4L, "eta theta iota kappa"))
      .toDF("doc_id", "text")
    val r = Dedup.boilerplateRemoval(d, segWords = 2, minDf = 2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    // docs 1-3 lose the shared segment (all copies — no survivor), keep their tail
    assert(r(1L)._1 === 2L && r(1L)._2 === 1L)
    assert(r(2L)._2 === 1L && r(3L)._2 === 1L)
    assert(r(4L) === ((2L, 0L, md5Hex("eta theta iota kappa"))))
    // retained text is the doc minus the chrome, in order
    assert(r(1L)._3 === md5Hex("alpha beta"))
    // contrast: paragraphDedup KEEPS the first copy of the hot segment
    val pd = Dedup.paragraphDedup(d, segWords = 2).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(pd(1L) === 2L, "keep-first retains doc 1's navbar copy")
    // below threshold nothing is boilerplate
    val none = Dedup.boilerplateRemoval(d, segWords = 2, minDf = 4).collect()
    assert(none.forall(_.getLong(2) === 0L))
    // a segment repeated WITHIN one doc does not reach df >= 2
    val selfRep = Seq((1L, "dup seg dup seg"), (2L, "other words here maybe"))
      .toDF("doc_id", "text")
    assert(Dedup.boilerplateRemoval(selfRep, segWords = 2, minDf = 2)
      .collect().forall(_.getLong(2) === 0L))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("clusterCap: k survivors per family, singletons always kept, ties break to the low id") {
    val docsIds = (1L to 8L).toDF("doc_id")
    // family A = {1,2,3,4} labeled 1; family B = {5,6} labeled 5; 7, 8 singletons
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    // quality: 2 best in A; 3 and 4 TIE -> rank by id; B ties entirely
    val quality = Seq(1L -> 0.1, 2L -> 0.9, 3L -> 0.5, 4L -> 0.5,
      5L -> 0.7, 6L -> 0.7, 7L -> 0.2, 8L -> 0.8).toDF("doc_id", "quality")
    val got = Dedup.clusterCap(docsIds, labels, quality, k = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(2L) === ((1L, 1L, true)))   // best of A
    assert(got(3L) === ((1L, 2L, true)))   // tie at 0.5 -> id 3 beats 4
    assert(got(4L) === ((1L, 3L, false)))
    assert(got(1L) === ((1L, 4L, false)))
    assert(got(5L) === ((5L, 1L, true)) && got(6L) === ((5L, 2L, true)))
    assert(got(7L) === ((7L, 1L, true)) && got(8L) === ((8L, 1L, true)))
    // k=1 degenerates to the keep-best election on clustered docs
    val k1 = Dedup.clusterCap(docsIds, labels, quality, k = 1).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val kb = Dedup.keepBest(labels, quality).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    for ((id, kept) <- kb) assert(k1(id) === kept, s"doc $id")
    intercept[IllegalArgumentException](Dedup.clusterCap(docsIds, labels, quality, k = 0))
  }

  test("incremental dedup: fresh docs match base only, best-match ties break to the low id") {
    val body = (1 to 30).map(i => s"tok$i").mkString(" ")
    val base = Seq(
      (2L, body),                       // near-identical to fresh 11 and 13
      (4L, body),                       // exact same text as 2 — the tie candidate
      (6L, (100 to 130).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val fresh = Seq(
      (11L, body + " extra"),           // near-dup of base 2 AND 4 → tie → min id 2
      (13L, body),                      // exact copy → jac 1.0
      (15L, (200 to 230).map(i => s"novel$i").mkString(" ")),  // novel
      (17L, "too short"))               // < 3 tokens: no shingles, trivially new
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearDedup(base, fresh).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3),
        r.getBoolean(4)))).toMap
    assert(got.keySet === Set(11L, 13L, 15L, 17L))
    // 11 matches both identical base docs; tie at equal jac -> base id 2
    assert(got(11L)._1 === 2L && got(11L)._2 === 2L && !got(11L)._4)
    assert(got(13L)._1 === 2L && got(13L)._2 === 2L && got(13L)._3 === 1.0 && !got(13L)._4)
    assert(got(15L) === ((0L, -1L, -1.0, true)))
    assert(got(17L) === ((0L, -1L, -1.0, true)))
    // fresh-vs-fresh duplication is by contract NOT reported: a fresh
    // clone pair with no base counterpart stays is_new on both rows
    val freshTwins = Seq((21L, (300 to 330).map(i => s"twin$i").mkString(" ")),
      (23L, (300 to 330).map(i => s"twin$i").mkString(" "))).toDF("doc_id", "text")
    val twins = Dedup.incrementalNearDedup(base, freshTwins).collect()
    assert(twins.forall(_.getBoolean(4)))
  }

  test("band planning: hand-computed fixed-point chain, recurrence replay, curve laws") {
    // hand-computed (b=2, r=2) at s = 0.5: s^2 = 250M;
    // (1 - 0.25)^2 chain: 1e9 -> 750M -> 562.5M; collide = 437.5M
    val one = Dedup.bandPlan(spark, Seq((2, 2))).collect()
      .map(r => r.getLong(2) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(one(500000000L) === ((250000000L, 437500000L)))
    // full default sweep: replay the integer recurrence driver-side
    // (the pageRank spec device) for every row
    def ref(b: Long, r: Long, s: Long): (Long, Long) = {
      var sr = s
      for (_ <- 2L to r) sr = sr * s / 1000000000L
      var acc = 1000000000L
      for (_ <- 1L to b) acc = acc * (1000000000L - sr) / 1000000000L
      (sr, 1000000000L - acc)
    }
    val rows = Dedup.bandPlan(spark).collect()
    assert(rows.length === Dedup.BandPlanConfigs.length * 19)
    rows.foreach { r =>
      val (sr, col) = ref(r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) === sr && r.getLong(4) === col,
        s"mismatch at b=${r.getLong(0)} r=${r.getLong(1)} s=${r.getLong(2)}")
    }
    // curve laws: collide is nondecreasing in s per config, and the
    // r=1 config dominates everything at low s (the high-recall /
    // high-fp corner a planner rejects on fp_area)
    val byCfg = rows.groupBy(r => (r.getLong(0), r.getLong(1)))
    byCfg.values.foreach { rs =>
      val curve = rs.sortBy(_.getLong(2)).map(_.getLong(4))
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b })
    }
    val low = rows.filter(_.getLong(2) == 100000000L)
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(low((16L, 1L)) > low((32L, 4L)) && low((16L, 1L)) > low((8L, 8L)))
    // the shipped minhash configuration is in the design space, and
    // its summary columns are consistent discrete integrals
    val shipped = rows.filter(r =>
      r.getLong(0) == Dedup.Bands.toLong && r.getLong(1) == Dedup.RowsPerBand.toLong)
    assert(shipped.length === 19)
    val fp = shipped.filter(_.getLong(2) < 800000000L).map(_.getLong(4)).sum
    val fn = shipped.filter(_.getLong(2) >= 800000000L).map(r => 1000000000L - r.getLong(4)).sum
    assert(shipped.forall(r => r.getLong(6) === fp && r.getLong(7) === fn))
    assert(shipped.forall(r =>
      r.getLong(5) === shipped.find(_.getLong(2) == 800000000L).get.getLong(4)))
  }
}
