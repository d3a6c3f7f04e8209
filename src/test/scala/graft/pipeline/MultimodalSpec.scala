package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$Sf/documents.parquet")

  test("binary payload schema: binary column + typed metadata struct") {
    val m = Multimodal.withBinaryPayload(docs)
    assert(m.schema("payload").dataType.typeName === "binary")
    assert(m.schema("meta").dataType.typeName === "struct")
    val r = m.filter(col("doc_id") === 0).select("meta.kind", "meta.size_bytes").head()
    assert(r.getString(0) === "text/plain")
    assert(r.getLong(1) > 0)
  }

  test("feature extraction runs per-partition and matches SQL-side arithmetic") {
    val m = Multimodal.withBinaryPayload(docs.limit(50))
    val f = Multimodal.extractFeatures(spark, m)
    // n_bytes from the imperative stage == octet length from the SQL side
    val joined = f.join(m, "doc_id")
      .filter(col("n_bytes") =!= length(col("payload")))
    assert(joined.count() === 0)
    // checksum is a positive byte sum for ASCII text
    assert(f.filter(col("checksum") <= 0).count() === 0)
    assert(f.head().getString(3).length === 16) // 8 bytes → 16 hex chars
  }

  test("features are UTF-8 byte-based, not code-point-based (non-ASCII)") {
    import spark.implicits._
    val fixture = Seq((1L, "héllo wörld"), (2L, "中文 text"), (3L, "plain"))
    val m = Multimodal.withBinaryPayload(fixture.toDF("doc_id", "text"))
    val f = Multimodal.extractFeatures(spark, m)
      .orderBy("doc_id").collect()
    fixture.zip(f).foreach { case ((_, text), row) =>
      val bytes = text.getBytes("UTF-8")
      assert(row.getLong(1) === bytes.length.toLong)            // n_bytes
      assert(row.getLong(2) === bytes.map(_ & 0xff).map(_.toLong).sum) // checksum
      assert(row.getString(3) === bytes.take(8).map(b => f"$b%02X").mkString)
    }
  }

  test("partitioning is preserved through the decode stage") {
    val m = Multimodal.withBinaryPayload(docs).repartition(7)
    val f = Multimodal.extractFeatures(spark, m)
    assert(f.rdd.getNumPartitions === 7)
    assert(f.count() === docs.count())
  }

  test("frame sampling emits array<binary> with stride") {
    val m = Multimodal.withBinaryPayload(docs.limit(10))
    val fr = Multimodal.frameSample(m, frameBytes = 16, stride = 2)
    assert(fr.schema("frames").dataType.sql === "ARRAY<BINARY>")
    val r = fr.filter(col("doc_id") === 0).head()
    assert(r.getLong(2) > 0)
  }

  test("resize keeps every factor-th byte with an exact checksum") {
    import spark.implicits._
    val fixture = Seq((1L, "abcdefghij"), (2L, ""), (3L, "q")).toDF("doc_id", "text")
    val m = Multimodal.withBinaryPayload(fixture)
    val r = Multimodal.resizePayload(spark, m, 3).orderBy("doc_id").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // "abcdefghij" at factor 3 keeps a, d, g, j
    assert(r(1L) === ((10L, 4L, ('a' + 'd' + 'g' + 'j').toLong)))
    assert(r(2L) === ((0L, 0L, 0L)))  // empty payload: zero frames, zero sum
    assert(r(3L) === ((1L, 1L, 'q'.toLong)))
  }

  test("frame sampling keeps only full frames; short payloads yield zero frames") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "x" * 300), // blocks 0..3 full + partial tail; stride 4 keeps block 0 -> 1 frame
      (2L, "y" * 40),  // shorter than one frame -> none
      (3L, "z" * 512)) // blocks 0..7; stride 4 keeps blocks 0 and 4 -> 2 frames
      .toDF("doc_id", "text")
    val m = Multimodal.withBinaryPayload(fixture)
    val fr = Multimodal.frameSample(m).orderBy("doc_id")
      .select("doc_id", "n_frames").collect()
    assert(fr.map(r => r.getLong(0) -> r.getLong(1)).toMap === Map(1L -> 1L, 2L -> 0L, 3L -> 2L))
    val stats = Multimodal.frameStats(spark, m).collect()
    assert(stats.forall(_.getLong(2) === 64L)) // every emitted frame is full
    // checksums are exact byte sums ('z' = 122, 64 bytes)
    assert(stats.filter(_.getLong(0) === 3L).forall(_.getLong(3) === 122L * 64))
  }

  test("frame sampling is uncapped: oversized payloads emit frames past index 40") {
    // regression pin for the q_mm_frames oracle divergence: an early
    // oracle hardcoded `range(0, 40)` and would silently truncate any
    // payload over 10,240 bytes; the operator (and the oracle, which
    // now derives its range from the payload length) must keep going
    import spark.implicits._
    val n = 11000 // kept frames: j*256 + 64 <= 11000 -> j in 0..42
    val m = Multimodal.withBinaryPayload(Seq((1L, "w" * n)).toDF("doc_id", "text"))
    val stats = Multimodal.frameStats(spark, m).orderBy("frame_idx").collect()
    assert(stats.length === 43)
    assert(stats.last.getLong(1) === 42L) // frame_idx past the old cap of 40
    assert(stats.forall(_.getLong(3) === 'w'.toLong * 64))
  }

  test("audio windows decode little-endian signed PCM16 with a short tail window") {
    import spark.implicits._
    // "ab" = bytes 0x61 0x62 → sample 0x6261 = 25185; "abab" = two of them
    val m = Multimodal.withBinaryPayload(Seq((1L, "abab"), (2L, "ab")).toDF("doc_id", "text"))
    val got = Multimodal.audioWindows(spark, m, windowSamples = 1)
      .orderBy("doc_id", "window_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val e = 25185L * 25185L
    assert(got.toSeq === Seq((1L, 0L, 1L, e, 25185L), (1L, 1L, 1L, e, 25185L),
      (2L, 0L, 1L, e, 25185L)))
    // negative samples: 0xFF 0xFF → -1 (energy 1, peak 1); built via a
    // direct binary frame since text payloads are ASCII
    val neg = Seq((3L, Array[Byte](-1, -1, 0, -128))).toDF("doc_id", "payload")
    val g2 = Multimodal.audioWindows(spark, neg, windowSamples = 2).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    // samples: -1 and 0x8000 = -32768 → energy 1 + 32768², peak 32768
    assert(g2.toSeq === Seq((2L, 1L + 32768L * 32768L, 32768L)))
    // odd trailing byte dropped; empty payload yields no windows
    val odd = Seq((4L, Array[Byte](65, 66, 67)), (5L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
    val g3 = Multimodal.audioWindows(spark, odd, windowSamples = 8).collect()
    assert(g3.length === 1 && g3(0).getLong(2) === 1L)
    // short tail: 3 samples at windowSamples=2 → windows of 2 and 1
    val tail = Multimodal.audioWindows(spark,
      Multimodal.withBinaryPayload(Seq((6L, "aabbcc")).toDF("doc_id", "text")),
      windowSamples = 2).orderBy("window_idx").collect()
    assert(tail.map(_.getLong(2)).toSeq === Seq(2L, 1L))
  }

  test("keyframes: static payloads flag only the opener; big jumps flag, small drifts don't") {
    import spark.implicits._
    // doc 1: the same 64-char block repeated 16 times with stride 4 —
    // every sampled frame identical ⇒ only frame 0 is a keyframe
    val block = "x" * 64
    val static = (1L, block * 16)
    // doc 2: sampled frames (stride 4 ⇒ blocks 0, 4, 8) are 'a'*64,
    // 'z'*64, 'z'*63+'{' — checksum jumps 64·25=1600 (keyframe), then
    // drifts by 1 (not a keyframe at threshold 200)
    val blocks = Seq.fill(4)("a" * 64) ++ Seq.fill(4)("z" * 64) ++ Seq("z" * 63 + "{")
    val drifting = (2L, blocks.mkString)
    val m = Multimodal.withBinaryPayload(Seq(static, drifting).toDF("doc_id", "text"))
    val rows = Multimodal.keyframes(spark, m).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getBoolean(3), r.getLong(4))).toMap
    val d1 = rows.filter(_._1._1 == 1L)
    assert(d1((1L, 0L))._1 && d1.size === 4)
    assert(d1.forall { case ((_, idx), (kf, n)) => (kf == (idx == 0L)) && n == 1L })
    assert(rows((2L, 0L)) === ((true, 2L)))  // opener
    assert(rows((2L, 1L)) === ((true, 2L)))  // a→z jump
    assert(rows((2L, 2L)) === ((false, 2L))) // 1-byte drift under threshold
  }

  test("phash: identical payloads at dist 0, tweaked near at small dist, alien/short excluded") {
    import spark.implicits._
    val base = "A" * 64 + "B" * 64   // 128 bytes, clean block structure
    val fixture = Seq(
      (1L, base),
      (2L, base),                     // byte-identical -> dist 0
      (3L, base.updated(10, 'C')),    // one byte +2 in block 1 -> dist <= 1 after floor
      (4L, ("z" * 128)),              // alien content, same length
      (5L, "tiny"))                   // < 16 bytes: no signature
      .toDF("doc_id", "text")
    val m = Multimodal.withBinaryPayload(fixture)
    val sig = Multimodal.blockSignature(spark, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    // hand-check doc 1: blocks 0-7 all 'A' (65), blocks 8-15 all 'B' (66)
    assert(sig(1L) === (Seq.fill(8)(65L) ++ Seq.fill(8)(66L)))
    assert(!sig.contains(5L))
    val got = Multimodal.phashPairs(spark, m).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) === 0L)
    // the tweak moves one block mean by at most 1 after flooring; pair kept
    assert(got.contains((1L, 3L)) && got((1L, 3L)) <= 1L)
    assert(got.contains((2L, 3L)))
    // the alien doc shares no band with anything -> never paired
    assert(!got.keySet.exists(k => k._1 == 4L || k._2 == 4L))
    assert(!got.keySet.exists(k => k._1 == 5L || k._2 == 5L))
    // oversized-bucket cap: a farm of identical payloads past the cap
    // goes silent instead of quadratic; an under-cap pair elsewhere
    // still reports
    val farm = (100L to 130L).map(i => (i, "F" * 64)) ++ Seq(
      (200L, "G" * 64), (201L, "G" * 64))
    val capped = Multimodal.phashPairs(spark,
        Multimodal.withBinaryPayload(farm.toDF("doc_id", "text")), maxBucketSize = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq === Seq((200L, 201L)))
  }

  test("phash hi-resolution config: identical payloads still pair at dist 0; " +
      "a mid-block tweak the coarse config tolerates breaks the finer 6-value band only if it spans it") {
    import spark.implicits._
    val base = "A" * 48 + "B" * 48   // 96 bytes: 24 blocks of 4 bytes
    val fixture = Seq(
      (1L, base),
      (2L, base),                     // byte-identical -> dist 0 at ANY resolution
      (3L, base.updated(10, 'E')),    // +4 in one 4-byte block -> one mean +1
      (4L, "z" * 96))                 // alien
      .toDF("doc_id", "text")
    val m = Multimodal.withBinaryPayload(fixture)
    val got = Multimodal.phashPairs(spark, m,
        blocks = 24, bands = 4, maxDist = 96L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) === 0L)
    // the tweak shifts exactly one of 24 block means by 1: three of the
    // four 6-value bands stay intact, so the pair is still a candidate
    // and verifies at dist 1
    assert(got((1L, 3L)) === 1L && got((2L, 3L)) === 1L)
    assert(!got.keySet.exists(k => k._1 == 4L || k._2 == 4L))
  }

  test("cdc: chunks tile the payload, duplicates share hashes, an insert resyncs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val body = Array.fill(600)((rnd.nextInt(26) + 'a').toChar).mkString
    val fixture = Seq(
      (1L, body),
      (2L, body),                 // byte-identical twin
      (3L, "PREFIX-" + body),     // shifted content: boundaries travel with it
      (4L, "ab"))                 // shorter than a window: one whole-doc chunk
      .toDF("doc_id", "text")
    val ch = Multimodal.cdcChunks(spark, Multimodal.withBinaryPayload(fixture)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val byDoc = ch.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // chunks tile 1..n contiguously in idx order
    for ((id, n) <- Seq(1L -> 600L, 3L -> 607L, 4L -> 2L)) {
      val cs = byDoc(id)
      assert(cs.head._3 === 1L && cs.last._4 === n, s"doc $id")
      cs.sliding(2).foreach { case Array(a, b) => assert(b._3 === a._4 + 1) case _ => }
    }
    assert(byDoc(4L).length === 1)
    // identical payloads -> identical chunk sequences
    assert(byDoc(1L).map(c => (c._2, c._3, c._4, c._5)).toSeq ===
      byDoc(2L).map(c => (c._2, c._3, c._4, c._5)).toSeq)
    // CDC resync: boundaries follow CONTENT, so after the first
    // boundary past the edit, doc 3's chunk hashes realign with doc 1's
    val h1 = byDoc(1L).map(_._5).toSet
    val h3 = byDoc(3L).map(_._5)
    val shared = h3.count(h1)
    assert(shared >= h3.length - 2, s"only $shared of ${h3.length} chunks resynced")
  }
}
