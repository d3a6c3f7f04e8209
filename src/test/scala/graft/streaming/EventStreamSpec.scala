package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files

class EventStreamSpec extends SparkSpec {

  test("windowed streaming counts match the batch window aggregation") {
    // feed the sf0.001 events (as JSON) through the streaming path
    val src = Files.createTempDirectory("graft-stream-src")
    val batch = graft.queries.Relational.events(spark, Sf)
    batch.coalesce(2).write.mode("overwrite").json(src.toString)

    val stream = EventStream.readJsonStream(spark, src.toString)
    assert(stream.isStreaming)
    // Complete mode into a memory sink: a finite feed never advances
    // the watermark past the trailing windows, so Append would hold
    // them back; Complete emits the full aggregate for comparison.
    val q = EventStream.windowedCounts(stream)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("wc").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("wc")
    val expected = batch
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n").as("n_exp"))
    assert(streamed.count() === expected.count())
    assert(streamed.join(expected, Seq("bucket", "event_type"))
      .filter(col("n") =!= col("n_exp")).count() === 0)
  }

  test("windowed quantile sketch folds across micro-batches: exact stats + rank-valid median") {
    import spark.implicits._
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = 1599999300000L // bucket-aligned epoch ms (1599999300 = 1777777 * 900)
    def t(m: Long) = new Timestamp(base + m * 60000L)
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val q = EventStream.windowedQuantiles(events, "15 minutes")
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("wq").start()
    // one bucket's values split ACROSS batches — the sketch in the
    // state store must absorb both and still respect the rank bound
    input.addData((1L, t(1), 10.0), (1L, t(2), 20.0), (1L, t(3), 30.0))
    q.processAllAvailable()
    input.addData((1L, t(4), 40.0), (1L, t(5), 50.0), (2L, t(20), 7.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wq").orderBy("bucket").collect()
    assert(rows.length === 2)
    val b1 = rows(0)
    assert(b1.getLong(1) === 5L && b1.getDouble(2) === 10.0 && b1.getDouble(3) === 50.0)
    // median of {10..50}: the cross-batch fold must land on 30 —
    // accuracy >> n makes the sketch exact here
    assert(b1.getDouble(4) === 30.0)
    assert(rows(1).getLong(1) === 1L && rows(1).getDouble(4) === 7.0)
  }

  test("dropDuplicatesWithinWatermark dedups an unbounded stream with bounded state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("event_id", "ts", "value")
    val q = EventStream.dedupWithinWatermark(events, Seq("event_id"), "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_stream").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00"), 1.0), (1L, ts("2024-01-01 10:01:00"), 1.0),
        (2L, ts("2024-01-01 10:02:00"), 2.0))
      q.processAllAvailable()
      // same key re-sent in a later batch, still within the watermark
      input.addData((1L, ts("2024-01-01 10:03:00"), 1.0), (3L, ts("2024-01-01 10:04:00"), 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_stream").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("DedupStream.exactDedup carries the canon mapping across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.DedupStream.exactDedup(spark, docs)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_exact_stream").start()
    try {
      // batch 1: two distinct docs + an in-batch duplicate of doc 1
      input.addData((1L, "aaa"), (2L, "bbb"), (3L, "aaa"))
      q.processAllAvailable()
      // batch 2: duplicates of BOTH earlier docs, plus a new one —
      // the state store must resolve them to the batch-1 keepers
      input.addData((10L, "aaa"), (11L, "bbb"), (12L, "ccc"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("dedup_exact_stream").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 10L -> 1L, 11L -> 2L, 12L -> 12L))
  }

  test("DedupStream LSH ingest: bucket state carries candidates across batches; cap silences hot buckets") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val textA = "the quick brown fox jumps over the lazy dog again and again today"
    val textB = "the quick brown fox jumps over the lazy dog again and again tonight"
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.DedupStream
      .lshIngestCandidates(spark, graft.streaming.DedupStream.bandedSignatures(docs), maxBucketSize = 50)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("lsh_ingest").start()
    try {
      input.addData((1L, textA), (2L, "completely different words entirely unrelated content here for sure"))
      q.processAllAvailable()
      // near-dup of doc 1 arrives a batch later: only the stored
      // bucket members can pair it
      input.addData((3L, textB))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("lsh_ingest").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)), s"cross-batch candidate missing: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), s"unrelated doc paired: $pairs")

    // hot bucket: 60 identical docs in one batch with cap 50 -> the
    // bucket exceeds the cap immediately and emits nothing
    val hot = MemoryStream[(Long, String)]
    val q2 = graft.streaming.DedupStream
      .lshIngestCandidates(spark,
        graft.streaming.DedupStream.bandedSignatures(hot.toDF().toDF("doc_id", "text")),
        maxBucketSize = 50)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("lsh_ingest_hot").start()
    try {
      hot.addData((0 until 60).map(i => (i.toLong, "aaa bbb ccc ddd eee fff ggg hhh")): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.table("lsh_ingest_hot").count() === 0)
  }

  test("sessions() splits on in-batch gaps and closes the tail via watermark timeout") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long)]
    val events = input.toDF().toDF("user_id", "ts", "event_id")
    val q = EventStream.sessions(spark, events, gapMinutes = 30, watermark = "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess2").start()
    try {
      // one batch, user 1: two events 10 min apart, then a 50-min gap
      // -> the first session must close IN BATCH (gap split)
      input.addData((1L, ts("2024-01-01 10:00:00"), 100L),
        (1L, ts("2024-01-01 10:10:00"), 101L),
        (1L, ts("2024-01-01 11:00:00"), 102L))
      q.processAllAvailable()
      // watermark mover + timeout-firing batch close the tail session
      input.addData((99L, ts("2024-01-01 14:00:00"), 900L))
      q.processAllAvailable()
      input.addData((99L, ts("2024-01-01 14:01:00"), 901L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sess2").filter(col("user_id") === 1L)
      .orderBy("start_us").collect()
      .map(r => (r.getLong(3), r.getLong(4))) // (n_events, id_sum)
    assert(rows.toSeq === Seq((2L, 201L), (1L, 102L)))
  }

  test("sessionize closes a session on event-time gap, driven by the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val q = EventStream.sessionize(spark, events, gapMinutes = 30, watermark = "10 minutes")
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("sess").start()
    try {
      // batch 1: user 1's session accumulates two events
      input.addData((1L, ts("2024-01-01 10:00:00"), 5.0), (1L, ts("2024-01-01 10:10:00"), 7.0))
      q.processAllAvailable()
      // batch 2: a much later event advances the watermark past
      // 10:10 + 30min gap; batch 3 lets the timeout fire
      input.addData((2L, ts("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-01 12:01:00"), 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val closed = spark.table("sess")
      .filter(col("closed") && col("user_id") === 1L).collect()
    assert(closed.length === 1)
    assert(closed.head.getLong(1) === 2L)          // n_events
    assert(closed.head.getDouble(2) === 12.0)      // total_value
    // user 2's session is still open — never emitted as closed
    assert(spark.table("sess").filter(col("closed") && col("user_id") === 2L).count() === 0)
  }

  test("AvailableNow incremental runs consume new files exactly once across restarts") {
    val batch = graft.queries.Relational.events(spark, Sf)
    val Array(a, b) = batch.randomSplit(Array(0.6, 0.4), seed = 42)
    val src = Files.createTempDirectory("graft-incr-src").toString
    val out = Files.createTempDirectory("graft-incr-out").toString
    val ckpt = Files.createTempDirectory("graft-incr-ckpt").toString
    def stream() = spark.readStream.schema(EventStream.EventSchema)
      .option("maxFilesPerTrigger", "2").parquet(src)

    // run 1: only batch A exists
    a.coalesce(2).write.mode("append").parquet(src)
    EventStream.runIncremental(stream().select("event_id", "user_id", "value"), out, ckpt)
    assert(spark.read.parquet(out).count() === a.count())
    // run 2: batch B lands; same checkpoint → only B is processed
    b.coalesce(2).write.mode("append").parquet(src)
    EventStream.runIncremental(stream().select("event_id", "user_id", "value"), out, ckpt)
    val afterB = spark.read.parquet(out)
    assert(afterB.count() === batch.count())
    assert(afterB.select("event_id").distinct().count() === batch.count(), "exactly-once violated")
    // run 3: nothing new → nothing written
    EventStream.runIncremental(stream().select("event_id", "user_id", "value"), out, ckpt)
    assert(spark.read.parquet(out).count() === batch.count())
  }

  test("stream-stream interval join over a multi-batch replay equals the batch join") {
    val batch = graft.queries.Relational.events(spark, Sf)
    // ts-range-ordered 3-file spool so the join state spans batches
    val spool = Files.createTempDirectory("graft-join-src")
    batch.repartitionByRange(3, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(spool.toString)
    val t0 = System.currentTimeMillis() - 3600_000L
    spool.toFile.listFiles.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .zipWithIndex.foreach { case (f, i) => f.setLastModified(t0 + i * 10_000L) }
    def side() = spark.readStream.schema(EventStream.EventSchema)
      .option("maxFilesPerTrigger", "1").parquet(spool.toString)
    val q = EventStream.purchaseClickJoin(side(), side(), "2 hours")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("pcjoin").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("pcjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val p = batch.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = batch.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id"), col("ts").as("c_ts"))
    val want = p.join(c, "user_id")
      .where(expr("c_ts BETWEEN p_ts - INTERVAL 2 HOURS AND p_ts"))
      .select(col("p_id"), col("c_id"), col("user_id"),
        (expr("unix_micros(p_ts)") - expr("unix_micros(c_ts)")).as("lead_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("stream-static join is stateless: only the aggregation holds state") {
    val src = Files.createTempDirectory("graft-stream-ss")
    val batch = graft.queries.Relational.events(spark, Sf)
    batch.coalesce(2).write.mode("overwrite").parquet(src.toString)
    val dim = spark.read.parquet(s"$Sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val stream = EventStream.readParquetStream(spark, src.toString)
    val q = stream
      .join(broadcast(dim), stream("user_id") === dim("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("ss_join").start()
    q.processAllAvailable()
    val stateOps = q.lastProgress.stateOperators
    q.stop()
    // ONE state operator (Complete-mode aggregate); the join added none
    assert(stateOps.length === 1, stateOps.map(_.operatorName).mkString(","))
    assert(stateOps.head.operatorName === "stateStoreSave", stateOps.head.operatorName)
    // and the result equals the batch join
    val streamed = spark.table("ss_join").orderBy("c_mktsegment").collect()
    val expected = batch.join(dim, batch("user_id") === dim("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n")).orderBy("c_mktsegment").collect()
    assert(streamed.sameElements(expected))
  }

  test("FunnelStream carries each user's stage across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val events = input.toDF().toDF("user_id", "ts", "event_type")
    val q = graft.streaming.FunnelStream
      .userStageUpdates(spark, events, Seq("view", "click", "purchase"))
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("funnel_stream").start()
    try {
      // batch 1: u1 views; u2 clicks (before any view — must not count)
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "view"),
        (2L, ts("2024-01-01 10:00:01"), "click"))
      q.processAllAvailable()
      // batch 2: u1 clicks then purchases (state resumes at stage 1);
      // u2 views (only now enters the funnel)
      input.addData(
        (1L, ts("2024-01-01 11:00:00"), "click"),
        (1L, ts("2024-01-01 11:30:00"), "purchase"),
        (2L, ts("2024-01-01 11:00:00"), "view"))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("funnel_stream").groupBy("user_id")
      .agg(max("stage").as("stage")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(last === Map(1L -> 3, 2L -> 1))
  }

  test("countAnomaly: exact running stats per key, burst and drought flags fire on the right batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val events = input.toDF().toDF("event_type")
    val q = EventStream.countAnomaly(spark, events)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("anom_stream").start()
    try {
      input.addData(Seq.fill(4)("a"): _*); q.processAllAvailable()
      input.addData(Seq.fill(4)("a") :+ "b": _*); q.processAllAvailable()
      // a bursts (20 vs mean 4), b stays quiet
      input.addData(Seq.fill(20)("a") :+ "b": _*); q.processAllAvailable()
      // a droughts (1 vs mean 28/3)
      input.addData("a"); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("anom_stream").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    // key a: seq 0 unflagged by definition, seq 2 bursts, seq 3 droughts
    assert(rows(("a", 0L)) === ((4L, 0L, false, false)))
    assert(rows(("a", 1L)) === ((4L, 4L, false, false)))
    assert(rows(("a", 2L)) === ((20L, 8L, true, false)))  // 20·2 > 2·8
    assert(rows(("a", 3L)) === ((1L, 28L, false, true)))  // 2·1·3 < 28
    // key b indexes its own APPEARANCES: batches 1 and 2 → seq 0 and 1
    assert(rows(("b", 0L)) === ((1L, 0L, false, false)))
    assert(rows(("b", 1L)) === ((1L, 1L, false, false)))
    assert(rows.size === 6)
  }

  test("streaming ewma equals the batch SQL digit-for-digit across batch boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val all = (1 to 12).map(i =>
      (i.toLong, 1L + (i % 2), ts(f"2024-01-01 10:${i}%02d:00"), 10.0 + i * 3.7))
    val input = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val events = input.toDF().toDF("event_id", "user_id", "ts", "value")
    val q = EventStream.ewma(spark, events)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ewma_stream").start()
    try {
      // split mid-history so lag state must carry across the boundary
      input.addData(all.take(7): _*); q.processAllAvailable()
      input.addData(all.drop(7): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ewma_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    all.toDF("event_id", "user_id", "ts", "value").createOrReplaceTempView("ewma_batch_tbl")
    val batch = spark.sql(graft.operators.Timeseries.ewmaSql("ewma_batch_tbl")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(streamed === batch)
    assert(streamed.size === 12)
  }

  test("throttle: first-n admission per (key, window), counter carries across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStream.throttle(spark, events, "event_type", n = 3, windowMin = 60)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("throttle_stream").start()
    try {
      // batch 1: 4 'a' events in one hour window — only first 3 admit
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "a"),
        (2L, ts("2024-01-01 10:05:00"), "a"),
        (3L, ts("2024-01-01 10:10:00"), "a"),
        (4L, ts("2024-01-01 10:15:00"), "a"))
      q.processAllAvailable()
      // batch 2: same window — counter is FULL, nothing admits;
      // the next window starts fresh
      input.addData(
        (5L, ts("2024-01-01 10:20:00"), "a"),
        (6L, ts("2024-01-01 11:30:00"), "a"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("throttle_stream").collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(got === Set((1L, 1L), (2L, 2L), (3L, 3L), (6L, 1L)))
  }

  test("throttle's eviction slack tracks the watermark: duration parser units") {
    // the state timeout must trail the ACTUAL watermark — a counter
    // evicted earlier would re-admit still-admissible late events
    assert(EventStream.parseDurationMs("1 hour") === 3600000L)
    assert(EventStream.parseDurationMs("6 hours") === 21600000L)
    assert(EventStream.parseDurationMs("30 minutes") === 1800000L)
    assert(EventStream.parseDurationMs("90 seconds") === 90000L)
    assert(EventStream.parseDurationMs("500 milliseconds") === 500L)
    assert(EventStream.parseDurationMs("2 days") === 172800000L)
    assert(EventStream.parseDurationMs("1 week") === 604800000L)
    assert(EventStream.parseDurationMs(" 15 Minutes ") === 900000L)
    // COMPOUND forms withWatermark accepts must parse too — a narrower
    // grammar would silently under-hold state for a valid watermark
    assert(EventStream.parseDurationMs("1 hour 30 minutes") === 5400000L)
    assert(EventStream.parseDurationMs("2 days 1 hour 1 second") === 176401000L)
    intercept[IllegalArgumentException](EventStream.parseDurationMs("soon"))
    intercept[IllegalArgumentException](EventStream.parseDurationMs("1 hour and a bit"))
  }

  test("incremental screen is stateless and batch-boundary-invariant, equals the batch operator") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    import graft.pipeline.Dedup
    import graft.streaming.DedupStream
    val body = (1 to 30).map(i => s"tok$i").mkString(" ")
    val base = Seq(
      (2L, body), (4L, body),
      (6L, (100 to 130).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val shB = graft.engine.Scratch.checkpoint(
      Dedup.shingleHashSets(base.select(col("doc_id"), split(col("text"), " ").as("w"))),
      "spec-incr-sh")
    val bandsB = graft.engine.Scratch.checkpoint(Dedup.cappedBandTable(shB), "spec-incr-bands")
    val freshRows = Seq(
      (11L, body + " extra"), (13L, body),
      (15L, (200 to 230).map(i => s"novel$i").mkString(" ")), (17L, "too short"))

    def run(batches: Seq[Seq[(Long, String)]]): (Set[(Long, Long, Double)], Int) = {
      val input = MemoryStream[(Long, String)]
      val q = DedupStream.incrementalMatches(
          input.toDF().toDF("doc_id", "text"), shB, bandsB)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("incr_screen").start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        val nState = q.lastProgress.stateOperators.length
        val got = spark.table("incr_screen").distinct().collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        (got, nState)
      } finally q.stop()
    }
    // all-in-one-batch vs one-doc-per-batch: identical output (no state
    // to carry means boundaries cannot matter), and ZERO state operators
    val (oneShot, st1) = run(Seq(freshRows))
    val (drip, st2) = run(freshRows.map(Seq(_)))
    assert(st1 === 0 && st2 === 0)
    assert(oneShot === drip)
    // and the assembled verdict equals the batch operator end-to-end
    val streamedVerdict = Dedup.incrementalVerdict(
        oneShot.toSeq.toDF("fid", "bid", "jac"),
        freshRows.map(_._1).toDF("doc_id"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val batchVerdict = Dedup.incrementalNearDedup(base, freshRows.toDF("doc_id", "text"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamedVerdict === batchVerdict)
  }
}
