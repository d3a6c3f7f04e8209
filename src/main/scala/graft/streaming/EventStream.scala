package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference engine has no
  * event-time streaming (SURVEY.md §2.10 — its only "stream" is an
  * incremental batch pull, `/root/reference/csvb_engine/src/lib.rs:87-89`),
  * so this module is a superset: the same `events` schema consumed as
  * an unbounded source with watermarking, windowed aggregation, and
  * stateful sessionization.
  *
  * Scale notes: windowed aggregation state is keyed by (window, key)
  * and dropped past the watermark — bounded state per executor;
  * sessionization uses flatMapGroupsWithState with event-time
  * timeouts, the standard shape for billions of keys (state store
  * partitioned by key, RocksDB-backed on a real cluster).
  */
object EventStream {

  /** The events table schema (TESTDATA.md) as seen by a streaming
    * source (ts already micros).
    */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded file-directory source of JSON events. */
  def readJsonStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(EventSchema)
      .option("maxFilesPerTrigger", "16")
      .json(dir)

  /** Unbounded file-directory source of parquet events (columnar —
    * the production-shaped feed; JSON above exercises schema-on-read).
    */
  def readParquetStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(EventSchema)
      .option("maxFilesPerTrigger", "16")
      .parquet(dir)

  /** Watermarked sliding-window aggregation — the streaming analog of
    * the batch `window(ts, ...)` bucketing (q_date_bucket_agg).
    */
  def windowedCounts(events: DataFrame, window_ : String = "15 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("total"))

  /** Windowed quantile monitoring — the data-drift shape: per event-time
    * bucket, count/min/max plus a MEDIAN from a quantile sketch that
    * lives in the streaming state store and absorbs each micro-batch
    * incrementally (an exact percentile would have to buffer every
    * window's values in state forever). The sketch is mergeable, so
    * arbitrary micro-batch boundaries fold into the same digest a
    * batch job would build.
    */
  def windowedQuantiles(events: DataFrame, window_ : String = "15 minutes",
      watermark: String = "1 hour", accuracy: Int = 2000): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_))
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"),
        percentile_approx(col("value"), lit(0.5), lit(accuracy)).as("med"))
      .select(col("window.start").as("bucket"), col("n"), col("vmin"), col("vmax"), col("med"))

  /** Per-user event-time sessionization with a gap timeout — custom
    * state via the KeyValueGroupedDataset API, EventTimeTimeout
    * driven by the stream's watermark (NOT wall-clock): a session for
    * a user closes when the *watermark* passes last-event-ts + gap,
    * so results are replay-deterministic and late data inside the
    * watermark still extends its session.
    */
  case class SessionUpdate(user_id: Long, n_events: Long, total_value: Double, closed: Boolean)
  case class Agg(n: Long, total: Double, lastTsMs: Long)

  def sessionize(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30, watermark: String = "1 hour"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val gapMs = gapMinutes * 60L * 1000L
    val updates = events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[Agg, SessionUpdate](GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)], state: GroupState[Agg]) =>
          if (state.hasTimedOut) {
            val s = state.getOption.getOrElse(Agg(0, 0.0, 0L))
            state.remove()
            SessionUpdate(user, s.n, s.total, closed = true)
          } else {
            val prev = state.getOption.getOrElse(Agg(0, 0.0, 0L))
            val batch = rows.toSeq
            val next = Agg(
              prev.n + batch.size,
              prev.total + batch.map(_._3).sum,
              math.max(prev.lastTsMs, batch.map(_._2.getTime).max))
            state.update(next)
            // close when the event-time watermark passes last-seen + gap
            state.setTimeoutTimestamp(next.lastTsMs + gapMs)
            SessionUpdate(user, next.n, next.total, closed = false)
          }
      }
      .toDF()
    updates
  }

  /** One closed session: `[start_us, end_us]` micros, event count,
    * and the exact sum of member event_ids (an order-independent
    * integer checksum the relational oracle can reproduce — a double
    * value sum would disagree in the low bits).
    */
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long, id_sum: Long)

  /** Open SCD2 version per key ([[scd2]] state). */
  case class Scd2Open(attr: Option[String], version: Long, fromUs: Long, lastUs: Long)

  /** Emitted SCD2 interval row ([[scd2]]): micros, converted to
    * timestamps by the caller so no precision is lost in state.
    */
  case class Scd2Out(user_id: Long, event_type: Option[String], version: Long,
    from_us: Long, to_us: Option[Long], is_current: Boolean)

  /** Streaming SCD-type-2 history build — the stateful-stream twin of
    * [[graft.operators.Temporal.scd2Intervals]], sharing its oracle
    * verbatim (the funnel/sessionize twin pattern): per key, track
    * the open attribute version in `flatMapGroupsWithState` state;
    * an attribute change emits the CLOSED interval immediately
    * (Append mode — history rows stream out as they finalize), and
    * the final open version emits as `is_current` when the
    * EventTimeTimeout fires. The timeout is set `holdDays` past each
    * key's last event — far beyond the feed's span — so versions
    * never close prematurely on an idle key; the replay's sentinel
    * ladder advances the watermark past every real key's hold point
    * to flush the current rows deterministically.
    *
    * Same exactness contract as [[sessions]]: batches must arrive in
    * non-decreasing event-time order (the declared query feeds
    * ts-range-ordered files); out-of-order within a batch is handled
    * by the (tus, event_id) sort; NULL attributes are real states
    * (Option equality), matching the batch operator's null-safe
    * change rule.
    */
  def scd2(spark: SparkSession, events: DataFrame,
      watermark: String = "1 hour", holdDays: Int = 45): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val holdMs = holdDays * 86400000L
    events
      .withWatermark("ts", watermark)
      // the watermarked ts column must ride along for EventTimeTimeout
      .select(col("user_id"), col("ts"), expr("unix_micros(ts)").as("tus"),
        col("event_type"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Scd2Open, Scd2Out](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, String, Long)],
            state: GroupState[Scd2Open]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Scd2Out(user, s.attr, s.version, s.fromUs, None, is_current = true))
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._3, r._5))
            val out = List.newBuilder[Scd2Out]
            var cur = state.getOption
            sorted.foreach { case (_, _, tus, attr, _) =>
              val a = Option(attr)
              cur match {
                case None =>
                  cur = Some(Scd2Open(a, 1L, tus, tus))
                case Some(c) if c.attr != a =>
                  out += Scd2Out(user, c.attr, c.version, c.fromUs, Some(tus), is_current = false)
                  cur = Some(Scd2Open(a, c.version + 1L, tus, tus))
                case Some(c) =>
                  cur = Some(c.copy(lastUs = math.max(c.lastUs, tus)))
              }
            }
            cur.foreach { c =>
              state.update(c)
              state.setTimeoutTimestamp(c.lastUs / 1000L + holdMs)
            }
            out.result().iterator
          }
      }
      .toDF()
  }

  case class OpenSess(startUs: Long, lastUs: Long, n: Long, idSum: Long)

  /** TRUE gap sessionization with one output row per session —
    * unlike [[sessionize]] (which demonstrates the update-stream
    * shape: one running session per user, progress rows per batch),
    * this splits on every event-time gap > `gapMinutes`, exactly the
    * relational definition `new session ⇔ ts − lag(ts) > gap` — so a
    * batch SQL oracle can verify the streaming operator row-for-row
    * (q_stream_sessionize).
    *
    * Within a batch, a user's rows are sorted by (event-time,
    * event_id) and walked; closed sessions emit immediately (Append
    * mode), the open tail is carried in state with an
    * EventTimeTimeout at last + gap, so the final session of every
    * user emits once the watermark passes it — deterministic on
    * replay, no wall clock anywhere. Exactness across batches
    * requires the source to deliver batches in non-decreasing
    * event-time order (the declared query feeds a ts-range-ordered
    * file sequence); out-of-order *within* a batch is handled by the
    * sort, and `setTimeoutTimestamp` stays legal because each new
    * row's time is at or past the previous batch's maximum.
    */
  def sessions(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30, watermark: String = "1 hour"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), expr("unix_micros(ts)").as("tus"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSess, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long)],
            state: GroupState[OpenSess]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.startUs, s.lastUs, s.n, s.idSum))
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._3, r._4))
            val out = List.newBuilder[SessionOut]
            var cur = state.getOption
            sorted.foreach { case (_, _, tus, eid) =>
              cur = cur match {
                case Some(s) if tus - s.lastUs > gapUs =>
                  out += SessionOut(user, s.startUs, s.lastUs, s.n, s.idSum)
                  Some(OpenSess(tus, tus, 1, eid))
                case Some(s) =>
                  Some(OpenSess(s.startUs, math.max(s.lastUs, tus), s.n + 1, s.idSum + eid))
                case None =>
                  Some(OpenSess(tus, tus, 1, eid))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes * 60L * 1000L)
            }
            out.result().iterator
          }
      }
      .toDF()
  }

  /** Stream-stream event-time interval join: each purchase matched to
    * the same user's clicks in the `lookback` window ending at the
    * purchase (attribution join — the canonical two-unbounded-sides
    * shape). Both sides carry watermarks and the join condition
    * constrains the two event times, which is what lets Spark bound
    * the buffered state: a click is retained only until the watermark
    * passes `c_ts + lookback`, a purchase until the watermark passes
    * `p_ts` — without the time bound the state would grow with the
    * stream. Inner matches emit as soon as both rows have arrived
    * (Append mode, no watermark wait on the output path).
    *
    * `lead_us` — how long before the purchase the click happened, in
    * micros — is exact integer arithmetic on the micro timestamps, so
    * a relational oracle reproduces it bit-for-bit.
    */
  /** Rows matching `heartbeat` pass the type filters purely to
    * ADVANCE THE WATERMARK (the punctuation-event pattern): a
    * watermark node only sees event times that flow through it, so a
    * pre-watermark filter silently caps the watermark at the last
    * *qualifying* row — outer-join state behind that cap never
    * evicts and its null rows never emit. Callers exclude heartbeat
    * keys from the result downstream.
    */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame,
      lookback: String = "2 hours", watermark: String = "1 hour",
      joinType: String = "inner", heartbeat: org.apache.spark.sql.Column = lit(false)): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase" || heartbeat)
      .select(col("event_id").as("p_id"), col("user_id").as("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val c = clicks.filter(col("event_type") === "click" || heartbeat)
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    p.join(c, expr(s"user_id = c_user AND c_ts BETWEEN p_ts - INTERVAL $lookback AND p_ts"),
        joinType)
      .select(col("p_id"), col("c_id"), col("user_id"),
        (expr("unix_micros(p_ts)") - expr("unix_micros(c_ts)")).as("lead_us"))
  }

  /** Running per-type stats for [[countAnomaly]]: batches seen so far
    * and their total event count — two longs per key, independent of
    * stream length.
    */
  case class AnomState(batches: Long, total: Long)

  /** One monitor row per (event_type, micro-batch appearance). */
  case class AnomOut(event_type: String, seq_idx: Long, n: Long, prev_total: Long,
    flag_high: Boolean, flag_low: Boolean)

  /** Streaming volume-anomaly monitor: per event type, compare each
    * micro-batch's event count against the key's running mean over
    * its PRIOR batches, flagging a burst (`n > 2·mean`) or a drought
    * (`n < mean/2`). The flag comparisons are cross-multiplied
    * integers (`n·batches ≷ 2·total`, `2·n·batches ≷ total`) so the
    * monitor's output is exact — hash-comparable against a batch SQL
    * replay that re-derives the same batch boundaries, never a float
    * mean. `seq_idx` counts the key's own batch APPEARANCES (a type
    * absent from a batch is not invoked and not indexed), which is
    * also what the relational replay computes.
    *
    * Scale: state is two longs per key forever (no growth with
    * stream length), emission is one row per (key, batch) — this is
    * the data-quality tripwire that runs beside every ingest
    * pipeline, and its cost is the groupBy shuffle the ingest
    * already pays.
    */
  def countAnomaly(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events
      .select(col("event_type"))
      .as[String]
      .groupByKey(identity)
      .flatMapGroupsWithState[AnomState, AnomOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[String], state: GroupState[AnomState]) =>
          var n = 0L
          rows.foreach(_ => n += 1)
          val s = state.getOption.getOrElse(AnomState(0L, 0L))
          val high = s.batches > 0 && n * s.batches > 2L * s.total
          val low = s.batches > 0 && 2L * n * s.batches < s.total
          state.update(AnomState(s.batches + 1L, s.total + n))
          Iterator(AnomOut(key, s.batches, n, s.total, high, low))
      }
      .toDF()
  }

  /** [[throttle]] state: events already admitted for one
    * (user, window) — a single counter, removed on event-time
    * timeout once the window can no longer receive events.
    */
  case class ThrottleState(admitted: Long)

  /** An admitted event ([[throttle]]): its key, window start (µs)
    * and 1-based admission index.
    */
  case class ThrottleOut(key: String, win_us: Long, event_id: Long, k_idx: Long)

  /** Streaming per-key rate limiting: admit only the FIRST `n`
    * events per (`keyCol`, event-time window), drop the rest — the
    * ingest guard that bounds hot keys before they reach a stateful
    * pipeline (the batch-side twin of the dedup family's hot-bucket
    * caps). Admission order is (ts, event_id) within a batch and
    * batch order across batches; under an event-time-ordered replay
    * (ts-range batch files) that equals the global (ts, event_id)
    * order, which is what the relational oracle computes.
    *
    * State is ONE counter per live (key, window), removed by
    * EventTimeTimeout once the watermark passes the window end —
    * state size tracks ACTIVE windows, not stream length.
    */
  def throttle(spark: SparkSession, events: DataFrame, keyCol: String = "event_type",
      n: Int = 3, windowMin: Int = 60, watermark: String = "1 hour"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val winUs = windowMin * 60L * 1000000L
    // eviction slack = the ACTUAL watermark duration: a counter
    // evicted before the watermark passes the window end would
    // re-admit up to n late events, so the slack must always trail
    // the caller's delay (a hard-coded 1h would under-hold for any
    // longer watermark)
    val slackMs = parseDurationMs(watermark)
    events
      .withWatermark("ts", watermark)
      .select(col(keyCol).cast("string"), col("ts"),
        expr("unix_micros(ts)").as("tus"), col("event_id"))
      .as[(String, java.sql.Timestamp, Long, Long)]
      .groupByKey(r => (r._1, r._3 / winUs * winUs))
      .flatMapGroupsWithState[ThrottleState, ThrottleOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (String, Long), rows: Iterator[(String, java.sql.Timestamp, Long, Long)],
            state: GroupState[ThrottleState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (k, winStart) = key
            val sorted = rows.toSeq.sortBy(r => (r._3, r._4))
            val already = state.getOption.map(_.admitted).getOrElse(0L)
            val admit = sorted.take(math.max(0, n - already.toInt))
            state.update(ThrottleState(already + admit.length))
            // window end + watermark: past this no event of this
            // window can still be admissible, so the counter can go
            state.setTimeoutTimestamp((winStart + winUs) / 1000L + slackMs)
            admit.iterator.zipWithIndex.map { case (r, i) =>
              ThrottleOut(k, winStart, r._4, already + i + 1)
            }
          }
      }
      .toDF()
  }

  /** [[ewma]] state: the last `terms − 1` observed values in arrival
    * order (newest last) — O(terms) doubles per key, independent of
    * stream length.
    */
  case class EwmaState(recent: List[Double])

  /** One smoothed observation ([[ewma]]). */
  case class EwmaOut(user_id: Long, event_id: Long, value: Double, ewma: Double)

  /** Streaming truncated EWMA — the stateful twin of the batch
    * [[graft.operators.Timeseries.ewmaSql]] form, SHARING its oracle
    * verbatim (the sessionize/funnel/scd2 twin pattern): per user,
    * carry the last `terms − 1` values and emit each event's
    * renormalized truncated EWMA as it arrives. Exactness is the
    * point — the state math replays the batch form's decimal recipe
    * digit-for-digit (values quantized HALF_UP to 6 decimals exactly
    * like `CAST(value AS DECIMAL(18,6))`, exact-decimal weight
    * products, one correctly-rounded double conversion, HALF_UP at
    * 4), so under an event-time-ordered replay the streamed rows
    * hash-match the batch SQL on both engines.
    *
    * Scale: state is `terms − 1` doubles per key — the recurrence
    * form needs ONE carried value but can't renormalize its warm-up;
    * the truncated window carries O(terms) and gives exactly the
    * batch semantics. No timeout: the state is a fixed-size ring, so
    * idle keys cost `terms` doubles, not growth.
    */
  def ewma(spark: SparkSession, events: DataFrame,
      alpha: BigDecimal = BigDecimal("0.3"), terms: Int = 8): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import java.math.{BigDecimal => JBD, RoundingMode}
    val weights = (0 until terms).map(k => (alpha * (BigDecimal(1) - alpha).pow(k)).underlying)
    events
      .filter(col("value").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)").as("tus"), col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long, Double)],
            state: GroupState[EwmaState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var recent = state.getOption.map(_.recent).getOrElse(Nil) // newest first
          val out = sorted.map { case (_, _, eid, v) =>
            val window = v :: recent // lag k = position k
            var num = JBD.ZERO
            var den = JBD.ZERO
            window.take(terms).zipWithIndex.foreach { case (x, k) =>
              val xq = JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP)
              num = num.add(xq.multiply(weights(k)))
              den = den.add(weights(k))
            }
            val e = JBD.valueOf(num.doubleValue() / den.doubleValue())
              .setScale(4, RoundingMode.HALF_UP).doubleValue()
            recent = (v :: recent).take(terms - 1)
            EwmaOut(user, eid, v, e)
          }
          state.update(EwmaState(recent))
          out.iterator
      }
      .toDF()
  }

  /** Streaming exact deduplication — the unbounded counterpart of
    * [[graft.pipeline.Dedup.dropExactDuplicates]] for an ingest
    * pipeline: keep the first occurrence of each key, with state
    * expired past the watermark (`dropDuplicatesWithinWatermark`) so
    * the dedup state stays bounded at any stream length — the only
    * honest way to dedup an infinite stream.
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String] = Seq("event_id"),
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Incremental batch run: process exactly the data that arrived
    * since the last run, then terminate — `Trigger.AvailableNow` +
    * a persistent checkpoint turn the streaming source into the
    * cron-driven incremental-ingest pattern (the common way a
    * training-data pipeline actually runs: a scheduled job that
    * picks up the new files, exactly once, and exits). The
    * checkpoint's file log is the source of truth for what was
    * consumed; re-running against an unchanged directory writes
    * nothing, and a crash between runs replays only unCommitted
    * batches — exactly-once into a file sink at any scale.
    */
  /** Parse a watermark-style duration string to milliseconds —
    * including COMPOUND forms `withWatermark` accepts ("1 hour 30
    * minutes"), singular or plural units. Throttle's state-eviction
    * slack derives from it so eviction always trails the caller's
    * watermark; a string this can't parse but Spark could would
    * silently under-hold state, so the whole input must be consumed
    * by duration terms or it's an error.
    */
  private[streaming] def parseDurationMs(s: String): Long = {
    val term = """(?i)(\d+)\s*(millisecond|second|minute|hour|day|week)s?""".r
    val terms = term.findAllMatchIn(s).toSeq
    val leftover = term.replaceAllIn(s, "").trim
    if (terms.isEmpty || leftover.nonEmpty)
      throw new IllegalArgumentException(s"unparseable duration '$s'")
    terms.map { m =>
      val per = m.group(2).toLowerCase match {
        case "millisecond" => 1L
        case "second"      => 1000L
        case "minute"      => 60000L
        case "hour"        => 3600000L
        case "day"         => 86400000L
        case "week"        => 604800000L
      }
      m.group(1).toLong * per
    }.sum
  }

  def runIncremental(df: DataFrame, outPath: String, checkpoint: String): Unit = {
    val q = df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet")
      .option("path", outPath)
      .start()
    q.awaitTermination()
  }

  /** Sink helper: append stream to parquet with checkpointing. */
  def toParquetSink(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .queryName("graft-events")
      .asInstanceOf[DataStreamWriter[org.apache.spark.sql.Row]]
      .option("path", path)
}
