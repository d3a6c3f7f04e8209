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
