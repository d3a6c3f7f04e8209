package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files

class EventStreamSpec extends SparkSpec {

  test("windowed streaming counts match the batch window aggregation") {
    // feed the sf0.001 events (as JSON) through the streaming path
    val src = Files.createTempDirectory("graft-stream-src")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$Sf/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
}
