package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Pipeline2Spec extends SparkSpec {
  import spark.implicits._

  test("cohort retention: first-day cohorts, distinct active days, correct offsets") {
    val ev = Seq(
      // u1: first Jan 1, active Jan 1 (twice) and Jan 3
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"), (1L, "2024-01-03 09:00:00"),
      // u2: first Jan 1, active Jan 1 only
      (2L, "2024-01-01 23:59:59"),
      // u3: first Jan 2, active Jan 2 and Jan 3
      (3L, "2024-01-02 00:00:01"), (3L, "2024-01-03 12:00:00"))
      .toDF("user_id", "tss")
      .withColumn("ts", to_timestamp(col("tss")))
    val got = Pipeline2.cohortRetentionOn(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("2024-01-01", 0L) -> 2L, // u1, u2 on their first day
      ("2024-01-01", 2L) -> 1L, // u1 back two days later
      ("2024-01-02", 0L) -> 1L, // u3 cohort
      ("2024-01-02", 1L) -> 1L)) // u3 back next day
  }

  test("paragraph dedup: keep-first by (doc_id, seg_idx), exact copies vanish") {
    import graft.pipeline.Dedup
    // 3-word segments for a readable fixture
    val segA = "a b c"; val segB = "d e f"; val segC = "x y z"
    val docs = Seq(
      (1L, s"$segA $segB"),  // first occurrence of A and B
      (2L, s"$segA $segC"),  // A is a repeat → dropped; C kept
      (3L, s"$segA $segB"))  // exact copy of doc 1 → nothing kept
      .toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, segWords = 3).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) === ((2L, 2L, h(s"$segA $segB"))))
    assert(got(2L) === ((2L, 1L, h(segC))))
    assert(got(3L) === ((2L, 0L, h(""))))
  }

  test("paragraph dedup: winner election is a partial aggregate, not a window sort") {
    import graft.pipeline.Dedup
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = Dedup.paragraphDedup(docs, 3).queryExecution.executedPlan.toString
    // the hot-key-proof design: a repeated segment must combine map-side
    // (HashAggregate partials), never sort inside a per-key window
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"), plan)
  }

  test("streaming mix drift equals the batch audit row-for-row") {
    import graft.pipeline.Corpus
    // the replay splits docs into 4 micro-batches, so equality with
    // the batch TVD proves the Complete-mode count state carries
    // across batches (no single batch sees the full corpus)
    val streamed = Pipeline2.streamMixDrift(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val batch = Corpus.mixDrift(spark.read.parquet(s"$Sf/documents.parquet"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // TVD is a proper distance: within [0, 1]
    streamed.values.foreach { case (_, tvd) => assert(tvd >= 0.0 && tvd <= 1.0) }
  }
}
