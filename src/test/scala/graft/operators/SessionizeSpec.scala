package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, String, Double)*) =
    rows.toSeq.toDF("event_id", "user_id", "tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")

  test("firstTouchAttribution: purchases credit their session's first event type") {
    val events = ev(
      // u1 session 1: view → click → purchase(10)  ⇒ credited to view
      (1L, 1L, "2024-01-01 10:00:00", "view", 0.0),
      (2L, 1L, "2024-01-01 10:05:00", "click", 0.0),
      (3L, 1L, "2024-01-01 10:10:00", "purchase", 10.0),
      // u1 session 2 (gap > 30 min): click → purchase(5) ⇒ click
      (4L, 1L, "2024-01-01 12:00:00", "click", 0.0),
      (5L, 1L, "2024-01-01 12:01:00", "purchase", 5.0),
      // u2: purchase opens its own session ⇒ credited to purchase
      (6L, 2L, "2024-01-01 10:00:00", "purchase", 7.0),
      // u3: session with no purchase contributes nothing
      (7L, 3L, "2024-01-01 10:00:00", "view", 0.0))
    val got = Sessionize.firstTouchAttribution(events, 30).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(got("view") === ((1L, 10.0, 333333333L)))
    assert(got("click") === ((1L, 5.0, 333333333L)))
    assert(got("purchase") === ((1L, 7.0, 333333333L)))
    assert(got.size === 3)
  }

  test("firstTouchAttribution: two purchases in one session both credit the same touch") {
    val events = ev(
      (1L, 1L, "2024-01-01 10:00:00", "view", 0.0),
      (2L, 1L, "2024-01-01 10:05:00", "purchase", 1.0),
      (3L, 1L, "2024-01-01 10:10:00", "purchase", 2.0))
    val got = Sessionize.firstTouchAttribution(events, 30).collect()
    assert(got.length === 1)
    assert(got.head.getString(0) === "view")
    assert(got.head.getLong(1) === 2L)
    assert(got.head.getDouble(2) === 3.0)
    assert(got.head.getLong(3) === 1000000000L)
  }
}
