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
}
