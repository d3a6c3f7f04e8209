package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: a user's events split into
  * sessions wherever the gap to the previous event exceeds
  * `gapMin` — the relational definition (lag → break flag →
  * cumulative break-sum → keyed aggregate) that the streaming
  * sessionizer ([[graft.streaming.EventStream]]'s
  * flatMapGroupsWithState path) is graded against. Exposing it as a
  * first-class batch operator completes the events-analytics family
  * (funnel, cohort retention, sessions) and gives the two execution
  * forms ONE shared oracle.
  *
  * Scale shape: one shuffle (the per-user window partition), then a
  * keyed aggregate that reuses the same partitioning — no global
  * sort, no self-joins; per-user sort cost is n·log(n) in that
  * user's events only. Timestamps are compared in micros (the
  * nanos-truncated fixture contract).
  */
object Sessionize {

  def sessions(events: DataFrame, gapMin: Int): DataFrame = {
    val gapUs = gapMin * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tus = unix_micros(col("ts"))
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("brk",
        when(lag(tus, 1).over(w).isNull || tus - lag(tus, 1).over(w) > gapUs, 1)
          .otherwise(0))
      .withColumn("grp",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("grp"))
      .agg(
        min(tus).as("start_us"), max(tus).as("end_us"),
        count(lit(1)).as("n_events"), sum(col("event_id")).as("id_sum"))
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"), col("id_sum"))
  }
}
