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

  /** First-touch conversion attribution: every conversion event
    * (`convType`) is credited to the FIRST event type of its own
    * session — the marketing-attribution rollup (last-touch is the
    * as-of join, q_asof_join; this is its session-scoped
    * counterpart). Per first-touch channel: conversion count,
    * decimal-routed converted value, and the floored-ppb share of
    * all conversions.
    *
    * Scale: the session tagging reuses [[sessions]]' one-shuffle
    * shape, the first-touch lookup is a second window ON THE SAME
    * (user) partitioning with a running-first frame (no extra
    * exchange — session keys grow with the data), and the rollup's
    * cardinality is the event-type alphabet, so its share window
    * runs over a handful of combined partials.
    */
  def firstTouchAttribution(events: DataFrame, gapMin: Int,
      convType: String = "purchase"): DataFrame = {
    val gapUs = gapMin * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tus = unix_micros(col("ts"))
    val tagged = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .withColumn("brk",
        when(lag(tus, 1).over(w).isNull || tus - lag(tus, 1).over(w) > gapUs, 1)
          .otherwise(0))
      .withColumn("grp",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wS = Window.partitionBy(col("user_id"), col("grp"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("first_touch", first(col("event_type")).over(wS))
      .filter(col("event_type") === convType)
      .groupBy(col("first_touch"))
      .agg(count(lit(1)).as("n_conversions"),
        graft.queries.Num.dsum(col("value")).as("conv_value"))
      .withColumn("share_ppb",
        expr("(n_conversions * CAST(1000000000 AS BIGINT)) DIV " +
          "sum(n_conversions) OVER ()"))
  }
}
