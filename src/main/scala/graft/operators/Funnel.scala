package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel analysis over an event stream: how many
  * users complete step 1, then step 2 *at or after* their first
  * step-1 event, then step 3 at or after that — the classic
  * conversion funnel (view → click → purchase), which plain grouped
  * aggregation cannot express because each step's match depends on
  * WHEN the previous step matched.
  *
  * Execution shape: ONE shuffle. Events are filtered to the funnel's
  * step types where they sit, grouped per user, and the user's
  * (ts, step) sequence is folded left-to-right by a tiny state
  * machine (`aggregate` HOF): state = deepest stage reached, advanced
  * when the next event's step equals the state's expected step. The
  * greedy earliest-match fold is equivalent to the cascaded
  * "min(ts of step k ≥ first match of step k−1)" formulation a
  * relational oracle uses — same-timestamp events are ordered by
  * step priority, so a step-k event sharing its timestamp with the
  * step-(k−1) match still counts (the `>=` semantics).
  *
  * At 100 TB this is the shape you want: no self-joins over the
  * event table (the cascade formulation joins it once per step), no
  * window sorts — one keyed aggregation. The honest limit: the fold
  * needs each user's step events in ts order, so the batch form
  * collects them per user — bounded by that user's funnel-step
  * events, and a pathological bot user degrades to its own row's
  * array, not a cluster hotspot. No cap is applied HERE (a stage
  * fold is not partial-aggregatable without per-event granularity,
  * so any truncation changes semantics); for sources with unbounded
  * per-user histories the scale path is
  * [[graft.streaming.FunnelStream]], which holds ONE int of state
  * per user and never materializes a history.
  */
object Funnel {

  /** Per-user deepest funnel stage: (`user_id`, `stage`) where stage
    * ∈ [0, steps.size], 0 = never did step 1. `steps` are event_type
    * values in funnel order.
    */
  /** Step → 0-based priority/stage index as a column (−1 for
    * non-funnel types) — the ONE definition of step matching, shared
    * with [[graft.streaming.FunnelStream]] so batch and streaming can
    * never disagree on it.
    */
  def stepPriority(steps: Seq[String]): org.apache.spark.sql.Column = {
    require(steps.nonEmpty, "funnel needs at least one step")
    steps.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col("event_type") === s, i).otherwise(acc)
    }
  }

  def userStages(events: DataFrame, steps: Seq[String]): DataFrame = {
    val pri = stepPriority(steps)
    val advance = steps.indices
      .map(i => s"WHEN st = $i AND e.p = $i THEN ${i + 1}")
      .mkString("CASE ", " ", " ELSE st END")
    events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("ts"), pri.as("p"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("p")))).as("seq"))
      .select(col("user_id"),
        expr(s"aggregate(seq, 0, (st, e) -> $advance)").as("stage"))
  }

  /** Funnel report: one row per step — (stage, step, n_users) where
    * n_users counts users whose deepest stage reached at least it.
    */
  def report(events: DataFrame, steps: Seq[String]): DataFrame =
    reportFromStages(userStages(events, steps), steps)

  /** The report aggregation over an existing (`user_id`, `stage`)
    * frame — shared by the batch path above and the streaming path
    * ([[graft.streaming.FunnelStream]]), so both grade against the
    * same oracle SQL.
    */
  def reportFromStages(stages: DataFrame, steps: Seq[String]): DataFrame = {
    // coalesce: a funnel-free input leaves the global agg's sums NULL,
    // but the report's contract (and the relational oracle's count(*))
    // is zero users per step, not NULL
    val sums = steps.indices.map(i =>
      coalesce(sum(when(col("stage") >= i + 1, 1L).otherwise(0L)), lit(0L)).as(s"s${i + 1}"))
    // step names become SQL string literals: escape like bm25Scores
    // does, or a step containing a quote breaks (or injects into) the
    // stack() expression
    val stack = steps.zipWithIndex
      .map { case (s, i) => s"${i + 1}, '${s.replace("\\", "\\\\").replace("'", "\\'")}', s${i + 1}" }
      .mkString(s"stack(${steps.size}, ", ", ", ") as (stage, step, n_users)")
    stages.agg(sums.head, sums.tail: _*).selectExpr(stack)
  }
}
