package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics: Markov transition matrices, time-weighted
  * averages, consecutive-activity streaks, and exponentially-weighted
  * smoothing — the telemetry/feature-engineering layer a training-data
  * pipeline runs over its event logs (the reference reaches this class
  * only through raw SQL window functions; here each op is a named,
  * scale-audited recipe).
  *
  * Shared scale shape: every operator below is ONE hash shuffle on the
  * sequence key (`user_id`) for the window sort, followed by
  * aggregations whose output cardinality is bounded by the TYPE
  * alphabet (transitions), the key count (TWAP, streaks), or the input
  * itself (EWMA, a per-row projection after the lag window). Per-key
  * window partitions are user-history-sized — they grow with activity
  * per user, not with corpus size — so no stratum funnel appears at
  * 100 TB (the r11 lesson: `Window.partitionBy` is safe exactly when
  * the partition key's cardinality scales with the data).
  */
object Timeseries {

  /** The total event order within a user: ties on `ts` are broken by
    * `event_id`, so every window below is deterministic under any
    * partitioning.
    */
  private val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))

  /** First-order Markov transition matrix of `event_type`: for every
    * observed (prev → next) adjacent pair in a user's timeline, the
    * global count, the per-prev total, and the exact transition
    * probability in integer parts-per-billion (`(n·10⁹) DIV total` —
    * floored integer division on both engines, no float in the hash).
    *
    * Scale: the lag window shuffles once on user_id (narrow per-user
    * partitions); the transition aggregate's cardinality is
    * |alphabet|², so its shuffle is a handful of combined partials and
    * the per-prev total is a window over that tiny result, not the
    * data.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val seq = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
    val counts = seq
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
    counts
      .withColumn("prev_total", sum(col("n_trans")).over(Window.partitionBy("prev_type")))
      .withColumn("p_ppb",
        expr("(n_trans * CAST(1000000000 AS BIGINT)) DIV prev_total"))
  }

  /** Time-weighted average of `value` per user: each observation is
    * held until the next one (zero-order hold), so its weight is the
    * microseconds until the user's next event; the final observation
    * has no successor and carries no weight (the standard TWAP
    * convention for right-open intervals). Exactness: the weighted
    * sum routes through DECIMAL(18,6)·BIGINT (order-independent, the
    * [[graft.queries.Num]] device), one double conversion at the end,
    * round 4.
    *
    * Scale: the lead window and the groupBy share the user_id key —
    * one shuffle feeds both (the aggregate combines partials
    * map-side after the window's sort), and state per group is one
    * running decimal sum.
    */
  def timeWeightedAvg(events: DataFrame): DataFrame = {
    val dt = events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("dt_us", lead(unix_micros(col("ts")), 1).over(byUser) - unix_micros(col("ts")))
      .filter(col("dt_us").isNotNull)
    dt.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("dt_us")).as("total_us"),
        round(
          sum(col("value").cast("decimal(18,6)") * col("dt_us")).cast("double") /
            nullif(sum(col("dt_us")), lit(0L)),
          4).cast("double").as("tw_avg"))
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE active days per
    * user. The classic rank-difference device: within a user, a day's
    * island is identified by `day - row_number()` (constant exactly
    * while days are consecutive), so one distinct, one window, one
    * aggregate — no self-join, no iteration.
    *
    * Scale: distinct (user, day) shuffles on its own key and caps the
    * window input at one row per user-day; the island aggregate
    * reuses the user partitioning. Output is one row per island.
    */
  def activeStreaks(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    days
      .withColumn("grp", date_sub(col("d"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(
        min(col("d")).as("start_day"),
        max(col("d")).as("end_day"),
        count(lit(1)).as("len_days"))
      .drop("grp")
  }

  /** Inter-arrival latency percentiles per event type: the gap (µs)
    * between a user's consecutive events OF THE SAME TYPE, summarized
    * as exact-disc p50/p95/p99 — the SLA/heartbeat report run beside
    * every event feed (mean inter-arrival hides the tail; the p99 IS
    * the alert threshold). The percentile pass is the bounded-memory
    * sketch-bracket ([[Quantiles.exactDisc]]), never a
    * buffer-the-group aggregate.
    *
    * Scale: one (user, type) window shuffle for the lead, then the
    * quantile machinery's three linear scans; group count = the type
    * alphabet, per-group memory O(bracket).
    */
  def interArrivalPercentiles(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("dt",
        (lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts"))).cast("double"))
      .filter(col("dt").isNotNull)
    val counts = gaps.groupBy("event_type").agg(count(lit(1)).as("n_gaps"))
    Quantiles.exactDisc(gaps, Seq("event_type"), "dt", Seq(0.5, 0.95, 0.99))
      .groupBy("event_type")
      .agg(
        max(when(col("q") === 0.5, col("value"))).as("p50_us"),
        max(when(col("q") === 0.95, col("value"))).as("p95_us"),
        max(when(col("q") === 0.99, col("value"))).as("p99_us"))
      .join(counts, "event_type")
      .select(col("event_type"), col("n_gaps"), col("p50_us"), col("p95_us"), col("p99_us"))
  }

  /** Lag-1 autocorrelation of daily event volume per type — the
    * seasonality/burstiness detector (r ≈ +1: smooth trends, r ≈ −1:
    * alternating spikes, r ≈ 0: memoryless): Pearson r between
    * consecutive observed days' counts, emitted as the EXACT
    * `sign_r` + `r2_ppb` pair — r² = cov²·10⁹ DIV (var_x·var_y) is
    * a rational of integer count sums, so the whole statistic is
    * DECIMAL-routed integer arithmetic and no sqrt/float ever
    * evaluates (the q_embedding_drift square device).
    *
    * Scale: the daily rollup is a partial-combining aggregate; the
    * lag window partitions by type with CALENDAR-bounded width (days
    * per type grows with time, not corpus size — the gap-fill span
    * argument); the moment sums route through DECIMAL(38,0) so
    * 10¹⁰-events-per-day feeds don't overflow the cross products.
    */
  def lag1Autocorr(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("event_type").orderBy("d")
    val pairs = daily
      .withColumn("y", lead(col("x"), 1).over(w))
      .filter(col("y").isNotNull)
    pairs.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("cov",
        expr("CAST(n_pairs AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("vx",
        expr("CAST(n_pairs AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("vy",
        expr("CAST(n_pairs AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .select(col("event_type"), col("n_pairs"),
        expr("CAST(CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END AS INT)").as("sign_r"),
        expr("CAST((cov * cov * 1000000000) DIV nullif(vx * vy, 0) AS BIGINT)").as("r2_ppb"))
  }

  /** Calendar densification + gap fill over a per-(key, day) series:
    * every key's [min(d), max(d)] span is materialized day-by-day
    * (`sequence` + explode — the generate_series densify), missing
    * days are filled by LOCF (`v_locf`, last observation carried
    * forward) and by linear interpolation between the bracketing
    * observations (`v_interp`; boundary days are observations by
    * construction of the span, so the one-sided branches are
    * totality guards, not reachable fills). Input contract: `daily`
    * has one row per (user_id, d) with a deterministic (decimal-
    * routed) observation `v_obs`.
    *
    * Scale: the explode factor is the calendar span — bounded by
    * TIME, not data; both fill windows sit on the user_id exchange
    * the join already created, and per-key window width is span
    * days. Keys grow with the corpus ⇒ no stratum funnel.
    *
    * Interpolation exactness: `prev + (next−prev)·num/den` is a
    * RATIONAL of round-4 inputs, and rationals land exactly on
    * .xxxx5 rounding ties — where double `round(_, 4)` is
    * engine-dependent (measured: 3 of ~9k sf0.01 rows flipped the
    * 4th decimal between Spark and DuckDB). So the HALF_UP rounding
    * is computed in INTEGER arithmetic instead: inputs scaled to
    * exact 1e4 units, and `round_half_up(r/den)` evaluated as
    * `(2r + den) DIV (2·den)` with only POSITIVE floor-divisions
    * (negative r routed through an explicit sign flip, because
    * Spark's DIV truncates toward zero while DuckDB's `//` floors —
    * they agree only on non-negative operands).
    */
  def gapFillDaily(daily: DataFrame): DataFrame = {
    val span = daily.groupBy("user_id").agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val cal = span.select(col("user_id"),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
    val w = Window.partitionBy("user_id").orderBy("d")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = w.rowsBetween(0, Window.unboundedFollowing)
    cal.join(daily, Seq("user_id", "d"), "left")
      .withColumn("prev_v", last(col("v_obs"), ignoreNulls = true).over(wPrev))
      .withColumn("prev_d", last(when(col("v_obs").isNotNull, col("d")), ignoreNulls = true).over(wPrev))
      .withColumn("next_v", first(col("v_obs"), ignoreNulls = true).over(wNext))
      .withColumn("next_d", first(when(col("v_obs").isNotNull, col("d")), ignoreNulls = true).over(wNext))
      .withColumn("pE4", expr("CAST(round(prev_v * 10000) AS BIGINT)"))
      .withColumn("nE4", expr("CAST(round(next_v * 10000) AS BIGINT)"))
      .withColumn("inum", datediff(col("d"), col("prev_d")).cast("long"))
      .withColumn("iden", datediff(col("next_d"), col("prev_d")).cast("long"))
      .withColumn("ir", expr("pE4 * iden + (nE4 - pE4) * inum"))
      .select(col("user_id"), col("d"),
        col("v_obs").isNotNull.as("observed"),
        col("prev_v").as("v_locf"),
        when(col("v_obs").isNotNull, col("v_obs"))
          .when(col("prev_v").isNull, col("next_v"))
          .when(col("next_v").isNull, col("prev_v"))
          .otherwise(
            expr("CAST(CASE WHEN ir >= 0 THEN (2 * ir + iden) DIV (2 * iden) " +
              "ELSE -((2 * (-ir) + iden) DIV (2 * iden)) END AS DOUBLE) / 10000.0"))
          .as("v_interp"))
  }

  /** Truncated-EWMA SQL, one identical text for Spark and the DuckDB
    * oracle (the shared-fragment device — a 2·k-term expression
    * re-derived twice WOULD drift). The infinite-history recurrence
    * `y_i = α·x_i + (1-α)·y_{i-1}` is cut at `terms` lags:
    * w_k = α(1-α)^k is an EXACT finite decimal (α = 0.3 ⇒ every power
    * of 0.7 terminates), each product routes DECIMAL(18,6)·weight →
    * DECIMAL(38,24), and the present-weight renormalization
    * Σw_k·x_{i-k} / Σw_k over non-null lags makes the warm-up rows
    * exact too. Truncation bias is bounded by (1-α)^terms (0.7⁸ ≈
    * 5.8%, re-absorbed by the renormalization); one double conversion
    * at the end, round 4 — bit-identical on both engines because the
    * whole tree is exact decimal until that last cast.
    *
    * Scale: k-1 lags over one user_id window shuffle, then a per-row
    * projection — EWMA is embarrassingly parallel after the sort, and
    * the lag frame is O(terms) state per row, independent of history
    * length (the recurrence form would serialize; the truncated form
    * is the distributed-correct one).
    */
  def ewmaSql(table: String, alpha: BigDecimal = BigDecimal("0.3"), terms: Int = 8): String = {
    require(terms >= 1 && terms <= 16, s"terms must be 1..16, got $terms")
    val weights = (0 until terms).map(k => alpha * (BigDecimal(1) - alpha).pow(k))
    val lagCols = (1 until terms).map(k =>
      s"lag(value, $k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l$k")
    def colK(k: Int) = if (k == 0) "value" else s"l$k"
    // weight scale 18 keeps w_k exact through terms = 16 (k ≤ 15 ⇒ 16
    // fractional digits); DECIMAL(18,6)·DECIMAL(19,18) is precision
    // 18+19+1 = 38 in Spark's rule — exactly at the cap, so NEITHER
    // engine rounds the product (one more weight digit would push
    // Spark into allowPrecisionLoss scale-trimming and off the oracle)
    def wLit(k: Int) = s"CAST(${weights(k).underlying.toPlainString} AS DECIMAL(19,18))"
    val num = (0 until terms).map(k =>
      s"CASE WHEN ${colK(k)} IS NOT NULL THEN CAST(CAST(${colK(k)} AS DECIMAL(18,6)) * ${wLit(k)} AS DECIMAL(38,24)) ELSE CAST(0 AS DECIMAL(38,24)) END")
      .mkString("(", " + ", ")")
    val den = (0 until terms).map(k =>
      s"CASE WHEN ${colK(k)} IS NOT NULL THEN CAST(${wLit(k)} AS DECIMAL(38,24)) ELSE CAST(0 AS DECIMAL(38,24)) END")
      .mkString("(", " + ", ")")
    s"""WITH lags AS (
       |  SELECT user_id, event_id, ts, value${if (lagCols.nonEmpty) ",\n         " else ""}${lagCols.mkString(",\n         ")}
       |  FROM $table WHERE value IS NOT NULL)
       |SELECT user_id, event_id, value,
       |       CAST(ROUND(CAST($num AS DOUBLE) / CAST($den AS DOUBLE), 4) AS DOUBLE) AS ewma
       |FROM lags ORDER BY user_id, event_id""".stripMargin
  }
}
