package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Baskets, Quantiles, Timeseries}
import graft.queries.Tables.{docs, t}

/** Event-sequence / distribution analytics batch: Markov transitions,
  * time-weighted averages, exponential smoothing, activity streaks,
  * robust dispersion statistics, and market-basket association mining
  * — each a named operator in `graft.operators` with a full DuckDB
  * oracle here. The reference reaches this class only through
  * hand-written SQL window clauses (DataFusion's generic window/agg
  * surface); graft ships them as audited recipes with the 100 TB
  * shuffle story in their scaladoc.
  */
object Analytics {

  /** First-order event-type transition matrix
    * ([[Timeseries.transitionMatrix]]): counts + exact integer-ppb
    * transition probabilities over user-ordered adjacent pairs.
    */
  def eventTransitions(s: SparkSession, dir: String): DataFrame =
    Timeseries.transitionMatrix(Relational.events(s, dir))
      .orderBy("prev_type", "next_type")

  /** Zero-order-hold time-weighted average of `value` per user
    * ([[Timeseries.timeWeightedAvg]]): decimal-routed weighted sum
    * over lead-interval weights — the telemetry TWAP.
    */
  def timeWeightedAvg(s: SparkSession, dir: String): DataFrame =
    Timeseries.timeWeightedAvg(Relational.events(s, dir))
      .orderBy("user_id")

  /** Truncated exact-decimal EWMA over each user's value sequence
    * ([[Timeseries.ewmaSql]]): the SAME generated SQL text runs on
    * Spark and DuckDB — the shared-fragment device, because a
    * 16-term decimal expression re-derived twice would drift.
    */
  def windowEwma(s: SparkSession, dir: String): DataFrame = {
    Relational.events(s, dir).createOrReplaceTempView("events")
    s.sql(Timeseries.ewmaSql("events"))
  }

  /** Maximal consecutive-active-day streaks per user
    * ([[Timeseries.activeStreaks]]): the rank-difference
    * gaps-and-islands device — one distinct, one window, one
    * aggregate.
    */
  def gapsIslands(s: SparkSession, dir: String): DataFrame =
    Timeseries.activeStreaks(Relational.events(s, dir))
      .orderBy("user_id", "start_day")

  /** Per-language robust dispersion report over document lengths
    * ([[Quantiles.robustStats]]): exact-disc quartiles, IQR, MAD and
    * Tukey-fence outlier counts — all through the bounded-memory
    * sketch-bracket quantile machinery, never a buffer-the-group
    * percentile.
    */
  def robustStats(s: SparkSession, dir: String): DataFrame =
    Quantiles.robustStats(docs(s, dir), Seq("lang"), "n_chars")
      .orderBy("lang")

  /** Brand co-occurrence across order baskets
    * ([[Baskets.pairMetrics]]): support, confidence and lift in
    * exact integer ppb — the association-rule pair pass, basket-id
    * keyed so pair volume is Σ|basket|², never corpus².
    */
  def basketPairs(s: SparkSession, dir: String): DataFrame =
    Baskets.pairMetrics(
        t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey")),
        "l_orderkey", "p_brand")
      .orderBy("item_a", "item_b")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_transitions" -> (eventTransitions _),
    "q_time_weighted_avg" -> (timeWeightedAvg _),
    "q_window_ewma" -> (windowEwma _),
    "q_gaps_islands" -> (gapsIslands _),
    "q_robust_stats" -> (robustStats _),
    "q_basket_pairs" -> (basketPairs _))

  val oracle: Map[String, String] = Map(
    "q_event_transitions" -> """
      WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events),
      c AS (SELECT prev_type, event_type AS next_type, count(*) AS n_trans
            FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      SELECT prev_type, next_type, n_trans,
             CAST(sum(n_trans) OVER (PARTITION BY prev_type) AS BIGINT) AS prev_total,
             (n_trans * 1000000000) // CAST(sum(n_trans) OVER (PARTITION BY prev_type) AS BIGINT) AS p_ppb
      FROM c ORDER BY prev_type, next_type""",

    "q_time_weighted_avg" -> """
      WITH d AS (
        SELECT user_id, value,
               lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 - epoch_us(ts) AS dt_us
        FROM events)
      SELECT user_id,
             count(*) AS n_intervals,
             CAST(sum(dt_us) AS BIGINT) AS total_us,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6)) * dt_us) AS DOUBLE)
                        / NULLIF(CAST(sum(dt_us) AS BIGINT), 0), 4) AS DOUBLE) AS tw_avg
      FROM d WHERE dt_us IS NOT NULL
      GROUP BY user_id ORDER BY user_id""",

    // the ewma oracle IS the Spark SQL — one generated text, two engines
    "q_window_ewma" -> Timeseries.ewmaSql("events"),

    "q_gaps_islands" -> """
      WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      r AS (SELECT user_id, d,
                   CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS rn
            FROM days)
      SELECT user_id, min(d) AS start_day, max(d) AS end_day, count(*) AS len_days
      FROM r GROUP BY user_id, d - rn
      ORDER BY user_id, start_day""",

    "q_robust_stats" -> """
      WITH s AS (
        SELECT lang, count(*) AS n_rows,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY CAST(n_chars AS DOUBLE)) AS p25,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY CAST(n_chars AS DOUBLE)) AS median,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY CAST(n_chars AS DOUBLE)) AS p75
        FROM documents GROUP BY lang),
      m AS (
        SELECT d.lang,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(CAST(d.n_chars AS DOUBLE) - s.median)) AS mad
        FROM documents d JOIN s ON d.lang = s.lang GROUP BY d.lang),
      o AS (
        SELECT d.lang,
               CAST(count(*) FILTER (WHERE CAST(d.n_chars AS DOUBLE) * 2 < s.p25 * 2 - (s.p75 - s.p25) * 3
                                        OR CAST(d.n_chars AS DOUBLE) * 2 > s.p75 * 2 + (s.p75 - s.p25) * 3) AS BIGINT) AS n_outliers
        FROM documents d JOIN s ON d.lang = s.lang GROUP BY d.lang)
      SELECT s.lang, s.n_rows, s.p25, s.median, s.p75,
             s.p75 - s.p25 AS iqr, m.mad, o.n_outliers
      FROM s JOIN m ON s.lang = m.lang JOIN o ON s.lang = o.lang
      ORDER BY s.lang""",

    "q_basket_pairs" -> """
      WITH sets AS (SELECT DISTINCT l_orderkey AS bid, p_brand AS item
                    FROM lineitem JOIN part ON l_partkey = p_partkey),
      pairs AS (SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
                FROM sets a JOIN sets b ON a.bid = b.bid AND a.item < b.item
                GROUP BY 1, 2),
      cnt AS (SELECT item, count(*) AS n FROM sets GROUP BY 1),
      tot AS (SELECT count(DISTINCT bid) AS n_baskets FROM sets)
      SELECT item_a, item_b, ca.n AS n_a, cb.n AS n_b, n_ab, n_baskets,
             (n_ab * 1000000000) // ca.n AS conf_ab_ppb,
             (((n_ab * 1000000000) // ca.n) * n_baskets) // cb.n AS lift_ppb
      FROM pairs
      JOIN cnt ca ON pairs.item_a = ca.item
      JOIN cnt cb ON pairs.item_b = cb.item
      CROSS JOIN tot
      ORDER BY item_a, item_b""")
}
