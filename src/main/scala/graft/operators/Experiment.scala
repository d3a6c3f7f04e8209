package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experimentation analytics: the 2×2 A/B conversion report with an
  * EXACT significance decision. Conversion rates are floored integer
  * ppb; the χ² statistic `N·(ad−bc)² / (n0·n1·nc·nn)` is emitted as a
  * round-4 double computed by one fixed expression tree (identical
  * IEEE sequence on both engines), but the `significant_95` flag is
  * NOT derived from that rounded double — it is the exact integer
  * comparison `10⁶·N·(ad−bc)² > 3841459·D` evaluated in DECIMAL(38,0)
  * (DuckDB: HUGEINT), so the decision can never flip on a float tie.
  * 3.841459 ⪆ χ²₀.₀₅,₁ to 6 decimals.
  *
  * Exact-domain bound: the LHS grows as 10⁶·N·(ad−bc)² ≲ 6·10⁴·N⁵,
  * which exceeds DECIMAL(38,0) once N passes ~4·10⁶ total units
  * (~2·10⁶ per arm) — far below any interesting corpus. Rather than
  * silently nulling (Spark, ANSI off) or raising (DuckDB) there, the
  * flag's inputs are DECIMATED past `decimateOver` total rows: all
  * four cells are divided by the common factor k = 1+⌊(N−1)/cap⌋
  * with exact HALF_UP integer rounding (`(2a+k) DIV 2k`, the house
  * rounding device — never a float), and the comparison runs on the
  * decimated 2×2, whose products provably fit 38 digits. Pure
  * integer arithmetic, so both engines agree bit-for-bit at every
  * scale; statistically the decimated decision is the same test on a
  * 1/k systematic subsample — slightly conservative, never anti-
  * conservative at these counts. The DISPLAYED counts, ppb rates and
  * round-4 χ² always come from the full cells (BIGINT ppb holds to
  * ~9·10⁹ rows; χ² is a double).
  *
  * Scale: one partial-combining aggregate per user (conversion flag),
  * then a single global 4-cell aggregate — the second shuffle carries
  * one row per partition.
  */
object Experiment {

  /** `users`: one row per experimental unit with integer `variant`
    * (0/1) and integer `converted` (0/1). Returns the one-row report.
    * `decimateOver` caps the total count feeding the EXACT
    * significance comparison (see object doc); the 4·10⁶ default
    * keeps every product inside DECIMAL(38,0)/HUGEINT with margin.
    */
  def abReport(users: DataFrame, decimateOver: Long = 4000000L): DataFrame = {
    val cell = (v: Int, c: Int) =>
      sum(when(col("variant") === v && col("converted") === c, 1L).otherwise(0L))
    users
      .agg(cell(0, 1).as("a"), cell(0, 0).as("b"), cell(1, 1).as("c"), cell(1, 0).as("d"))
      .withColumn("n0", col("a") + col("b"))
      .withColumn("n1", col("c") + col("d"))
      .withColumn("nc", col("a") + col("c"))
      .withColumn("nn", col("b") + col("d"))
      .withColumn("n", col("n0") + col("n1"))
      // decimation factor (1 below the cap) and HALF_UP-decimated
      // cells for the exact flag. greatest(...,0) pins n=0 to k=1 on
      // BOTH engines (DIV truncates, // floors — they disagree on
      // negatives, the house sign rule).
      .withColumn("k", expr(s"1L + greatest(n - 1L, 0L) DIV ${decimateOver}L"))
      .withColumn("a2", expr("(2L*a + k) DIV (2L*k)"))
      .withColumn("b2", expr("(2L*b + k) DIV (2L*k)"))
      .withColumn("c2", expr("(2L*c + k) DIV (2L*k)"))
      .withColumn("d2", expr("(2L*d + k) DIV (2L*k)"))
      // exact cross product difference in DECIMAL from the start —
      // `a*d` in BIGINT would already overflow near 3e9 per cell
      .withColumn("dd2",
        expr("""CAST(a2 AS DECIMAL(38,0)) * CAST(d2 AS DECIMAL(38,0))
                - CAST(b2 AS DECIMAL(38,0)) * CAST(c2 AS DECIMAL(38,0))"""))
      .select(
        col("n0"), col("a").as("conv0"), col("n1"), col("c").as("conv1"),
        expr("(a * CAST(1000000000 AS BIGINT)) DIV nullif(n0, 0)").as("conv0_ppb"),
        expr("(c * CAST(1000000000 AS BIGINT)) DIV nullif(n1, 0)").as("conv1_ppb"),
        expr("""CAST(round(
            (CAST(n AS DOUBLE) * power(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                                       - CAST(b AS DOUBLE) * CAST(c AS DOUBLE), 2))
            / nullif(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
                     * CAST(nc AS DOUBLE) * CAST(nn AS DOUBLE), 0.0),
            4) AS DOUBLE)""").as("chi2"),
        expr("""CAST(1000000 AS DECIMAL(38,0)) * CAST(a2+b2+c2+d2 AS DECIMAL(38,0)) * dd2 * dd2
              > CAST(3841459 AS DECIMAL(38,0)) * CAST(a2+b2 AS DECIMAL(38,0))
                * CAST(c2+d2 AS DECIMAL(38,0)) * CAST(a2+c2 AS DECIMAL(38,0))
                * CAST(b2+d2 AS DECIMAL(38,0))""").as("significant_95"))
  }

  /** Difference-in-differences over a panel: units split by integer
    * `variant` (0 control / 1 treated) and integer `period` (0 pre /
    * 1 post), outcome `value`. Emits the four cell counts, the four
    * decimal-routed round-4 cell means (the [[graft.queries.Num]]
    * device — partial-agg order can't move them), and the DiD
    * estimate `(ȳ₁₁−ȳ₁₀)−(ȳ₀₁−ȳ₀₀)` computed from those FOUR
    * ROUNDED means in one fixed expression tree — both engines
    * combine identical doubles, so the estimate is hash-exact
    * without a common-denominator blow-up.
    *
    * Scale: one conditional-aggregate scan to 4 cells (8 partials);
    * constant work after.
    */
  def didReport(panel: DataFrame): DataFrame = {
    val cnt = (v: Int, p: Int) =>
      sum(when(col("variant") === v && col("period") === p, 1L).otherwise(0L))
    val mean = (v: Int, p: Int) =>
      round(
        sum(when(col("variant") === v && col("period") === p,
          col("value").cast("decimal(38,6)"))).cast("double") /
          nullif(cnt(v, p), lit(0L)),
        4).cast("double")
    panel
      .agg(
        cnt(0, 0).as("n00"), cnt(0, 1).as("n01"), cnt(1, 0).as("n10"), cnt(1, 1).as("n11"),
        mean(0, 0).as("m_ctl_pre"), mean(0, 1).as("m_ctl_post"),
        mean(1, 0).as("m_trt_pre"), mean(1, 1).as("m_trt_post"))
      .withColumn("did",
        round((col("m_trt_post") - col("m_trt_pre")) - (col("m_ctl_post") - col("m_ctl_pre")), 4))
  }

  /** Cohen's κ inter-rater agreement between two boolean columns
    * `rater_a` / `rater_b` on the same units — the chance-corrected
    * agreement score that decides whether two quality signals
    * actually measure the same thing (raw agreement p_o is inflated
    * whenever the marginals are skewed; κ subtracts the chance term
    * p_e). Observed and chance agreement are emitted as floored
    * integer ppb (DECIMAL-routed — p_e's r·c products overflow
    * BIGINT·10⁹ past ~2×10⁶ units), κ itself as a round-4 double
    * computed by one fixed expression tree over the exact counts.
    *
    * Scale: one conditional-aggregate scan to four cells; everything
    * after is constant work.
    */
  def kappaReport(ratings: DataFrame): DataFrame = {
    val cell = (a: Boolean, b: Boolean) =>
      sum(when(col("rater_a") === a && col("rater_b") === b, 1L).otherwise(0L))
    ratings
      .agg(cell(true, true).as("n11"), cell(true, false).as("n10"),
        cell(false, true).as("n01"), cell(false, false).as("n00"))
      .withColumn("n", col("n11") + col("n10") + col("n01") + col("n00"))
      .select(
        col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        expr("""CAST(((n11 + n00) * CAST(1000000000 AS DECIMAL(38,0))) DIV nullif(n, 0) AS BIGINT)""")
          .as("po_ppb"),
        expr("""CAST(((CAST(n11 + n10 AS DECIMAL(38,0)) * CAST(n11 + n01 AS DECIMAL(38,0))
                       + CAST(n01 + n00 AS DECIMAL(38,0)) * CAST(n10 + n00 AS DECIMAL(38,0)))
                      * 1000000000) DIV nullif(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)), 0) AS BIGINT)""")
          .as("pe_ppb"),
        expr("""CAST(round(
            (CAST(n AS DOUBLE) * (CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE))
             - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)))
            / nullif(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                        + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)), 0.0),
            4) AS DOUBLE)""").as("kappa"))
  }
}
