package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: pairwise support / confidence /
  * lift over per-order item sets — the one frequent-itemset round that
  * covers most production "what co-occurs" questions (full Apriori
  * iterates this shape; FP-growth replaces it only when the pair pass
  * itself is too wide, which item-alphabet grouping prevents here).
  *
  * Scale: the co-occurrence self-join is keyed on the BASKET id, so
  * pair volume is Σ_b |b|² — governed by basket width (TPC-H baskets
  * are ≤ 7 lines; real carts are tens), never corpus². Dedup to
  * (basket, item-group) before pairing caps |b| at the item alphabet.
  * All downstream aggregates have |alphabet|² cardinality: their
  * shuffles are a handful of combined partials, and the per-item
  * totals broadcast back onto the pair table. All derived metrics are
  * floored integer parts-per-billion (two-step `DIV` for lift, exact
  * and identical on both engines — no float enters the hash).
  */
object Baskets {

  /** Pairwise association metrics between item groups (`itemCol`,
    * e.g. brand) across baskets (`basketCol`, e.g. order key):
    * `n_a`/`n_b` basket counts, `n_ab` co-occurrence support,
    * `conf_ab_ppb` = P(b|a) and `lift_ppb` = P(ab)/(P(a)P(b)) in
    * integer ppb. Pairs are canonical (`item_a < item_b`); confidence
    * for the reverse direction is `conf_ab_ppb · n_a / n_b` if
    * needed.
    */
  def pairMetrics(items: DataFrame, basketCol: String, itemCol: String): DataFrame = {
    val sets = items
      .select(col(basketCol).as("bid"), col(itemCol).as("item"))
      .distinct()
    val pairs = sets.as("a")
      .join(sets.as("b"), "bid")
      .filter(col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    val itemCnt = sets.groupBy(col("item")).agg(count(lit(1)).as("n"))
    val total = sets.select(col("bid")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(broadcast(itemCnt.select(col("item").as("item_a"), col("n").as("n_a"))), "item_a")
      .join(broadcast(itemCnt.select(col("item").as("item_b"), col("n").as("n_b"))), "item_b")
      .crossJoin(broadcast(total))
      .withColumn("conf_ab_ppb",
        expr("(n_ab * CAST(1000000000 AS BIGINT)) DIV n_a"))
      .withColumn("lift_ppb",
        expr("(((n_ab * CAST(1000000000 AS BIGINT)) DIV n_a) * n_baskets) DIV n_b"))
      .select("item_a", "item_b", "n_a", "n_b", "n_ab", "n_baskets",
        "conf_ab_ppb", "lift_ppb")
  }
}
