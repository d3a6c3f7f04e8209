package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Operational data diagnostics — the report you run BEFORE choosing
  * a join strategy: per candidate join key, the cardinality and skew
  * profile that decides between a plain hash join, a broadcast, and
  * a salted rewrite (q_salted_join's knob). All ratios are floored
  * integer ppb so the report is hash-exact.
  */
object Diagnostics {

  /** One-row key-distribution report for `keyCol`: row/key counts,
    * the hottest key (count-desc, key-asc deterministic), max and
    * exact-disc median per-key counts, the hot key's traffic share,
    * and `skew_ppb` = max/mean in ppb (10⁹ = perfectly uniform; the
    * salting threshold is typically ≳ 4·10⁹).
    *
    * Scale: one partial-combining count per key, then every statistic
    * is computed over the COUNTS relation (one row per key): a 1-row
    * aggregate, a sketch-bracket median ([[Quantiles.exactDisc]] —
    * never a buffered percentile), and an order-by-limit-1 hottest
    * key (TakeOrdered, not a global window). The report never touches
    * the fact rows twice.
    */
  def keyDistribution(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("cnt"))
    val g = counts.withColumn("__g", lit(0))
    val tot = g.groupBy("__g").agg(
      sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"))
    val med = Quantiles.exactDisc(
        g.withColumn("cntd", col("cnt").cast("double")), Seq("__g"), "cntd", Seq(0.5))
      .select(col("__g"), col("value").as("p50_cnt"))
    val hot = counts.orderBy(col("cnt").desc, col("k").asc).limit(1)
      .select(col("k").as("hot_key"), col("cnt").as("hot_cnt"))
    tot.join(med, "__g").drop("__g")
      .crossJoin(broadcast(hot))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"), col("p50_cnt"),
        col("hot_key"), col("hot_cnt"),
        expr("(hot_cnt * CAST(1000000000 AS BIGINT)) DIV n_rows").as("hot_share_ppb"),
        // max·keys·10⁹ overflows BIGINT past ~10⁹ keys × 10⁹ max —
        // route the product through DECIMAL(38,0) (DuckDB: HUGEINT)
        expr("""CAST((CAST(max_cnt AS DECIMAL(38,0)) * CAST(n_keys AS DECIMAL(38,0))
                      * CAST(1000000000 AS DECIMAL(38,0))) DIV n_rows AS BIGINT)""")
          .as("skew_ppb"))
  }
}
