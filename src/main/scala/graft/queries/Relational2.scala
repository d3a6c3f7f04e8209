package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.t
import Num._
import graft.engine.Scratch

/** Second batch of the SURVEY §2 operator inventory: join variants
  * (USING, salted-skew), GROUPING SETS, ordered/string/bool/bit/
  * statistical aggregates, series generation, try_cast + hashing,
  * UNION BY NAME, and an exact weighted percentile (the reference's
  * approx_percentile_cont_with_weight, §2.4, computed exactly via a
  * cumulative-weight window so the oracle can reproduce it).
  */
object Relational2 {

  /** USING-style join (shared column name) + aggregation. */
  def joinUsing(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "okey")
    val o = t(s, dir, "orders").withColumnRenamed("o_orderkey", "okey")
    l.join(o, Seq("okey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .orderBy("o_orderstatus")
  }

  /** Skew-mitigating salted join, output-equivalent to the plain
    * join: the fact side derives a deterministic salt, the dimension
    * side is replicated `salt`-fold, and the join key becomes
    * (key, salt) — the standard rewrite when one key dominates a
    * shuffle. The oracle runs the unsalted join: identical result.
    */
  def saltedJoin(s: SparkSession, dir: String): DataFrame = {
    val salt = 8
    val o = t(s, dir, "orders")
      .withColumn("salt", pmod(col("o_orderkey"), lit(salt)).cast("int"))
    val c = t(s, dir, "customer")
      .withColumn("salt", explode(expr(s"sequence(0, ${salt - 1})")))
    o.join(c, col("o_custkey") === col("c_custkey") && o("salt") === c("salt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy("c_mktsegment")
  }

  /** Explicit GROUPING SETS (disjoint from rollup/cube). */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer")
    s.sql("""
      SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS nk, count(*) AS n,
             CAST(grouping(c_mktsegment) AS INT) AS g_seg,
             CAST(grouping(c_nationkey) AS INT) AS g_nk
      FROM customer
      GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
      ORDER BY g_seg, g_nk, c_mktsegment NULLS FIRST, nk NULLS FIRST""")
  }

  /** Ordered string aggregation (array_agg ORDER BY / string_agg). */
  def stringAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        countDistinct(col("o_orderstatus")).as("n_status"))
      .orderBy("o_orderpriority")

  /** bool_and/bool_or + bit_and/bit_or/bit_xor aggregates. */
  def boolBitAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        bool_and(col("l_quantity") > 1).as("all_gt1"),
        bool_or(col("l_discount") > 0.09).as("any_bigdisc"),
        bit_and(col("l_linenumber")).cast("long").as("band"),
        bit_or(col("l_linenumber")).cast("long").as("bor"),
        bit_xor(col("l_linenumber")).cast("long").as("bxor"))
      .orderBy("l_returnflag")

  /** Statistical aggregates: stddev/corr/regr_* family. Bounded
    * magnitudes only (stddev/corr/slope/r2) — raw var/covar at ~1e9
    * magnitude can't survive cross-engine partial-aggregation
    * rounding at any fixed decimal.
    */
  def statsAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_samp"),
        round(stddev_pop(col("l_extendedprice")), 4).as("sd_pop"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("cor"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("icept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      .orderBy("l_returnflag")

  /** Series generation (generate_series / range table producers). */
  def generateSeries(s: SparkSession, dir: String): DataFrame =
    s.sql("""
      SELECT CAST(x AS BIGINT) AS x, CAST(x AS BIGINT) * x AS sq,
             CAST(x % 7 AS BIGINT) AS m7
      FROM (SELECT explode(sequence(1, 100)) AS x) ORDER BY x""")

  /** try_cast + regexp_extract + cryptographic hashes. */
  def tryCastHash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        expr("try_cast(p_brand AS INT)").cast("long").as("bad_cast"),
        expr("try_cast(p_size AS STRING)").as("size_str"),
        regexp_extract(col("p_brand"), "[0-9]+", 0).as("brand_num"),
        expr("try_cast(regexp_extract(p_brand, '[0-9]+', 0) AS BIGINT)").as("brand_num_i"),
        sha2(col("p_name"), 256).as("sha"),
        md5(col("p_brand")).as("m"))
      .orderBy("p_partkey")

  /** Column-name-resolved union (UNION BY NAME). */
  def unionByName(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val a = c.select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
    val b = c.filter(col("c_acctbal") > 5000)
      .select(col("c_acctbal").as("bal"), col("c_custkey").as("k")) // reversed order
    a.unionByName(b)
      .groupBy()
      .agg(count(lit(1)).as("n"), dsum(col("bal")).as("total"))
  }

  /** Exact weighted percentile (weighted median) via cumulative
    * decimal weights — the deterministic counterpart of the
    * reference's approx_percentile_cont_with_weight.
    *
    * Scale shape: the weights first hash-aggregate to one row per
    * (rf, price) (partial→final, fully parallel). The cumulative
    * weight then does NOT run as one window per l_returnflag — a
    * 3-value key, so each partition holds a third of the distinct
    * prices, and the distinct-price count GROWS with scale (price ∝
    * part catalog × quantity — domain-bounded was optimistic) —
    * but as the [[graft.operators.Ranks]] two-pass bucketed running
    * sum: approx-quantile price buckets per flag, parallel
    * per-(flag, bucket) windows, broadcast offsets. Decimal addition
    * is exact and associative, so the bucketed cumulative weights are
    * value-identical to the single window's (the DuckDB oracle
    * replays the single-window form). The per-flag total is a
    * separate tiny aggregate, not a whole-partition window.
    */
  def weightedPercentile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Ranks
    // The (rf, price) aggregate feeds several downstream branches
    // (bucket bounds, the bucketed window, the offset table); left
    // lazy each branch re-derives the whole lineitem scan +
    // hash-aggregate, and AQE re-planning multiplies across the
    // copies (the r18 bimodal 10x-CPU slow mode). It is (rf, price)-
    // sized — tiny next to lineitem — so materializing it caps the
    // derivation multiplier at one.
    //
    // r21 shape (3 jobs instead of 4, one broadcast join instead of
    // two): the bucket boundaries are COLLECTED literals (3 flags ×
    // 63 doubles — dimension-sized driver state, the centroid-
    // localization class), so `keyed` is a pure narrow map over the
    // checkpointed aggregate and can feed both the window scan and
    // the offsets aggregate without a second checkpoint; and the
    // per-flag total rides the offsets frame (`tw` from
    // bucketOffsetsWithTotal) instead of a separate aggregate +
    // broadcast join over `a`.
    val a = Scratch.checkpoint(
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("rf"), col("l_extendedprice").as("p"))
        .agg(sum(col("l_quantity").cast("decimal(38,6)")).as("w")),
      "wpct-agg")
    val keyed = Ranks.rangeBucketedAuto(a, "rf", col("p"), 64)
    val wIn = Window.partitionBy("rf", "bucket").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .withColumn("cum_in", sum(col("w")).over(wIn))
      .join(broadcast(Ranks.bucketOffsetsWithTotal(keyed, Seq("rf"), col("w"))), Seq("rf", "bucket"))
      .withColumn("cw", col("b_off") + col("cum_in"))
      .groupBy(col("rf"))
      .agg(min(when(col("cw") * 2 >= col("tw"), col("p"))).as("wmedian"))
      .orderBy("rf")
  }

  // ---------------------------------------------------------------- oracle SQL

  val oracle: Map[String, String] = Map(
    "q_join_using" -> s"""
      SELECT o_orderstatus, count(*) AS n, ${dsumSql("l_quantity")} AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_salted_join" -> s"""
      SELECT c_mktsegment, count(*) AS n_orders, ${dsumSql("o_totalprice")} AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q_grouping_sets" -> """
      SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS nk, count(*) AS n,
             CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
             CAST(GROUPING(c_nationkey) AS INT) AS g_nk
      FROM customer
      GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
      ORDER BY g_seg, g_nk, c_mktsegment NULLS FIRST, nk NULLS FIRST""",

    "q_string_agg" -> """
      SELECT o_orderpriority,
             array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
             count(DISTINCT o_orderstatus) AS n_status
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_bool_bit_agg" -> """
      SELECT l_returnflag,
             bool_and(l_quantity > 1) AS all_gt1,
             bool_or(l_discount > 0.09) AS any_bigdisc,
             CAST(bit_and(l_linenumber) AS BIGINT) AS band,
             CAST(bit_or(l_linenumber) AS BIGINT) AS bor,
             CAST(bit_xor(l_linenumber) AS BIGINT) AS bxor
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_stats_agg" -> """
      SELECT l_returnflag,
             round(stddev_samp(l_extendedprice), 4) AS sd_samp,
             round(stddev_pop(l_extendedprice), 4) AS sd_pop,
             round(corr(l_quantity, l_extendedprice), 6) AS cor,
             round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
             round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
             round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
             regr_count(l_extendedprice, l_quantity) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_generate_series" -> """
      SELECT CAST(generate_series AS BIGINT) AS x,
             CAST(generate_series AS BIGINT) * generate_series AS sq,
             CAST(generate_series % 7 AS BIGINT) AS m7
      FROM generate_series(1, 100) ORDER BY x""",

    "q_try_cast_hash" -> """
      SELECT p_partkey,
             CAST(TRY_CAST(p_brand AS INT) AS BIGINT) AS bad_cast,
             TRY_CAST(p_size AS VARCHAR) AS size_str,
             regexp_extract(p_brand, '[0-9]+') AS brand_num,
             TRY_CAST(regexp_extract(p_brand, '[0-9]+') AS BIGINT) AS brand_num_i,
             sha256(p_name) AS sha,
             md5(p_brand) AS m
      FROM part ORDER BY p_partkey""",

    "q_union_by_name" -> s"""
      WITH u AS (
        SELECT c_custkey AS k, c_acctbal AS bal FROM customer
        UNION ALL BY NAME
        SELECT c_acctbal AS bal, c_custkey AS k FROM customer WHERE c_acctbal > 5000)
      SELECT count(*) AS n, ${dsumSql("bal")} AS total FROM u""",

    "q_weighted_percentile" -> """
      WITH c AS (
        SELECT l_returnflag AS rf, l_extendedprice AS p,
               sum(CAST(l_quantity AS DECIMAL(38,6))) OVER
                 (PARTITION BY l_returnflag ORDER BY l_extendedprice
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
               sum(CAST(l_quantity AS DECIMAL(38,6))) OVER
                 (PARTITION BY l_returnflag) AS tw
        FROM lineitem)
      SELECT rf, min(p) AS wmedian FROM c WHERE cw * 2 >= tw
      GROUP BY rf ORDER BY rf""")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_using" -> (joinUsing _),
    "q_salted_join" -> (saltedJoin _),
    "q_grouping_sets" -> (groupingSets _),
    "q_string_agg" -> (stringAgg _),
    "q_bool_bit_agg" -> (boolBitAgg _),
    "q_stats_agg" -> (statsAgg _),
    "q_generate_series" -> (generateSeries _),
    "q_try_cast_hash" -> (tryCastHash _),
    "q_union_by_name" -> (unionByName _),
    "q_weighted_percentile" -> (weightedPercentile _))
}
