package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Federation
import Tables.t
import Num._

/** SURVEY.md §2.12 canonical query inventory — one declared query per
  * operator family of the reference's SQL surface (everything csvb
  * reaches through its single delegation site,
  * `/root/reference/csvb_engine/src/lib.rs:87-89`), re-expressed with
  * the DataFrame/Dataset API (spark.sql where the SQL surface itself
  * is the thing being exercised: named windows, recursive CTEs,
  * VALUES, correlated subqueries).
  *
  * Determinism contract with the DuckDB oracle (SURVEY.md §5): every
  * query has a total-order ORDER BY; double aggregates go through
  * [[Num.dsum]]/[[Num.davg]]; integer-ish outputs are cast to BIGINT
  * on both sides; ORDER BY always spells NULLS FIRST/LAST.
  */
object Relational {

  /** Schema-adaptive events loader. The fixture's `ts` physical type
    * has varied across driver generations: TIMESTAMP(NANOS) (which
    * Spark's reader rejects outright — the `nanosAsLong` shim turns
    * it into an epoch-nanos long we truncate to micros) and plain
    * TIMESTAMP(MICROS) (surfaced as TIMESTAMP_NTZ). Normalize both to
    * session-local TimestampType at micros grain — with the UTC
    * session timezone every query pins, the NTZ→LTZ cast is
    * value-identical to what the DuckDB oracle's naive TIMESTAMP sees.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ->LTZ branch below is only oracle-identical under a UTC
    // session; every current entry point (Bench, Verify, SparkSpec)
    // pins it, but pin it here too so an unpinned future caller can't
    // get silently shifted timestamps
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  // ---------------------------------------------------------------- scans / σ / π

  /** Projection + filter; both pushed into the parquet scan. */
  def scanFilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1995-06-01").cast("timestamp") && col("l_discount") > 0.02)
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        (col("l_quantity") * col("l_tax")).as("qtax"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc)

  // ---------------------------------------------------------------- aggregation

  /** TPC-H Q1-shape grouped aggregation: partial (map-side) → final. */
  def aggGroupBy(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** DISTINCT aggregates (single- and synthetic multi-column). */
  def aggDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey") * lit(1000000L) + col("l_partkey")).as("nd_ps"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  /** ROLLUP + grouping() over the region→nation hierarchy; the dim
    * tables are broadcast (tiny at any scale factor).
    */
  def aggRollup(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_cust"),
        dsum(col("c_acctbal")).as("sum_bal"),
        grouping(col("r_name")).cast("int").as("g_r"),
        grouping(col("n_name")).cast("int").as("g_n"))
      .orderBy(col("g_r").asc, col("g_n").asc, col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** CUBE over independent keys + grouping() flags. */
  def aggCube(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"))
      .cube(col("c_mktsegment"), col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total"),
        grouping(col("c_mktsegment")).cast("int").as("g_seg"),
        grouping(col("o_orderstatus")).cast("int").as("g_st"))
      .orderBy(col("g_seg").asc, col("g_st").asc,
        col("c_mktsegment").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
  }

  /** Approximate aggregates (HLL++ distinct, quantile sketch) — the
    * reference's approx_distinct/approx_percentile family.
    *
    * The sketch VALUES are engine-specific (DuckDB cannot replay
    * Spark's HLL++/KLL), so the hash-compared output is the sketch
    * CONTRACT instead: each group emits its exact distinct count
    * (cross-engine-checked against DuckDB) plus booleans asserting
    * the sketches landed within ±2% of the exact answers computed in
    * the same job; the oracle emits literal `true` for those columns,
    * so any sketch drifting out of tolerance turns the row red. The
    * exact aggregates exist only to grade the sketches — at 100 TB a
    * user runs the approx functions alone.
    */
  def aggApprox(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_partkey"), col("l_extendedprice"))
    // two aggregations joined on the (3-row) group key, NOT one: a
    // DISTINCT aggregate plans an Expand (3× rows), and pushing the
    // sketch updates through the expanded stream measured 7× slower
    // than letting each family aggregate its own un-expanded scan
    val exact = base.groupBy(col("l_returnflag")).agg(
      countDistinct(col("l_partkey")).as("exact_parts"))
    val approx = base.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_median"))
    // the quantile sketch is verified by its RANK contract via one
    // more O(n) scan against the broadcast 3-row medians (the sketch
    // guarantees rank error ≤ n/accuracy = 0.01%; ±2% here is slack).
    // TIE-SAFE two-sided form: under duplicate runs the at-or-below
    // fraction of a perfectly correct median can legitimately exceed
    // 0.52 (cume_dist jumps across a run), so the check is
    // strictly-below ≤ 0.52 AND at-or-below ≥ 0.48 — a correct median
    // always satisfies both, a median off by > 2% of ranks breaks
    // one. An exact percentile would buffer every group's values
    // through one sort aggregate: the O(group) memory shape this
    // query's scale story exists to avoid (and 3.4 s of the old 4 s
    // at sf0.1).
    val rank = base
      .join(broadcast(approx.select(col("l_returnflag"), col("approx_median"))),
        Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        (sum(when(col("l_extendedprice") < col("approx_median"), 1L).otherwise(0L)) /
          count(lit(1))).as("rank_below"),
        (sum(when(col("l_extendedprice") <= col("approx_median"), 1L).otherwise(0L)) /
          count(lit(1))).as("rank_at_or_below"))
    exact.join(approx, Seq("l_returnflag")).join(rank, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <= col("exact_parts") * lit(0.02))
          .as("hll_within_2pct"),
        (col("rank_below") <= 0.52 && col("rank_at_or_below") >= 0.48)
          .as("median_within_2pct"))
      .orderBy("l_returnflag")
  }

  // ---------------------------------------------------------------- joins

  /** 6-table equi-join chain (TPC-H Q5 shape). nation/region are
    * broadcast; the fact-side joins shuffle on their keys and AQE
    * picks broadcast vs sort-merge for orders/customer at runtime.
    */
  def joinInnerChain(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(su, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** Left outer + left-semi (EXISTS) + left-anti (NOT EXISTS). */
  def joinOuterSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val oc = o.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("with_orders"))
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("without_orders"))
    val tot = c.join(oc, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("total"), sum(coalesce(col("n_orders"), lit(0L))).as("orders_total"))
    tot
      .join(semi, Seq("c_mktsegment"), "left")
      .join(anti, Seq("c_mktsegment"), "left")
      .select(
        col("c_mktsegment"),
        col("total"),
        coalesce(col("with_orders"), lit(0L)).as("with_orders"),
        coalesce(col("without_orders"), lit(0L)).as("without_orders"),
        col("orders_total"))
      .orderBy("c_mktsegment")
  }

  /** Pure theta join (nested-loop) + equi join with non-equi residual. */
  def joinTheta(s: SparkSession, dir: String): DataFrame = {
    val su = t(s, dir, "supplier")
    val c = t(s, dir, "customer")
    val a = su.select(col("s_suppkey").as("k"), col("s_acctbal").as("bal"), col("s_nationkey").as("nk"))
    val b = su.select(col("s_acctbal").as("bal2"))
    val richer = a.join(b, col("bal") < col("bal2"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_richer"))
    val residual = a.join(c, col("nk") === col("c_nationkey") && col("c_acctbal") > col("bal"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_richer_cust"))
    a.select(col("k").as("s_suppkey"))
      .join(richer.withColumnRenamed("k", "s_suppkey"), Seq("s_suppkey"), "left")
      .join(residual.withColumnRenamed("k", "s_suppkey"), Seq("s_suppkey"), "left")
      .select(
        col("s_suppkey"),
        coalesce(col("n_richer"), lit(0L)).as("n_richer"),
        coalesce(col("n_richer_cust"), lit(0L)).as("n_richer_cust"))
      .orderBy("s_suppkey")
  }

  // ---------------------------------------------------------------- windows

  /** Ranking family: row_number/rank/dense_rank/ntile, top-N per group. */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        ntile(4).over(w).as("quart"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Frame family: running sums (ROWS), sliding ROWS frame, interval
    * RANGE frame, lag/lead — decimal-summed for oracle determinism.
    */
  def windowFrames(s: SparkSession, dir: String): DataFrame = {
    events(s, dir).createOrReplaceTempView("events")
    s.sql("""
      SELECT user_id, event_id, ts, value,
        CAST(round(sum(CAST(value AS DECIMAL(38,6))) OVER w_run, 4) AS DOUBLE) AS running,
        lag(value, 1) OVER w_det AS prev_v,
        lead(value, 1) OVER w_det AS next_v,
        CAST(round(sum(CAST(value AS DECIMAL(38,6))) OVER
          (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS sum3,
        CAST(round(sum(CAST(value AS DECIMAL(38,6))) OVER
          (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS sum_1h,
        count(*) OVER
          (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW) AS cnt_1h
      FROM events
      WINDOW
        w_det AS (PARTITION BY user_id ORDER BY ts, event_id),
        w_run AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ts, event_id""")
  }

  // ---------------------------------------------------------------- sort / limit / set ops

  /** Multi-key sort with explicit null placement + LIMIT/OFFSET
    * (Catalyst turns ORDER BY + LIMIT into distributed top-k).
    */
  def sortTopkOffset(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"), col("o_orderpriority"),
        when(col("o_orderstatus") === "O", lit(null).cast("double"))
          .otherwise(col("o_totalprice")).as("tp"))
      .orderBy(col("o_orderpriority").asc, col("tp").desc_nulls_last, col("o_orderkey").asc)
      .offset(5)
      .limit(20)

  /** UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL] cardinalities. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val b = c.filter(col("c_acctbal") > 5000).select("c_custkey")
    def tag(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("cnt")).select(lit(name).as("op"), col("cnt"))
    Seq(
      tag(a.unionAll(b), "union_all"),
      tag(a.union(b).distinct(), "union_distinct"),
      tag(a.intersect(b), "intersect"),
      tag(a.intersectAll(b), "intersect_all"),
      tag(a.except(b), "except"),
      tag(a.exceptAll(b), "except_all"))
      .reduce(_ unionAll _)
      .orderBy("op")
  }

  /** Federation shape (SURVEY §2.1 union-of-shards): same-schema
    * shards unioned then aggregated — the reference's
    * UnionTableProvider scatter-gather re-expressed as Union legs.
    */
  def unionShards(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val shards = (0 until 3).map(i => o.filter(pmod(col("o_orderkey"), lit(3)) === i))
    Federation.unionShards(shards)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus")
  }

  /** Compat-mode federation over heterogeneous shards: one leg has
    * its columns REORDERED and another drops to a projection-reorder
    * too — the realistic fleet case (shards created at different
    * schema epochs). The by-name union must land every value in the
    * right column; the oracle reads the unsharded table, so ANY
    * positional mix-up (price summed as keys, statuses from the
    * wrong column) hash-fails. Strict mode would bail on this input
    * ([[graft.engine.Federation.unionShards]]); FederationSpec pins
    * that contrast.
    */
  def unionShardsCompat(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val a = o.filter(pmod(col("o_orderkey"), lit(3)) === 0)
    val b = o.filter(pmod(col("o_orderkey"), lit(3)) === 1)
      .select(col("o_totalprice"), col("o_orderkey"), col("o_orderstatus"))
    val c = o.filter(pmod(col("o_orderkey"), lit(3)) === 2)
      .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
    Federation.unionShards(Seq(a, b, c), strict = false)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus")
  }

  // ---------------------------------------------------------------- subqueries / CTE

  /** Correlated scalar subqueries (decorrelated to joins by Catalyst)
    * + IN subquery (left-semi). Exact decimal arithmetic so the
    * boundary predicate is engine-independent.
    */
  def subqueryCorrelated(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer")
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql("""
      SELECT c_custkey, c_acctbal FROM customer c
      WHERE CAST(c_acctbal AS DECIMAL(38,6)) *
              (SELECT count(*) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
            > (SELECT sum(CAST(c3.c_acctbal AS DECIMAL(38,6))) FROM customer c3
               WHERE c3.c_nationkey = c.c_nationkey)
        AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
      ORDER BY c_custkey""")
  }

  /** WITH RECURSIVE (Spark 4.x) — factorial series. */
  def cteRecursive(s: SparkSession, dir: String): DataFrame =
    s.sql("""
      WITH RECURSIVE r(n, f) AS (
        SELECT CAST(1 AS BIGINT) AS n, CAST(1 AS BIGINT) AS f
        UNION ALL SELECT n + 1, f * (n + 1) FROM r WHERE n < 15)
      SELECT n, f FROM r ORDER BY n""")

  // ---------------------------------------------------------------- scalar sweeps

  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        length(col("p_name")).cast("long").as("name_len"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_name"), 3, 8).as("sub"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
        lpad(col("p_brand"), 12, "*").as("lp"),
        rpad(col("p_brand"), 12, "#").as("rp"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowels"),
        expr("split_part(p_type, ' ', 1)").as("type1"),
        instr(col("p_name"), "al").cast("long").as("pos_al"),
        translate(col("p_brand"), "#", "-").as("tbrand"),
        reverse(col("p_brand")).as("rbrand"),
        expr("repeat(substr(p_brand, 1, 2), 3)").as("rep"),
        ascii(col("p_name")).cast("long").as("a0"),
        levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev"),
        expr("regexp_count(p_name, 'a')").cast("long").as("n_a"),
        md5(col("p_name")).as("h"))
      .orderBy("p_partkey")

  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(
        col("event_id"), col("ts"),
        date_trunc("HOUR", col("ts")).as("hr"),
        date_trunc("DAY", col("ts")).as("day"),
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("mo"),
        dayofmonth(col("ts")).cast("long").as("d"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("mi"),
        second(col("ts")).cast("long").as("sec"),
        date_format(col("ts"), "yyyy-MM-dd").as("ds"),
        to_date(col("ts")).as("dt"),
        (col("ts") + expr("INTERVAL '3' DAY")).as("ts3"),
        expr("unix_micros(ts)").as("um"))
      .orderBy("event_id")

  /** Arbitrary-stride time bucketing — the reference's `date_bin`
    * (DataFusion's only time-series primitive) as Spark `window()`.
    */
  def dateBucketAgg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "15 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(col("window.start").as("bucket"), col("n"), col("total"))
      .orderBy("bucket")

  def mathFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        abs(col("p_size") * lit(-1)).cast("long").as("sz"),
        ceil(col("p_retailprice")).cast("double").as("cl"),
        floor(col("p_retailprice")).cast("double").as("fl"),
        round(col("p_retailprice"), 1).as("r1"),
        round(sqrt(col("p_retailprice")), 6).as("sq"),
        round(exp(col("p_size").cast("double") / lit(10.0)), 6).as("ex"),
        round(log(col("p_retailprice")), 6).as("lnp"),
        round(log10(col("p_retailprice")), 6).as("l10"),
        round(pow(col("p_retailprice"), lit(0.5)), 6).as("pw"),
        round(sin(col("p_retailprice")), 6).as("sn"),
        round(cos(col("p_retailprice")), 6).as("cs"),
        round(atan2(col("p_size").cast("double"), lit(7.0)), 6).as("at2"),
        round(degrees(col("p_retailprice") / lit(1000.0)), 6).as("dg"),
        round(radians(col("p_size").cast("double")), 6).as("rd"),
        signum(col("p_retailprice") - lit(1000.0)).cast("double").as("sg"),
        (col("p_size") % lit(7)).cast("long").as("m7"),
        greatest(col("p_retailprice"), lit(500.0)).as("gr"),
        least(col("p_retailprice"), lit(500.0)).as("le"))
      .orderBy("p_partkey")

  /** Array construction + element access + higher-order aggregate. */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_linenumber"))).as("items"))
      .select(
        col("l_orderkey"),
        size(col("items")).cast("long").as("n_items"),
        expr("array_join(transform(items, x -> cast(x as string)), ',')").as("items_str"),
        element_at(col("items"), 1).cast("long").as("first_item"),
        element_at(col("items"), -1).cast("long").as("last_item"),
        array_contains(col("items"), 3).as("has3"),
        expr("aggregate(items, 0L, (acc, x) -> acc + cast(x as bigint) * x)").as("sumsq"))
      .orderBy("l_orderkey")

  /** UNNEST / explode with position (LATERAL-VIEW family). */
  def explodeUnnest(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_linenumber"))).as("items"))
      .select(col("l_orderkey"), posexplode(col("items")).as(Seq("pos", "ln")))
      .select(col("l_orderkey"), col("pos").cast("long").as("pos"), col("ln").cast("long").as("ln"))
      .orderBy("l_orderkey", "pos")

  def caseNullFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("cat"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("-")).as("seg2"),
        greatest(col("c_acctbal"), lit(1000.0)).as("gr"),
        least(col("c_acctbal"), lit(1000.0)).as("le"),
        col("c_acctbal").isNull.as("isn"),
        when(col("c_acctbal").isNotNull, lit("nn")).otherwise(lit("n")).as("nvl2ish"))
      .orderBy("c_custkey")

  /** VALUES inline table + cast matrix. */
  def valuesInline(s: SparkSession, dir: String): DataFrame =
    s.sql("""
      SELECT i, st, CAST(d AS DOUBLE) AS dd, CAST(ts AS TIMESTAMP) AS tts, b,
             CAST(i AS DOUBLE) / 2.0E0 AS half, CAST(i AS STRING) AS si
      FROM VALUES
        (1, 'a', 1.5, TIMESTAMP '2024-01-01 00:00:00', true),
        (2, 'b', 2.5, TIMESTAMP '2024-06-15 12:30:00', false),
        (3, NULL, NULL, NULL, NULL) AS t(i, st, d, ts, b)
      ORDER BY i""")

  /** DISTINCT ON emulation: first row per group by a total order
    * (c_acctbal DESC, c_custkey ASC), as a partial-combining max_by
    * aggregate — NOT a per-nation row_number window: c_nationkey has
    * 25 values, so each window partition would hold 1/25th of the
    * customer table and grow with scale, while the aggregate combines
    * map-side and carries one row per nation through the shuffle.
    * The (c_acctbal, -c_custkey) struct comparator realizes the DESC/
    * ASC total order exactly (same device as Dedup.keepBest).
    */
  def distinctOn(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
      .agg(max_by(
        struct(col("c_custkey"), col("c_acctbal")),
        struct(col("c_acctbal"), (-col("c_custkey")).as("neg_key"))).as("top"))
      .select(col("c_nationkey"), col("top.c_custkey").as("c_custkey"),
        col("top.c_acctbal").as("c_acctbal"))
      .orderBy("c_nationkey")

  /** HAVING + per-aggregate FILTER (WHERE ...) clause. */
  def havingFilterAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("cnt"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        dsum(when(col("o_orderstatus") === "O", col("o_totalprice"))).as("sum_open"))
      .filter(col("cnt") > 100)
      .orderBy("o_orderpriority")

  /** Semi-structured: JSON path extraction from a string column. */
  def jsonFuncs(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  // ---------------------------------------------------------------- oracle SQL

  private def dsumS(e: String) = dsumSql(e)
  private def davgS(e: String) = davgSql(e)

  val oracle: Map[String, String] = Map(
    "q_scan_filter_project" -> """
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             l_extendedprice * (1.0 - l_discount) AS revenue,
             l_quantity * l_tax AS qtax
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1995-06-01' AND l_discount > 0.02
      ORDER BY l_orderkey, l_linenumber""",

    "q_agg_groupby" -> s"""
      SELECT l_returnflag, l_linestatus,
             ${dsumS("l_quantity")} AS sum_qty,
             ${dsumS("l_extendedprice")} AS sum_base_price,
             ${dsumS("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
             ${davgS("l_quantity")} AS avg_qty,
             ${davgS("l_discount")} AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q_agg_distinct" -> """
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS nd_part,
             count(DISTINCT l_suppkey * 1000000 + l_partkey) AS nd_ps,
             count(*) AS cnt
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // the sketch values are Spark-internal; what hashes is the exact
    // distinct count plus the within-±2% contract booleans (Spark
    // computes the comparison, the oracle asserts it must hold) —
    // see [[aggApprox]]
    "q_agg_approx" -> """
      SELECT l_returnflag,
             CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             true AS hll_within_2pct,
             true AS median_within_2pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_agg_rollup" -> s"""
      SELECT r_name, n_name, count(*) AS n_cust, ${dsumS("c_acctbal")} AS sum_bal,
             CAST(GROUPING(r_name) AS INT) AS g_r, CAST(GROUPING(n_name) AS INT) AS g_n
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""",

    "q_agg_cube" -> s"""
      SELECT c_mktsegment, o_orderstatus, count(*) AS n, ${dsumS("o_totalprice")} AS total,
             CAST(GROUPING(c_mktsegment) AS INT) AS g_seg, CAST(GROUPING(o_orderstatus) AS INT) AS g_st
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY CUBE(c_mktsegment, o_orderstatus)
      ORDER BY g_seg, g_st, c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""",

    "q_join_inner_chain" -> s"""
      SELECT n_name, ${dsumS("l_extendedprice * (1.0 - l_discount)")} AS revenue, count(*) AS n_items
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "q_join_outer_semi_anti" -> """
      WITH oc AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
      SELECT c_mktsegment, count(*) AS total, count(n) AS with_orders,
             count(*) - count(n) AS without_orders,
             CAST(coalesce(sum(n), 0) AS BIGINT) AS orders_total
      FROM customer LEFT JOIN oc ON c_custkey = o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q_join_theta" -> """
      SELECT s.s_suppkey,
             (SELECT count(*) FROM supplier s2 WHERE s2.s_acctbal > s.s_acctbal) AS n_richer,
             (SELECT count(*) FROM customer c
              WHERE c.c_nationkey = s.s_nationkey AND c.c_acctbal > s.s_acctbal) AS n_richer_cust
      FROM supplier s ORDER BY s_suppkey""",

    "q_window_rank" -> """
      SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER w AS INT) AS rn,
               CAST(rank() OVER w AS INT) AS rk,
               CAST(dense_rank() OVER w AS INT) AS drk,
               CAST(ntile(4) OVER w AS INT) AS quart
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC))
      WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "q_window_frames" -> """
      SELECT user_id, event_id, ts, value,
        CAST(round(sum(CAST(value AS DECIMAL(38,6))) OVER w_run, 4) AS DOUBLE) AS running,
        lag(value, 1) OVER w_det AS prev_v,
        lead(value, 1) OVER w_det AS next_v,
        CAST(round(sum(CAST(value AS DECIMAL(38,6))) OVER
          (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS sum3,
        CAST(round(sum(CAST(value AS DECIMAL(38,6))) OVER
          (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS sum_1h,
        count(*) OVER
          (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS cnt_1h
      FROM events
      WINDOW
        w_det AS (PARTITION BY user_id ORDER BY ts, event_id),
        w_run AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ts, event_id""",

    "q_sort_topk_offset" -> """
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS tp
      FROM orders
      ORDER BY o_orderpriority ASC, tp DESC NULLS LAST, o_orderkey ASC
      LIMIT 20 OFFSET 5""",

    "q_setops" -> """
      WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
           b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      SELECT * FROM (
        SELECT 'union_all' AS op, (SELECT count(*) FROM (SELECT * FROM a UNION ALL SELECT * FROM b)) AS cnt
        UNION ALL SELECT 'union_distinct', (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
        UNION ALL SELECT 'intersect', (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
        UNION ALL SELECT 'intersect_all', (SELECT count(*) FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b))
        UNION ALL SELECT 'except', (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
        UNION ALL SELECT 'except_all', (SELECT count(*) FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)))
      ORDER BY op""",

    "q_union_shards" -> s"""
      SELECT o_orderstatus, count(*) AS n, ${dsumS("o_totalprice")} AS total
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // same truth as q_union_shards: the by-name union of reordered
    // shards must equal aggregating the unsharded table
    "q_union_shards_compat" -> s"""
      SELECT o_orderstatus, count(*) AS n, ${dsumS("o_totalprice")} AS total
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_subquery_correlated" -> """
      SELECT c_custkey, c_acctbal FROM customer c
      WHERE CAST(c_acctbal AS DECIMAL(38,6)) *
              (SELECT count(*) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
            > (SELECT sum(CAST(c3.c_acctbal AS DECIMAL(38,6))) FROM customer c3
               WHERE c3.c_nationkey = c.c_nationkey)
        AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
      ORDER BY c_custkey""",

    "q_cte_recursive" -> """
      WITH RECURSIVE r(n, f) AS (
        SELECT CAST(1 AS BIGINT) AS n, CAST(1 AS BIGINT) AS f
        UNION ALL SELECT n + 1, f * (n + 1) FROM r WHERE n < 15)
      SELECT n, f FROM r ORDER BY n""",

    "q_string_funcs" -> """
      SELECT p_partkey,
             CAST(length(p_name) AS BIGINT) AS name_len,
             upper(p_name) AS uname,
             lower(p_brand) AS lbrand,
             substr(p_name, 3, 8) AS sub,
             concat_ws('|', p_brand, p_type) AS cat,
             lpad(p_brand, 12, '*') AS lp,
             rpad(p_brand, 12, '#') AS rp,
             trim('  ' || p_name || '  ') AS trimmed,
             regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels,
             split_part(p_type, ' ', 1) AS type1,
             CAST(instr(p_name, 'al') AS BIGINT) AS pos_al,
             translate(p_brand, '#', '-') AS tbrand,
             reverse(p_brand) AS rbrand,
             repeat(substr(p_brand, 1, 2), 3) AS rep,
             CAST(ascii(p_name) AS BIGINT) AS a0,
             CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev,
             CAST(len(regexp_extract_all(p_name, 'a')) AS BIGINT) AS n_a,
             md5(p_name) AS h
      FROM part ORDER BY p_partkey""",

    "q_date_funcs" -> """
      SELECT event_id, ts,
             date_trunc('hour', ts) AS hr,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(date_part('year', ts) AS BIGINT) AS y,
             CAST(date_part('month', ts) AS BIGINT) AS mo,
             CAST(date_part('day', ts) AS BIGINT) AS d,
             CAST(date_part('hour', ts) AS BIGINT) AS h,
             CAST(date_part('minute', ts) AS BIGINT) AS mi,
             CAST(date_part('second', ts) AS BIGINT) AS sec,
             strftime(ts, '%Y-%m-%d') AS ds,
             CAST(ts AS DATE) AS dt,
             ts + INTERVAL 3 DAY AS ts3,
             epoch_us(ts) AS um
      FROM events ORDER BY event_id""",

    "q_date_bucket_agg" -> s"""
      SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS bucket, count(*) AS n,
             ${dsumS("value")} AS total
      FROM events GROUP BY 1 ORDER BY 1""",

    "q_math_funcs" -> """
      SELECT p_partkey,
             CAST(abs(p_size * -1) AS BIGINT) AS sz,
             CAST(ceil(p_retailprice) AS DOUBLE) AS cl,
             CAST(floor(p_retailprice) AS DOUBLE) AS fl,
             round(p_retailprice, 1) AS r1,
             round(sqrt(p_retailprice), 6) AS sq,
             round(exp(CAST(p_size AS DOUBLE) / 10.0), 6) AS ex,
             round(ln(p_retailprice), 6) AS lnp,
             round(log10(p_retailprice), 6) AS l10,
             round(pow(p_retailprice, 0.5), 6) AS pw,
             round(sin(p_retailprice), 6) AS sn,
             round(cos(p_retailprice), 6) AS cs,
             round(atan2(CAST(p_size AS DOUBLE), 7.0), 6) AS at2,
             round(degrees(p_retailprice / 1000.0), 6) AS dg,
             round(radians(CAST(p_size AS DOUBLE)), 6) AS rd,
             CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sg,
             CAST(p_size % 7 AS BIGINT) AS m7,
             greatest(p_retailprice, 500.0) AS gr,
             least(p_retailprice, 500.0) AS le
      FROM part ORDER BY p_partkey""",

    "q_array_funcs" -> """
      WITH g AS (SELECT l_orderkey, list(l_linenumber ORDER BY l_linenumber) AS items
                 FROM lineitem GROUP BY l_orderkey)
      SELECT l_orderkey,
             CAST(len(items) AS BIGINT) AS n_items,
             array_to_string(items, ',') AS items_str,
             CAST(items[1] AS BIGINT) AS first_item,
             CAST(items[-1] AS BIGINT) AS last_item,
             list_contains(items, 3) AS has3,
             CAST(list_aggregate(list_transform(items, x -> CAST(x AS BIGINT) * x), 'sum') AS BIGINT) AS sumsq
      FROM g ORDER BY l_orderkey""",

    "q_explode_unnest" -> """
      SELECT l_orderkey,
             CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS BIGINT) AS pos,
             CAST(l_linenumber AS BIGINT) AS ln
      FROM lineitem ORDER BY l_orderkey, pos""",

    "q_case_null_funcs" -> """
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS cat,
             coalesce(nullif(c_mktsegment, 'BUILDING'), '-') AS seg2,
             greatest(c_acctbal, 1000.0) AS gr,
             least(c_acctbal, 1000.0) AS le,
             c_acctbal IS NULL AS isn,
             CASE WHEN c_acctbal IS NOT NULL THEN 'nn' ELSE 'n' END AS nvl2ish
      FROM customer ORDER BY c_custkey""",

    "q_values_inline" -> """
      SELECT i, st, CAST(d AS DOUBLE) AS dd, CAST(ts AS TIMESTAMP) AS tts, b,
             CAST(i AS DOUBLE) / 2.0E0 AS half, CAST(i AS VARCHAR) AS si
      FROM (VALUES
        (1, 'a', 1.5, TIMESTAMP '2024-01-01 00:00:00', true),
        (2, 'b', 2.5, TIMESTAMP '2024-06-15 12:30:00', false),
        (3, NULL, NULL, NULL, NULL)) t(i, st, d, ts, b)
      ORDER BY i""",

    "q_distinct_on" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_custkey, c_acctbal FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        FROM customer)
      WHERE rn = 1 ORDER BY c_nationkey""",

    "q_having_filter_agg" -> s"""
      SELECT o_orderpriority, count(*) AS cnt,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
             CAST(round(SUM(CAST(o_totalprice AS DECIMAL(38,6))) FILTER (WHERE o_orderstatus = 'O'), 4) AS DOUBLE) AS sum_open
      FROM orders GROUP BY o_orderpriority
      HAVING count(*) > 100 ORDER BY o_orderpriority""",

    "q_json_funcs" -> """
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events ORDER BY event_id""")

  /** Declared queries (name → builder). Keys must match [[oracle]]. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_filter_project" -> (scanFilterProject _),
    "q_agg_groupby" -> (aggGroupBy _),
    "q_agg_distinct" -> (aggDistinct _),
    "q_agg_rollup" -> (aggRollup _),
    "q_agg_cube" -> (aggCube _),
    "q_agg_approx" -> (aggApprox _),
    "q_join_inner_chain" -> (joinInnerChain _),
    "q_join_outer_semi_anti" -> (joinOuterSemiAnti _),
    "q_join_theta" -> (joinTheta _),
    "q_window_rank" -> (windowRank _),
    "q_window_frames" -> (windowFrames _),
    "q_sort_topk_offset" -> (sortTopkOffset _),
    "q_setops" -> (setOps _),
    "q_union_shards" -> (unionShards _),
    "q_union_shards_compat" -> (unionShardsCompat _),
    "q_subquery_correlated" -> (subqueryCorrelated _),
    "q_cte_recursive" -> (cteRecursive _),
    "q_string_funcs" -> (stringFuncs _),
    "q_date_funcs" -> (dateFuncs _),
    "q_date_bucket_agg" -> (dateBucketAgg _),
    "q_math_funcs" -> (mathFuncs _),
    "q_array_funcs" -> (arrayFuncs _),
    "q_explode_unnest" -> (explodeUnnest _),
    "q_case_null_funcs" -> (caseNullFuncs _),
    "q_values_inline" -> (valuesInline _),
    "q_distinct_on" -> (distinctOn _),
    "q_having_filter_agg" -> (havingFilterAgg _),
    "q_json_funcs" -> (jsonFuncs _))
}
