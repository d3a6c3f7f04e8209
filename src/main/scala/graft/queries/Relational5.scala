package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Tables.t
import Num.{davgSql, dsumSql}

/** Fifth batch — composite planner workloads and scale machinery:
  * TPC-H Q18/Q22 shapes (reference runs arbitrary SQL of this class
  * through DataFusion, `/root/reference/csvb_engine/src/lib.rs:82-89`),
  * the exact-percentile family, Spark-4 VARIANT semi-structured
  * extraction, algebraic partial-aggregate maintenance, an explicit
  * bloom-filter semi-join reduction, and corpus bigram statistics.
  */
object Relational5 {

  private def view(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => t(s, dir, n).createOrReplaceTempView(n))

  /** Events fixture carries ns timestamps — same conf shim the other
    * event queries use (ts itself is unused here).
    */
  private def eventsView(s: SparkSession, dir: String): Unit = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events").createOrReplaceTempView("events")
  }

  /** TPC-H Q18 shape (large-volume orders): a grouped HAVING subquery
    * feeding an IN semi-join over the 3-way join chain, re-aggregated
    * on the order grain.
    *
    * Scale: the HAVING subquery is a partial→final aggregate on
    * l_orderkey (the fact table's own key — combines map-side), and
    * the IN becomes a semi join co-partitioned with the main
    * lineitem/orders shuffle on the same key, so the big table
    * shuffles once for both uses; customer broadcasts.
    */
  def tpchQ18(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "customer", "orders", "lineitem")
    s.sql("""
      SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
             o_totalprice, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
      FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderkey""")
  }

  /** TPC-H Q22 shape: scalar aggregate subquery as a filter threshold
    * plus a NOT EXISTS anti join, grouped on a derived code. The
    * fixture has no customer without orders, so the anti-join leg is
    * scoped to urgent-1998 orders to keep the result populated; the
    * threshold average is computed through an exact decimal sum so
    * both engines agree on boundary rows.
    *
    * Scale: Catalyst decorrelates NOT EXISTS into a left-anti hash
    * join on o_custkey; the scalar subquery evaluates once and
    * broadcasts as a literal into every partition's filter.
    */
  def tpchQ22(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "customer", "orders")
    s.sql(TpchQ22Sql)
  }

  private val TpchQ22Sql = s"""
      SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode, count(*) AS numcust,
             ${dsumSql("c_acctbal")} AS totacctbal
      FROM customer
      WHERE c_acctbal > (
          SELECT CAST(round(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                            / COUNT(*), 6) AS DOUBLE)
          FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1998)
      GROUP BY cntrycode ORDER BY cntrycode"""

  /** Exact-percentile family: interpolated PERCENTILE_CONT, the
    * discrete PERCENTILE_DISC, and MEDIAN, grouped. All are exact
    * (full-sort) aggregates — the deliberate counterpart to
    * `q_agg_approx`'s sketches.
    *
    * Scale: exact percentiles cannot partial-aggregate; Spark
    * evaluates them as sort-based aggregation per group (the groups
    * here are 3 wide partitions). At 100 TB the right tool is
    * percentile_approx — this query exists because the reference's
    * SQL surface includes the exact forms.
    */
  def percentileExact(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "lineitem")
    // p25/p50/p75 share ONE value buffer via the array form of exact
    // percentile (identical interpolation to PERCENTILE_CONT — p50 in
    // the array IS percentile_cont(0.5)); the WITHIN GROUP form is
    // kept for p50_disc so the standard syntax stays exercised. Each
    // exact-percentile aggregate buffers the whole group through the
    // shuffle, so collapsing buffers is the lever that matters
    // (measured ~2x on the sf0.1 sweep when 4 buffers became 2-per-
    // column; folding p50 in drops another full-group buffer).
    s.sql("""
      SELECT l_returnflag,
             CAST(round(ps[0], 4) AS DOUBLE) AS p25,
             CAST(round(ps[1], 4) AS DOUBLE) AS p50,
             CAST(round(ps[2], 4) AS DOUBLE) AS p75,
             CAST(p50_disc_raw AS DOUBLE) AS p50_disc,
             CAST(round(med_raw, 4) AS DOUBLE) AS med_qty
      FROM (
        SELECT l_returnflag,
               percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D)) AS ps,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50_disc_raw,
               median(l_quantity) AS med_raw
        FROM lineitem GROUP BY l_returnflag)
      ORDER BY l_returnflag""")
  }

  /** Spark-4 VARIANT extraction: JSON (built per-row from typed
    * columns so both engines see byte-identical input) is parsed once
    * into the binary VARIANT encoding, then path-extracted with
    * `variant_get` — nested object fields, array indexing, and a
    * typed array cast. This is the open-format answer to the
    * reference's string-path `get_json_object`-style access
    * (`q_json_funcs`): parse once, extract many times without
    * re-tokenizing the text.
    *
    * Monetary value is embedded as integer cents via floor() — the
    * one rounding form both engines define identically — so the
    * oracle compare is exact end-to-end.
    */
  def variantJson(s: SparkSession, dir: String): DataFrame = {
    eventsView(s, dir)
    s.sql("""
      WITH j AS (
        SELECT event_id,
               concat('{"m":{"vc":', CAST(CAST(floor(value * 100) AS BIGINT) AS STRING),
                      ',"t":"', event_type, '"},"ks":[',
                      CAST(user_id % 5 AS STRING), ',', CAST(user_id % 7 AS STRING), ']}') AS js
        FROM events),
      v AS (SELECT event_id, parse_json(js) AS pv FROM j)
      SELECT event_id,
             variant_get(pv, '$.m.vc', 'bigint') AS vc,
             variant_get(pv, '$.m.t', 'string') AS mt,
             variant_get(pv, '$.ks[1]', 'bigint') AS k2,
             CAST(size(variant_get(pv, '$.ks', 'array<int>')) AS BIGINT) AS nks
      FROM v ORDER BY event_id""")
  }

  /** Algebraic partial-aggregate maintenance (the materialized-view /
    * incremental-pipeline shape): day-grain partials (sum, count) are
    * the stored state; the month-grain rollup re-aggregates the
    * partials — never the base table — and derives avg as sum/count
    * at the end. The oracle aggregates the base table directly, so
    * the compare proves the two-level merge is exactly the one-level
    * answer.
    *
    * Scale: this is the only viable shape for a continuously-ingested
    * 100 TB fact table — each new day aggregates its own slice, and
    * the monthly refresh touches 31 partial rows per group instead of
    * re-scanning the month.
    */
  def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val D = DecimalType(38, 6)
    val daily = t(s, dir, "orders")
      .groupBy(
        date_trunc("day", col("o_orderdate")).as("day"),
        col("o_orderpriority"))
      .agg(
        sum(col("o_totalprice").cast(D)).as("s"),
        count(lit(1)).as("n"))
    daily
      .groupBy(date_trunc("month", col("day")).cast("date").as("mon"), col("o_orderpriority"))
      .agg(
        round(sum(col("s")), 4).cast("double").as("total"),
        sum(col("n")).as("n_orders"),
        // the merged average goes through Num's exact-integer HALF_UP
        // device — the hand-written double division this replaces hit
        // the same 4-decimal-tie cross-engine flip davg did at sf0.1
        Num.davgOf(sum(col("s")), sum(col("n"))).as("avg_price"))
      .orderBy("mon", "o_orderpriority")
  }

  /** Explicit bloom-filter semi-join reduction — the manual form of
    * Catalyst's InjectRuntimeFilter, via the engine's SQL-registered
    * `bloom_filter_agg` / `might_contain`
    * ([[org.apache.spark.sql.graft.GraftExtensions]]). The dim-side
    * key set is sketched in one pass (per-partition sketches merge by
    * bit-OR, no key shuffle), evaluated as a scalar subquery, and
    * probed on every fact row *before* the semi join — so at scale
    * the join shuffles only the ~selectivity fraction of lineitem
    * that might match, instead of the whole table. The residual IN
    * keeps the result exact (bloom false positives are re-checked),
    * which is what lets a probabilistic filter carry a full oracle.
    */
  def bloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    org.apache.spark.sql.graft.GraftExtensions.install(s)
    view(s, dir, "orders", "lineitem")
    s.sql(s"""
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS mon,
             ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             count(*) AS n_items
      FROM lineitem
      WHERE might_contain(
              (SELECT bloom_filter_agg(xxhash64(o_orderkey), CAST(100000 AS BIGINT))
               FROM orders
               WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1995),
              xxhash64(l_orderkey))
        AND l_orderkey IN (
              SELECT o_orderkey FROM orders
              WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1995)
      GROUP BY mon ORDER BY mon""")
  }

  /** Corpus bigram vocabulary statistics (heavy hitters): tokenize,
    * form adjacent pairs with a positional HOF (element_at is 1-based
    * in both engines), and take the global top 50 with a total-order
    * tie-break.
    *
    * Scale: counting is partial→final on the bigram key (map-side
    * combine absorbs the zipf head before the shuffle) and the final
    * ORDER BY + LIMIT executes as TakeOrderedAndProject — a
    * per-partition top-k merge on the driver's 50 rows, never a
    * global sort of the vocabulary.
    */
  def topNgrams(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "documents")
    s.sql("""
      WITH toks AS (SELECT split(lower(text), ' ') AS t FROM documents),
      bg AS (
        SELECT explode(transform(sequence(1, size(t) - 1),
                                 i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))) AS bigram
        FROM toks WHERE size(t) > 1)
      SELECT bigram, count(*) AS cnt
      FROM bg GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 50""")
  }

  /** TPC-H Q7 shape (volume shipping): a 6-relation join with a
    * disjunctive cross-nation predicate, re-aggregated by year.
    * Catalyst's join reorder + broadcast of the two nation scans is
    * the point; the disjunction can't be pushed to either nation
    * alone, so it evaluates as a post-join filter on the pair.
    */
  def tpchQ7(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "supplier", "lineitem", "orders", "customer", "nation")
    s.sql(TpchQ7Sql)
  }

  private val TpchQ7Sql = s"""
      SELECT supp_nation, cust_nation, l_year,
             CAST(round(SUM(CAST(volume AS DECIMAL(38,6))), 4) AS DOUBLE) AS revenue
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1.0 - l_discount) AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31 23:59:59') x
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""

  /** TPC-H Q16 shape (supplier count by part attributes): NOT IN
    * anti-join against a filtered key set + multi-key distinct count.
    * The fixture has no partsupp table; lineitem is the
    * part-supplier relation (same join shape).
    */
  def tpchQ16(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "lineitem", "part", "supplier")
    s.sql(TpchQ16Sql)
  }

  private val TpchQ16Sql = """
      SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
             count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#45' AND p_size IN (1, 4, 7)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** TPC-H Q21 shape (suppliers who kept waiting): EXISTS and NOT
    * EXISTS both correlated to the SAME fact table with inequality
    * residuals — the hardest decorrelation pattern in the suite
    * (Catalyst plans a semi join and an anti join against lineitem,
    * each on l_orderkey with the supplier-inequality as a residual).
    * Adapted to the fixture's columns: a returned line on a
    * multi-supplier order where no OTHER supplier's line was
    * returned.
    */
  def tpchQ21(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "supplier", "lineitem", "orders")
    s.sql(TpchQ21Sql)
  }

  private val TpchQ21Sql = """
      SELECT s_name, count(*) AS numwait
      FROM supplier, lineitem l1, orders
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R')
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""

  /** TPC-H Q17 shape (small-quantity-order revenue): a correlated
    * SCALAR subquery — `0.2 × avg(l_quantity)` per part — used
    * directly inside the outer WHERE. Catalyst must decorrelate it
    * (RewriteCorrelatedScalarSubquery) into a per-part aggregate
    * joined back to the fact scan; the naive plan would re-run the
    * average once per probed row. Adapted to the fixture (no
    * p_container; p_brand alone selects ~70 parts). The correlated
    * average routes through DECIMAL so the threshold is
    * engine-exact; identical SQL runs on DuckDB.
    */
  def tpchQ17(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "lineitem", "part")
    s.sql(TpchQ17Sql)
  }

  private val TpchQ17Sql = """
      SELECT CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(38,6))), 4) AS DOUBLE) / 7.0
               AS avg_yearly
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#23'
        AND l_quantity < (
          SELECT 0.2 * CAST(avg(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""

  /** TPC-H Q20 shape (dominant part suppliers in a nation): a nested
    * IN chain (supplier ← grouped lineitem ← part-name subquery)
    * whose inner grouped query carries a correlated scalar subquery
    * against the SAME fact table in its HAVING clause — the part's
    * total windowed volume, correlated on a GROUP BY output column.
    * Catalyst must decorrelate both levels: the IN becomes a semi
    * join, the HAVING scalar a per-part aggregate joined to the
    * grouped result. Adapted to the fixture (no partsupp —
    * lineitem's (part, supplier) pairs play its role: a supplier
    * qualifies when it shipped >30% of a small-part's 1996 volume).
    * Quantity sums route through DECIMAL, so the 30% threshold is
    * engine-exact; identical SQL runs on DuckDB.
    */
  def tpchQ20(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "supplier", "nation", "lineitem", "part")
    s.sql(TpchQ20Sql)
  }

  private val TpchQ20Sql = """
      SELECT s_name, CAST(round(CAST(s_acctbal AS DECIMAL(38,6)), 2) AS DOUBLE) AS s_acctbal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
        AND s_suppkey IN (
          SELECT l1.l_suppkey
          FROM lineitem l1
          WHERE l1.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small %')
            AND l1.l_shipdate >= TIMESTAMP '1996-01-01'
            AND l1.l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l1.l_suppkey, l1.l_partkey
          HAVING CAST(SUM(CAST(l1.l_quantity AS DECIMAL(38,6))) AS DOUBLE) >
            (SELECT 0.3 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             FROM lineitem l2
             WHERE l2.l_partkey = l1.l_partkey
               AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
               AND l2.l_shipdate < TIMESTAMP '1997-01-01'))
      ORDER BY s_name"""

  /** Exact percentiles WITHOUT the O(group) buffer — the graded form
    * of [[graft.operators.Quantiles.exactDisc]]: a sketch brackets
    * each target rank, one filter keeps the ~8n/accuracy bracket
    * sliver, and a window sort of that sliver reads off the exact
    * PERCENTILE_DISC value. This is the 100 TB answer to
    * q_percentile_exact's documented scale hazard (whole-group sort
    * aggregation buffers): same exact answer, bounded memory. The
    * oracle is DuckDB's own percentile_disc over the full data —
    * exactness is cross-engine-checked, not assumed.
    */
  def percentileBracket(s: SparkSession, dir: String): DataFrame =
    graft.operators.Quantiles.exactDisc(
      t(s, dir, "lineitem"), Seq("l_returnflag"), "l_extendedprice", Seq(0.5, 0.9))
      .orderBy("l_returnflag", "q")

  /** Error-safe arithmetic under ANSI mode: `try_divide` /
    * `try_multiply` / `try_add` return NULL where strict evaluation
    * would raise (division by zero, bigint overflow) — the DataFusion
    * surface runs the same expressions without ANSI guards, so the
    * NULL-on-error forms are the portable semantics. The oracle
    * states each guard explicitly (nullif divisor, overflow-threshold
    * CASE), proving the try_* results equal the checked arithmetic.
    * The constants sit exactly at the int64 boundary: quantity 49 is
    * the last non-overflowing multiplier/addend.
    *
    * Perf note (measured): every try_* FAILURE is a thrown-and-caught
    * exception per row. With error-dense constants (~60% of rows
    * failing) this query cost 16 s at sf0.1; with failures confined
    * to the boundary quantities (~4% of rows) it is sub-second. The
    * 100 TB rule: try_* guards exceptional rows — it is not a
    * branchless conditional.
    */
  def tryArith(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "lineitem")
    s.sql("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
             try_divide(l_extendedprice, CAST(l_quantity AS BIGINT) % 49) AS safe_div,
             try_multiply(CAST(l_quantity AS BIGINT), CAST(185000000000000000 AS BIGINT)) AS safe_mul,
             try_add(CAST(9223372036854775312 AS BIGINT), CAST(l_quantity * 10 AS BIGINT)) AS safe_add
      FROM lineitem ORDER BY l_orderkey, ln LIMIT 5000""")
  }

  /** Hopping (sliding) window aggregation in BATCH: `window(ts, 30m,
    * 15m)` assigns each event to its dur/slide = 2 overlapping
    * windows — the batch twin of the streaming windowed aggregate
    * (q_stream_window_agg covers the tumbling case). The oracle
    * derives the same two window starts per event with time_bucket
    * arithmetic. Counts only: the expansion factor is dur/slide, so
    * the shuffle grows by exactly that constant — the scale knob is
    * the slide, not the data.
    */
  def hoppingWindow(s: SparkSession, dir: String): DataFrame =
    Relational.events(s, dir)
      .groupBy(window(col("ts"), "30 minutes", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      .orderBy("win_start", "event_type")

  /** FULL OUTER join with null-safe key equality (`<=>` / DuckDB
    * `IS NOT DISTINCT FROM`): the two sides group by *different*
    * moduli (41 vs 43), so keys 41-42 exist only on the right and key
    * 5 is filtered off the right — both outer directions emit real
    * rows — and bucket 0 is folded to NULL on both sides, which the
    * null-safe join matches (a plain `=` would drop it).
    *
    * Scale: full outer hash-joins on the key like an inner join (one
    * shuffle, no expansion); NULLS FIRST is pinned in the sort since
    * the engines' default null placement differs.
    */
  def joinFullOuter(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "orders")
    s.sql(s"""
      WITH a AS (
        SELECT nullif(o_orderkey % 41, 0) AS k, count(*) AS n_a,
               ${dsumSql("o_totalprice")} AS s_a
        FROM orders WHERE year(o_orderdate) = 1995 GROUP BY k),
      b AS (
        SELECT nullif(o_orderkey % 43, 0) AS k, count(*) AS n_b
        FROM orders WHERE year(o_orderdate) = 1996
          AND NOT nullif(o_orderkey % 43, 0) <=> 5
        GROUP BY k)
      SELECT a.k AS k_a, b.k AS k_b, n_a, s_a, n_b
      FROM a FULL OUTER JOIN b ON a.k <=> b.k
      ORDER BY k_a NULLS FIRST, k_b NULLS FIRST""")
  }

  private val bucketedWriteLock = new Object

  /** Bucketed co-located join, graded: both fact tables are written
    * once (per session × sfDir) as external parquet tables bucketed
    * and sorted by the join key, and the join + keyed aggregation
    * then run with ZERO exchanges before the final presentation sort
    * — the scan itself reports hashpartitioning(key, 8), which
    * satisfies the join's distribution AND the aggregate's (the
    * grouping keys contain the bucket key). Relational5Spec asserts
    * the plan; the oracle proves the co-located result equals the
    * plain shuffled join.
    *
    * This is the 100 TB repeated-join answer: the recurring
    * most-expensive shuffle of a workload becomes a one-time write.
    */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    // The setup guard is the CATALOG itself, not a JVM-side cache:
    // [[Tables.pathTag]] is collision-free (sanitized prefix + MD5 of
    // the raw path), and `tableExists` is evaluated against the
    // session driving this call — a second SparkSession (or a rebuilt
    // in-memory catalog) that lacks the tables rewrites them instead
    // of inheriting a stale "already written" bit.
    val id = Tables.pathTag(dir)
    bucketedWriteLock.synchronized {
      if (!s.catalog.tableExists(s"graft_orders_b$id") ||
        !s.catalog.tableExists(s"graft_lineitem_b$id")) {
        val root = java.nio.file.Files.createTempDirectory("graft-bucketed-")
        def rm(f: java.io.File): Unit = { Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); () }
        sys.addShutdownHook(rm(root.toFile))
        graft.engine.Bucketing.writeBucketedAt(
          t(s, dir, "orders"), s"graft_orders_b$id", "o_orderkey", 8, s"$root/orders")
        graft.engine.Bucketing.writeBucketedAt(
          t(s, dir, "lineitem"), s"graft_lineitem_b$id", "l_orderkey", 8, s"$root/lineitem")
      }
    }
    // MERGE hint: at test SFs the orders side fits the broadcast
    // threshold and Catalyst would pick BroadcastHashJoin, which
    // ignores bucketing; the hint pins the big-big regime this
    // operator exists for (at 100 TB neither side broadcasts).
    s.sql(s"""
      SELECT /*+ MERGE(o) */ o.o_orderkey, o.o_orderpriority, count(*) AS n_items,
             ${dsumSql("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue
      FROM graft_orders_b$id o JOIN graft_lineitem_b$id l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority
      ORDER BY o.o_orderkey""")
  }

  // ---------------------------------------------------------------- oracle SQL

  val oracle: Map[String, String] = Map(
    "q_tpch_q18" -> """
      SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
             o_totalprice, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
      FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderkey""",

    // identical text runs on DuckDB — the decimal-sum threshold keeps
    // boundary rows engine-independent
    "q_tpch_q22" -> TpchQ22Sql,

    "q_percentile_exact" -> """
      SELECT l_returnflag,
             CAST(round(quantile_cont(l_extendedprice, 0.25), 4) AS DOUBLE) AS p25,
             CAST(round(quantile_cont(l_extendedprice, 0.5),  4) AS DOUBLE) AS p50,
             CAST(round(quantile_cont(l_extendedprice, 0.75), 4) AS DOUBLE) AS p75,
             CAST(quantile_disc(l_extendedprice, 0.5) AS DOUBLE) AS p50_disc,
             CAST(round(median(l_quantity), 4) AS DOUBLE) AS med_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_variant_json" -> """
      WITH j AS (
        SELECT event_id,
               '{"m":{"vc":' || CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR) ||
               ',"t":"' || event_type || '"},"ks":[' ||
               CAST(user_id % 5 AS VARCHAR) || ',' || CAST(user_id % 7 AS VARCHAR) || ']}' AS js
        FROM events)
      SELECT event_id,
             CAST(json_extract(js, '$.m.vc') AS BIGINT) AS vc,
             json_extract_string(js, '$.m.t') AS mt,
             CAST(json_extract(js, '$.ks[1]') AS BIGINT) AS k2,
             CAST(json_array_length(js, '$.ks') AS BIGINT) AS nks
      FROM j ORDER BY event_id""",

    "q_incremental_agg" -> s"""
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon, o_orderpriority,
             ${dsumSql("o_totalprice")} AS total,
             count(*) AS n_orders,
             ${davgSql("o_totalprice")} AS avg_price
      FROM orders GROUP BY mon, o_orderpriority ORDER BY mon, o_orderpriority""",

    // the bloom pass is a pure pre-filter; the exact answer is the
    // plain semi join
    "q_bloom_prefilter" -> s"""
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS mon,
             ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             count(*) AS n_items
      FROM lineitem
      WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1995)
      GROUP BY mon ORDER BY mon""",

    "q_top_ngrams" -> """
      WITH toks AS (SELECT string_split(lower(text), ' ') AS t FROM documents),
      bg AS (
        SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM toks WHERE len(t) > 1)
      SELECT bigram, count(*) AS cnt
      FROM bg GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 50""",

    "q_try_arith" -> """
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
             l_extendedprice / nullif(CAST(l_quantity AS BIGINT) % 49, 0) AS safe_div,
             CASE WHEN CAST(l_quantity AS BIGINT) <= 49
                  THEN CAST(l_quantity AS BIGINT) * 185000000000000000 END AS safe_mul,
             CASE WHEN CAST(l_quantity * 10 AS BIGINT) <= 495
                  THEN 9223372036854775312 + CAST(l_quantity * 10 AS BIGINT) END AS safe_add
      FROM lineitem ORDER BY l_orderkey, ln LIMIT 5000""",

    "q_tpch_q7" -> TpchQ7Sql,
    "q_tpch_q16" -> TpchQ16Sql,
    "q_tpch_q17" -> TpchQ17Sql,
    "q_percentile_bracket" -> """
      SELECT l_returnflag, CAST(0.5 AS DOUBLE) AS q,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS value
      FROM lineitem GROUP BY l_returnflag
      UNION ALL
      SELECT l_returnflag, CAST(0.9 AS DOUBLE) AS q,
             percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS value
      FROM lineitem GROUP BY l_returnflag
      ORDER BY l_returnflag, q""",
    "q_tpch_q20" -> TpchQ20Sql,
    "q_tpch_q21" -> TpchQ21Sql,

    "q_hopping_window" -> """
      WITH w AS (
        SELECT event_type,
               time_bucket(INTERVAL 15 MINUTE, ts) - INTERVAL (s*15) MINUTE AS win_start
        FROM events CROSS JOIN range(0, 2) t(s))
      SELECT win_start, event_type, count(*) AS n
      FROM w GROUP BY win_start, event_type ORDER BY win_start, event_type""",

    "q_join_full_outer" -> s"""
      WITH a AS (
        SELECT nullif(o_orderkey % 41, 0) AS k, count(*) AS n_a,
               ${dsumSql("o_totalprice")} AS s_a
        FROM orders WHERE year(o_orderdate) = 1995 GROUP BY k),
      b AS (
        SELECT nullif(o_orderkey % 43, 0) AS k, count(*) AS n_b
        FROM orders WHERE year(o_orderdate) = 1996
          AND NOT nullif(o_orderkey % 43, 0) IS NOT DISTINCT FROM 5
        GROUP BY k)
      SELECT a.k AS k_a, b.k AS k_b, n_a, s_a, n_b
      FROM a FULL OUTER JOIN b ON a.k IS NOT DISTINCT FROM b.k
      ORDER BY k_a NULLS FIRST, k_b NULLS FIRST""",

    // co-location is a physical property; the answer is the plain join
    "q_bucketed_join" -> s"""
      SELECT o_orderkey, o_orderpriority, count(*) AS n_items,
             ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderkey, o_orderpriority
      ORDER BY o_orderkey""")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q18" -> (tpchQ18 _),
    "q_tpch_q22" -> (tpchQ22 _),
    "q_percentile_exact" -> (percentileExact _),
    "q_variant_json" -> (variantJson _),
    "q_incremental_agg" -> (incrementalAgg _),
    "q_bloom_prefilter" -> (bloomPrefilter _),
    "q_top_ngrams" -> (topNgrams _),
    "q_bucketed_join" -> (bucketedJoin _),
    "q_join_full_outer" -> (joinFullOuter _),
    "q_hopping_window" -> (hoppingWindow _),
    "q_tpch_q7" -> (tpchQ7 _),
    "q_tpch_q16" -> (tpchQ16 _),
    "q_tpch_q17" -> (tpchQ17 _),
    "q_percentile_bracket" -> (percentileBracket _),
    "q_tpch_q20" -> (tpchQ20 _),
    "q_tpch_q21" -> (tpchQ21 _),
    "q_try_arith" -> (tryArith _))
}
