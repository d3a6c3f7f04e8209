package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.t
import Num.dsumSql

/** Sixth batch — the remaining TPC-H planner-stress shapes: Q5's
  * cyclic join graph, Q13's outer-join count distribution, Q15's
  * aggregated-view global-max scalar subquery, Q19's disjunctive
  * mixed-table predicate, Q4's correlated-expression EXISTS, Q6's
  * pure-pushdown scan, Q8's eight-way tree with a twice-joined
  * dimension, Q12's residual date comparison + conditional counts,
  * Q14's global ratio, and — over a deterministic derived partsupp
  * ([[PartsuppCte]]) — Q2's correlated min, Q9's composite-key
  * profit join, and Q11's grouped-vs-global stock filter. With
  * Q3/Q7/Q10/Q16/Q17/Q18/Q20/Q21/Q22 in Relational4/5 and Q1 as
  * q_agg_groupby, ALL 22 TPC-H query shapes are graded.
  * The reference reaches this whole class through DataFusion's SQL
  * front end (`/root/reference/csvb_engine/src/lib.rs:82-89`); here
  * each shape is the same SQL planned by Catalyst, and the oracle is
  * the identical string on DuckDB.
  */
object Relational6 {

  private[queries] def view(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => t(s, dir, n).createOrReplaceTempView(n))

  /** TPC-H Q5 shape (local-supplier volume): the famous CYCLIC join
    * graph — customer and supplier must land in the same nation, so
    * the join graph has a cycle (orders–customer–nation and
    * lineitem–supplier–nation both reach nation) and the planner's
    * join-order choice decides whether the fact table shuffles once
    * or thrice.
    *
    * Scale: nation/region broadcast (tiny); customer and supplier
    * hash-join against the orders→lineitem chain, which shuffles on
    * its own keys once each; the `c_nationkey = s_nationkey` cycle
    * edge evaluates as a residual on the already-joined row, never a
    * new shuffle. AQE re-plans the build sides at runtime at real SF.
    */
  def tpchQ5(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    s.sql(TpchQ5Sql)
  }

  private val TpchQ5Sql = s"""
      SELECT n_name, ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""

  /** TPC-H Q13 shape (customer order-count distribution): a LEFT
    * OUTER join whose ON clause carries a filter on the NULL-side
    * table (pushing it below the join would wrongly drop customers;
    * keeping it in the ON preserves them with count 0), then a
    * second aggregation over the first's output — the
    * count-of-counts histogram.
    *
    * Scale: both aggregations key on grouping outputs of bounded
    * cardinality (custkey, then the count value); the outer join
    * shuffles each side once on custkey and the histogram reuses a
    * tiny exchange. No skew risk: order counts are near-uniform.
    */
  def tpchQ13(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "customer", "orders")
    s.sql(TpchQ13Sql)
  }

  private val TpchQ13Sql = """
      SELECT c_count, count(*) AS custdist
      FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey) c_orders
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC"""

  /** TPC-H Q15 shape (top supplier): a revenue aggregation consumed
    * TWICE — once joined to supplier, once reduced to a global max
    * inside a scalar subquery that filters the first consumption.
    * Stresses scalar-subquery planning over a shared aggregated
    * subtree (Catalyst evaluates the max as a one-row build side,
    * not per-row re-execution).
    *
    * The equality filter compares the ROUNDED decimal-sum double on
    * both sides, so the Spark and DuckDB maxima are bit-identical by
    * construction (same contract every shared-SQL query here uses).
    *
    * Scale: revenue is a partial→final aggregate on l_suppkey; the
    * max is one extra reduce over that aggregate's output (thousands
    * of rows, not the fact table), and its single-row result
    * broadcasts into the filter.
    */
  def tpchQ15(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "supplier", "lineitem")
    s.sql(TpchQ15Sql)
  }

  private val TpchQ15Sql = s"""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      ORDER BY s_suppkey"""

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicate): a
    * three-arm OR whose arms each mix columns from BOTH join sides.
    * The planner must extract the common join key, push the
    * single-table conjuncts it can factor out of the disjunction
    * down to each scan, and evaluate the rest as a join residual —
    * the classic CNF-extraction stress.
    *
    * Scale: part is the broadcast side; the factored part-side
    * disjunction (brand IN ... AND size <= 15) prunes the build
    * before broadcast, and the lineitem scan keeps only the quantity
    * range union. One broadcast hash join, zero shuffles of the fact.
    */
  def tpchQ19(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "lineitem", "part")
    s.sql(TpchQ19Sql)
  }

  private val TpchQ19Sql = s"""
      SELECT ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 5
               AND l_quantity >= 1  AND l_quantity <= 11)
         OR (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 10
               AND l_quantity >= 10 AND l_quantity <= 20)
         OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 20 AND l_quantity <= 30)"""

  /** Heavy hitters via a mergeable Misra-Gries sketch
    * ([[graft.functions.MisraGries]]): ONE pass over a 120k-token
    * stream with at most k=100 counters per partial aggregate —
    * the bounded-memory form of "which keys dominate the corpus"
    * (an exact groupBy shuffles every distinct key; the sketch
    * shuffles k-entry maps). The fixture keys are near-uniform, so
    * the stream interleaves 3 genuinely heavy tokens (returnflag
    * values, ~15-30k each) among ~2k light ones (partkeys, ~30
    * each) — real skew, deterministic.
    *
    * Graded by the MG theorems, not the sketch values (the
    * q_agg_approx design): every token with true frequency above
    * 2·n/(k+1) must be PRESENT in the sketch with an estimate in
    * [true - n/(k+1), true]; both hold for ANY partitioning / merge
    * order, so the booleans are deterministic and the oracle pins
    * them true next to the exact counts (which hash-compare).
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "lineitem")
    val K = 100
    val toks = s.sql(HhToksSql)
    val mg = org.apache.spark.sql.functions.udaf(new graft.functions.MisraGries(K))
    // sketch + stream length in ONE job; the k-entry map collects to
    // the driver by design — it IS the bounded summary
    val head = toks.agg(mg(col("tok")).as("sketch"), count(col("tok")).as("n")).head()
    val sketch = head.getMap[String, Long](0).toMap
    val n = head.getLong(1)
    val bound = n.toDouble / (K + 1)
    val est = element_at(typedlit(sketch), col("tok"))
    toks.groupBy("tok").agg(count(lit(1)).as("exact_count"))
      .filter(col("exact_count") >= 2.0 * bound)
      .select(col("tok"), col("exact_count"),
        est.isNotNull.as("found"),
        (est.isNotNull && est <= col("exact_count") &&
          (col("exact_count") - est) <= lit(bound)).as("est_ok"))
      .orderBy("tok")
  }

  /** Mergeable-sketch-as-a-column: per-(returnflag, linestatus)
    * Datasketches HLL sketches built ONCE (`hll_sketch_agg`, the
    * level a 100 TB pipeline stores per partition/day as a binary
    * column), then RE-AGGREGATED to the returnflag level by merging
    * the stored sketches (`hll_union_agg`) — no second corpus scan.
    * This is the capability `approx_count_distinct` (q_agg_approx)
    * lacks: its HLL++ state is consumed inside one aggregation,
    * while a persisted sketch column answers every coarser rollup
    * later — the union is exact over sketches, and distinct counts
    * are NOT additive across groups (sub-group sketches share
    * partkeys), so the merge is doing real work.
    *
    * Graded by the sketch contract (the q_agg_approx design): the
    * merged estimate must land within 2% of the exact distinct count
    * (lgConfigK = 14 ⇒ ~0.8% typical relative error; deterministic —
    * Datasketches HLL has no RNG, so the boolean is stable), with the
    * exact counts hash-compared.
    */
  def aggSketchColumn(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_partkey"))
    val sketches = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_partkey"), lit(14)).as("sk"))
    val merged = sketches.groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est_parts"),
        count(lit(1)).as("n_sketches"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    merged.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n_sketches"), col("exact_parts"),
        (abs(col("est_parts") - col("exact_parts")) <= col("exact_parts") * lit(0.02))
          .as("merged_within_2pct"))
      .orderBy("l_returnflag")
  }

  private val AggSketchColumnOracleSql = """
      SELECT l_returnflag,
             CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_sketches,
             CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             true AS merged_within_2pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Probe keys for the CMS point estimates — shared with the
    * oracle's VALUES list.
    */
  private val CmsProbeKeys = Seq(1L, 2L, 3L, 19L, 97L)

  /** Count-min sketch as a mergeable column
    * ([[graft.operators.Sketches]]): per-(returnflag, linestatus)
    * frequency sketches over partkeys, MERGED across linestatus by
    * count linearity, then point-estimated for a fixed probe set.
    * Unlike the HLL sibling (q_agg_sketch_column, contract booleans
    * only), the universal-hash family is plain BIGINT arithmetic, so
    * the DuckDB oracle rebuilds the identical sketch and the
    * estimates grade EXACTLY — build, merge, and min-over-depth all
    * replay. `never_under` pins the CMS one-sided-error law.
    *
    * Scale: the sketch relation is groups×depth×width rows no matter
    * the corpus (map-side combine collapses the depth-fold explode
    * inside the scan stage); merging is a sum over that bounded
    * frame; probes broadcast.
    */
  def aggCms(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_partkey"))
    val perStatus = Sketches.cmsSketch(li, Seq("l_returnflag", "l_linestatus"), col("l_partkey"))
    val merged = Sketches.cmsMerge(perStatus, Seq("l_returnflag"))
    val nSk = li.select(col("l_returnflag"), col("l_linestatus")).distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_sketches"))
    val probes = li.select(col("l_returnflag")).distinct()
      .crossJoin(CmsProbeKeys.toDF("probe_key"))
    val est = Sketches.cmsEstimate(merged, Seq("l_returnflag"), probes, "probe_key")
    val exact = li.filter(col("l_partkey").isin(CmsProbeKeys: _*))
      .groupBy(col("l_returnflag"), col("l_partkey").as("probe_key"))
      .agg(count(lit(1)).as("exact_cnt"))
    est.join(nSk, "l_returnflag")
      .join(exact, Seq("l_returnflag", "probe_key"), "left")
      .select(col("l_returnflag"), col("probe_key"), col("n_sketches"),
        coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"), col("cms_est"),
        (col("cms_est") >= coalesce(col("exact_cnt"), lit(0L))).as("never_under"))
      .orderBy("l_returnflag", "probe_key")
  }

  private def aggCmsOracleSql: String = {
    import graft.operators.Sketches._
    s"""WITH h AS (SELECT j, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
             FROM (VALUES $cmsHashValuesSql) t(j, a, b)),
      keys AS (SELECT CAST(k AS BIGINT) AS k
             FROM (VALUES ${CmsProbeKeys.map(k => s"($k)").mkString(", ")}) t(k)),
      li AS (SELECT l_returnflag, l_linestatus, l_partkey FROM lineitem),
      sk AS (SELECT l_returnflag, j,
               ((l_partkey % $CmsP) * a + b) % $CmsP % $CmsW AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
             FROM li CROSS JOIN h GROUP BY 1, 2, 3),
      fl AS (SELECT DISTINCT l_returnflag FROM li),
      ns AS (SELECT l_returnflag, CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_sketches
             FROM li GROUP BY 1),
      pb AS (SELECT fl.l_returnflag, k.k, h.j,
               ((k.k % $CmsP) * h.a + h.b) % $CmsP % $CmsW AS bucket
             FROM fl CROSS JOIN keys k CROSS JOIN h),
      est AS (SELECT pb.l_returnflag, pb.k,
                CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS cms_est
              FROM pb LEFT JOIN sk ON sk.l_returnflag = pb.l_returnflag
                AND sk.j = pb.j AND sk.bucket = pb.bucket
              GROUP BY 1, 2),
      ex AS (SELECT l_returnflag, l_partkey AS k, CAST(count(*) AS BIGINT) AS exact_cnt
             FROM li WHERE l_partkey IN (${CmsProbeKeys.mkString(", ")}) GROUP BY 1, 2)
      SELECT e.l_returnflag AS l_returnflag, CAST(e.k AS BIGINT) AS probe_key, ns.n_sketches,
        coalesce(ex.exact_cnt, 0) AS exact_cnt, e.cms_est,
        e.cms_est >= coalesce(ex.exact_cnt, 0) AS never_under
      FROM est e
      JOIN ns ON ns.l_returnflag = e.l_returnflag
      LEFT JOIN ex ON ex.l_returnflag = e.l_returnflag AND ex.k = e.k
      ORDER BY l_returnflag, probe_key"""
  }

  private[queries] val HhToksSql = """
      SELECT l_returnflag AS tok FROM lineitem
      UNION ALL
      SELECT CAST(l_partkey AS STRING) AS tok FROM lineitem"""

  private[queries] val HeavyHittersOracleSql = s"""
      WITH toks AS ($HhToksSql),
      tot AS (SELECT count(*) AS n FROM toks)
      SELECT tok, count(*) AS exact_count, true AS found, true AS est_ok
      FROM toks, tot
      GROUP BY tok, n
      HAVING count(*) >= 2.0 * n / 101
      ORDER BY tok"""

  /** TPC-H Q4 shape (order-priority checking): an EXISTS whose inner
    * predicate references the OUTER row inside an arithmetic
    * expression (`l_shipdate > o_orderdate + 60 days`), not just the
    * correlation key — the decorrelator must keep the non-key
    * conjunct as a join condition on the semi join, not try to push
    * it to the inner scan. (The fixture lineitem carries no
    * commitdate/receiptdate, so lateness is expressed against the
    * order date — same EXISTS-with-expression shape as spec Q4.)
    *
    * Scale: plans as one LeftSemi hash join on l_orderkey with the
    * date expression as a residual; orders' quarter filter prunes the
    * probe side before the shuffle, lineitem shuffles once on its
    * join key. No per-row subquery re-execution.
    */
  def tpchQ4(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "orders", "lineitem")
    s.sql(TpchQ4Sql)
  }

  private val TpchQ4Sql = """
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1996-04-01'
        AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""

  /** TPC-H Q6 shape (forecasting revenue change): the canonical
    * pure-scan query — no join, three range predicates, one sum.
    * Its whole value is the pushdown story: every conjunct must
    * reach the parquet reader as a PushedFilter and the scan must
    * read exactly four columns; anything else is wasted I/O at
    * 100 TB.
    *
    * Scale: map-side partial sum → one-row final; no shuffle of data
    * rows at all. The scan is the query.
    */
  def tpchQ6(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "lineitem")
    s.sql(TpchQ6Sql)
  }

  private val TpchQ6Sql = s"""
      SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.04 AND 0.06
        AND l_quantity < 24"""

  /** TPC-H Q8 shape (national market share): the deepest join tree
    * in the suite — EIGHT relations including nation joined TWICE
    * under different roles (customer's vs supplier's), then a
    * conditional-share aggregation (sum(CASE)/sum) over the joined
    * volume. Stresses self-join aliasing and join-order search width.
    *
    * Both sums route through the decimal contract ([[Num.dsumSql]]),
    * so numerator and denominator are engine-exact doubles and their
    * quotient is bit-deterministic before the final round.
    *
    * Scale: part/supplier/customer/nation/region all broadcast
    * (dimension tables); lineitem→orders is the only
    * shuffle-shuffle join, each side exchanged once on the order
    * key. The CASE share folds into the same partial aggregate —
    * no second pass over the fact.
    */
  def tpchQ8(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "part", "supplier", "lineitem", "orders", "customer", "nation", "region")
    s.sql(TpchQ8Sql)
  }

  private val TpchQ8Sql = s"""
      SELECT o_year,
             round(${dsumSql("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END")} /
                   ${dsumSql("volume")}, 6) AS mkt_share
      FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1.0 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31') all_nations
      GROUP BY o_year
      ORDER BY o_year"""

  /** TPC-H Q12 shape (shipping-mode priority): a fact-side join with
    * a correlated date window in the WHERE (ship within a year AND
    * more than 30 days after its order — the order-vs-line date
    * comparison is the Q12 lateness predicate re-expressed on the
    * fixture's columns; no shipmode column exists, so l_linestatus
    * plays the grouping role) and the classic paired conditional
    * counts. `count(CASE WHEN .. THEN 1 END)` rather than
    * `sum(CASE..0 END)` keeps both engines in BIGINT (DuckDB widens
    * integer SUM to HUGEINT, which would diverge the schema).
    *
    * Scale: one shuffle each side on the order key; the
    * l_shipdate-vs-o_orderdate comparison is a post-join residual
    * (it references both sides), while the absolute year window
    * pushes to the lineitem scan. Conditional counts fold into one
    * partial aggregate.
    */
  def tpchQ12(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "orders", "lineitem")
    s.sql(TpchQ12Sql)
  }

  private val TpchQ12Sql = """
      SELECT l_linestatus,
             count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
             count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
        AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      GROUP BY l_linestatus
      ORDER BY l_linestatus"""

  /** TPC-H Q14 shape (promotion effect): the global-ratio aggregate —
    * promo revenue over total revenue in one month, emitted with the
    * two decimal-contract components next to the rounded percentage
    * so the grading hash pins all three.
    *
    * Scale: part broadcasts into the month-pruned lineitem scan (one
    * broadcast hash join, no fact shuffle); both CASE arms fold into
    * a single partial aggregate producing one row.
    */
  def tpchQ14(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "lineitem", "part")
    s.sql(TpchQ14Sql)
  }

  private val PromoArm = "CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END"

  private val TpchQ14Sql = s"""
      SELECT ${dsumSql(PromoArm)} AS promo_revenue,
             ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_revenue,
             round(100.0 * ${dsumSql(PromoArm)} /
                   ${dsumSql("l_extendedprice * (1.0 - l_discount)")}, 4) AS promo_pct
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        AND l_shipdate <  TIMESTAMP '1996-10-01'"""

  /** The fixture ships no partsupp table, so the three TPC-H queries
    * that need one (Q2/Q9/Q11) run over a DERIVED partsupp: a
    * deterministic modular expansion of part × a 4-row series, with
    * availqty/supplycost as pure integer-hash functions of the keys.
    * The SAME CTE text executes on both engines (the q_values_inline
    * / echo-wave precedent: derived inputs are fine when the oracle
    * derives them identically), so the grade still measures the
    * planner shapes — correlated min, six-way profit join, grouped
    * HAVING vs global scalar — not the data source. Keys are 0-based
    * contiguous in the fixture (checked), so `% n` lands on real
    * suppliers; the 4 k-offsets are distinct mod any fleet size > 52.
    * supplycost is CAST to DOUBLE inside the CTE — Spark's decimal
    * literal inference would otherwise type it DECIMAL while DuckDB
    * emits DOUBLE, failing the schema compare.
    *
    * Scale note: partsupp materializes 4 rows per part — at real SF
    * that is a parts-sized table (never fact-sized), built by a
    * broadcast of the 1-row count and a 4-row series join: no
    * shuffle. DuckDB and Spark both constant-fold the series.
    */
  private val PartsuppCte = """
      ks AS (SELECT 0 AS k UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
      ns AS (SELECT count(*) AS n FROM supplier),
      partsupp AS (
        SELECT p_partkey AS ps_partkey,
               CAST((p_partkey * 7 + k * 13 + 1) % n AS BIGINT) AS ps_suppkey,
               CAST(1 + (p_partkey * 13 + k * 37) % 9999 AS INT) AS ps_availqty,
               CAST(round(1.0 + ((p_partkey * 31 + k * 101) % 10000) / 100.0, 2) AS DOUBLE) AS ps_supplycost
        FROM part, ns, ks)"""

  /** TPC-H Q2 shape (minimum-cost supplier): the classic correlated
    * scalar MIN whose inner block repeats a four-way join of the
    * OUTER query's own tables — the decorrelator must turn it into
    * an aggregated join on ps_partkey, not re-run a join pipeline
    * per outer row. The ORDER BY is a total order (acctbal, nation,
    * supplier name, part key), so the LIMIT is deterministic at any
    * SF.
    *
    * Scale: the inner min-cost-per-part aggregate is partsupp-sized
    * (4/part), joins back on p_partkey; region/nation broadcast
    * everywhere. No fact table involved at all.
    */
  def tpchQ2(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "part", "supplier", "nation", "region")
    s.sql(TpchQ2Sql)
  }

  private val TpchQ2Sql = s"""
      WITH $PartsuppCte
      SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
      FROM part, supplier, partsupp, nation, region
      WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
        AND ps_supplycost = (
          SELECT min(ps_supplycost)
          FROM partsupp, supplier, nation, region
          WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
            AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100"""

  /** TPC-H Q9 shape (product-type profit): the six-way join where
    * partsupp joins the fact on a COMPOSITE key (suppkey AND
    * partkey) while part and supplier each join on one half of it —
    * the join-graph shape that punishes a planner into either a
    * diamond re-shuffle or (correctly) reusing the fact's existing
    * partitioning. Profit subtracts a partsupp attribute from a
    * lineitem expression, so the columns must genuinely meet.
    *
    * Scale: part/supplier/nation/partsupp are all dimension-sized
    * broadcasts; lineitem→orders is the one exchange pair. The
    * '%red%' name filter prunes part before broadcast and
    * transitively the fact rows at the join.
    */
  def tpchQ9(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "part", "supplier", "lineitem", "orders", "nation")
    s.sql(TpchQ9Sql)
  }

  private val TpchQ9Sql = s"""
      WITH $PartsuppCte
      SELECT nation, o_year, ${dsumSql("amount")} AS sum_profit
      FROM (
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1.0 - l_discount) - ps_supplycost * l_quantity AS amount
        FROM part, supplier, lineitem, partsupp, orders, nation
        WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
          AND p_partkey = l_partkey AND o_orderkey = l_orderkey
          AND s_nationkey = n_nationkey AND p_name LIKE '%red%') profit
      GROUP BY nation, o_year
      ORDER BY nation, o_year DESC"""

  /** TPC-H Q11 shape (important stock): a grouped aggregate filtered
    * against a SECOND, global aggregation of the same joined input —
    * the grouped-HAVING-vs-global-scalar pattern. Catalyst plans the
    * scalar as a one-row broadcast into the post-aggregation filter;
    * the shared partsupp⋈supplier⋈nation subtree is evaluated
    * twice by both engines (neither CSEs across subquery
    * boundaries), which is the honest cost of the SQL shape.
    *
    * NATION_3 holds a supplier at every fixture SF (sf0.001's fleet
    * is 10 suppliers over 10 distinct nations), so the result is
    * non-degenerate everywhere.
    */
  def tpchQ11(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "part", "supplier", "nation")
    s.sql(TpchQ11Sql)
  }

  private val TpchQ11Sql = s"""
      WITH $PartsuppCte
      SELECT ps_partkey, value
      FROM (
        SELECT ps_partkey, ${dsumSql("ps_supplycost * ps_availqty")} AS value
        FROM partsupp, supplier, nation
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        GROUP BY ps_partkey) grouped
      WHERE value > (
        SELECT ${dsumSql("ps_supplycost * ps_availqty")} * 0.005
        FROM partsupp, supplier, nation
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3')
      ORDER BY value DESC, ps_partkey"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_heavy_hitters" -> (heavyHitters _),
    "q_agg_sketch_column" -> (aggSketchColumn _),
    "q_agg_cms" -> (aggCms _),
    "q_tpch_q2"  -> (tpchQ2 _),
    "q_tpch_q9"  -> (tpchQ9 _),
    "q_tpch_q11" -> (tpchQ11 _),
    "q_tpch_q4"  -> (tpchQ4 _),
    "q_tpch_q5"  -> (tpchQ5 _),
    "q_tpch_q6"  -> (tpchQ6 _),
    "q_tpch_q8"  -> (tpchQ8 _),
    "q_tpch_q12" -> (tpchQ12 _),
    "q_tpch_q13" -> (tpchQ13 _),
    "q_tpch_q14" -> (tpchQ14 _),
    "q_tpch_q15" -> (tpchQ15 _),
    "q_tpch_q19" -> (tpchQ19 _))

  val oracle: Map[String, String] = Map(
    "q_heavy_hitters" -> HeavyHittersOracleSql,
    "q_agg_sketch_column" -> AggSketchColumnOracleSql,
    "q_agg_cms" -> aggCmsOracleSql,
    "q_tpch_q2"  -> TpchQ2Sql,
    "q_tpch_q9"  -> TpchQ9Sql,
    "q_tpch_q11" -> TpchQ11Sql,
    "q_tpch_q4"  -> TpchQ4Sql,
    "q_tpch_q5"  -> TpchQ5Sql,
    "q_tpch_q6"  -> TpchQ6Sql,
    "q_tpch_q8"  -> TpchQ8Sql,
    "q_tpch_q12" -> TpchQ12Sql,
    "q_tpch_q13" -> TpchQ13Sql,
    "q_tpch_q14" -> TpchQ14Sql,
    "q_tpch_q15" -> TpchQ15Sql,
    "q_tpch_q19" -> TpchQ19Sql)
}
