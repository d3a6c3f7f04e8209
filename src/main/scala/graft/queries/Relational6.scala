package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.t
import Num.dsumSql

/** Sixth batch — the remaining TPC-H planner-stress shapes the
  * fixture tables can express (no partsupp in the fixtures, so
  * Q2/Q9/Q11 are out of reach): Q5's cyclic join graph, Q13's
  * outer-join count distribution, Q15's aggregated-view global-max
  * scalar subquery, and Q19's disjunctive mixed-table predicate.
  * The reference reaches this whole class through DataFusion's SQL
  * front end (`/root/reference/csvb_engine/src/lib.rs:82-89`); here
  * each shape is the same SQL planned by Catalyst, and the oracle is
  * the identical string on DuckDB.
  */
object Relational6 {

  private def view(s: SparkSession, dir: String, names: String*): Unit =
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

  private val HhToksSql = """
      SELECT l_returnflag AS tok FROM lineitem
      UNION ALL
      SELECT CAST(l_partkey AS STRING) AS tok FROM lineitem"""

  private val HeavyHittersOracleSql = s"""
      WITH toks AS ($HhToksSql),
      tot AS (SELECT count(*) AS n FROM toks)
      SELECT tok, count(*) AS exact_count, true AS found, true AS est_ok
      FROM toks, tot
      GROUP BY tok, n
      HAVING count(*) >= 2.0 * n / 101
      ORDER BY tok"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_heavy_hitters" -> (heavyHitters _),
    "q_tpch_q5"  -> (tpchQ5 _),
    "q_tpch_q13" -> (tpchQ13 _),
    "q_tpch_q15" -> (tpchQ15 _),
    "q_tpch_q19" -> (tpchQ19 _))

  val oracle: Map[String, String] = Map(
    "q_heavy_hitters" -> HeavyHittersOracleSql,
    "q_tpch_q5"  -> TpchQ5Sql,
    "q_tpch_q13" -> TpchQ13Sql,
    "q_tpch_q15" -> TpchQ15Sql,
    "q_tpch_q19" -> TpchQ19Sql)
}
