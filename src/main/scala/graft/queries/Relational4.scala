package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import Tables.t

/** Fourth batch — SURVEY §2.8/§2.9 rows that had library coverage
  * but no declared query: the second string-function family
  * (left/right/chr/ascii/bit_length/locate), EXISTS / NOT EXISTS
  * subqueries, and LATERAL struct unnest (UNNEST of array<struct>,
  * the reference's `unnest of struct` row).
  */
object Relational4 {

  /** String functions #2 — the DuckDB-representable remainder of the
    * DF-44 string registry (initcap/overlay/find_in_set/
    * substring_index exist in Spark but not DuckDB 1.0 → exercised
    * in specs, not oracled).
    */
  def stringFuncs2(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part").createOrReplaceTempView("part")
    s.sql("""
      SELECT p_partkey,
             left(p_name, 5) AS l5,
             right(p_name, 5) AS r5,
             chr(CAST(p_partkey % 26 + 65 AS BIGINT)) AS ch,
             CAST(ascii(p_name) AS BIGINT) AS asc0,
             CAST(bit_length(p_name) AS BIGINT) AS bits,
             CAST(locate('al', p_name) AS BIGINT) AS pos_al
      FROM part ORDER BY p_partkey""")
  }

  /** EXISTS / NOT EXISTS correlated subqueries (SURVEY §2.9 row —
    * Catalyst decorrelates both into semi/anti joins; the grouped
    * counts make the result deterministic).
    */
  def subqueryExists(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer")
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql("""
      SELECT c_mktsegment,
             count(*) AS n_customers,
             CAST(sum(CASE WHEN EXISTS (
               SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_with,
             CAST(sum(CASE WHEN NOT EXISTS (
               SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_without
      FROM customer
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  /** LATERAL VIEW explode over an array<struct> (struct unnest):
    * rows → per-order struct list → back to rows through the lateral,
    * field-accessing the struct. Round-trips exactly, so the oracle
    * is DuckDB's native UNNEST of a STRUCT list.
    */
  def lateralStructUnnest(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql("""
      WITH g AS (
        SELECT l_orderkey,
               sort_array(collect_list(named_struct('ln', l_linenumber, 'qty', l_quantity))) AS items
        FROM lineitem GROUP BY l_orderkey)
      SELECT l_orderkey, CAST(item.ln AS BIGINT) AS ln, item.qty AS qty
      FROM g LATERAL VIEW explode(items) ex AS item
      ORDER BY l_orderkey, ln""")
  }

  // ---------------------------------------------------------------- oracle SQL

  val oracle: Map[String, String] = Map(
    "q_string_funcs3" -> """
      SELECT p_partkey,
             left(p_name, 5) AS l5,
             right(p_name, 5) AS r5,
             chr(CAST(p_partkey % 26 + 65 AS INT)) AS ch,
             CAST(ascii(p_name) AS BIGINT) AS asc0,
             CAST(bit_length(p_name) AS BIGINT) AS bits,
             CAST(strpos(p_name, 'al') AS BIGINT) AS pos_al
      FROM part ORDER BY p_partkey""",

    "q_subquery_exists" -> """
      SELECT c_mktsegment,
             count(*) AS n_customers,
             CAST(sum(CASE WHEN EXISTS (
               SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_with,
             CAST(sum(CASE WHEN NOT EXISTS (
               SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_without
      FROM customer
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q_lateral_struct_unnest" -> """
      WITH g AS (
        SELECT l_orderkey,
               list({'ln': l_linenumber, 'qty': l_quantity} ORDER BY l_linenumber, l_quantity) AS items
        FROM lineitem GROUP BY l_orderkey)
      SELECT l_orderkey, CAST(u.ln AS BIGINT) AS ln, u.qty AS qty
      FROM (SELECT l_orderkey, UNNEST(items) AS u FROM g)
      ORDER BY l_orderkey, ln""")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_funcs3" -> (stringFuncs2 _),
    "q_subquery_exists" -> (subqueryExists _),
    "q_lateral_struct_unnest" -> (lateralStructUnnest _))
}
