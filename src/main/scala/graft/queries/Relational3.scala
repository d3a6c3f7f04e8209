package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.t

/** Third batch: the remaining SURVEY §2.8 scalar families — array
  * manipulation + higher-order functions, struct/map construction
  * and access, binary encode/decode, string predicates, date
  * arithmetic, and the math stragglers (cbrt/factorial).
  */
object Relational3 {

  /** Array manipulation sweep #2: position/remove/repeat/slice/
    * flatten/overlap + higher-order transform/filter/exists.
    * Array-typed results are stringified (array_join) so the
    * driver's pandas hash-comparator sees scalar columns — same
    * pattern as arrayFuncs's items_str.
    */
  def arrayFuncs2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_linenumber"))).as("items"))
      .select(
        col("l_orderkey"),
        array_position(col("items"), 2).cast("long").as("pos2"),
        array_join(expr("filter(items, x -> x <> 1)"), ",").as("no1"),
        array_join(expr("transform(items, x -> CAST(x AS BIGINT) * 10)"), ",").as("x10"),
        expr("exists(items, x -> x >= 5)").as("has5plus"),
        array_join(slice(col("items"), 1, 2), ",").as("first2"),
        array_join(flatten(array(col("items"), array(lit(99)))), ",").as("flat"),
        arrays_overlap(col("items"), array(lit(3), lit(4))).as("ovl"),
        array_join(array_repeat(col("l_orderkey"), 2), ",").as("rep2"))
      .orderBy("l_orderkey")

  /** The `array_replace[_n/_all]` / `array_resize` REWRITES SURVEY
    * §2.8 flags (DataFusion ships them as builtins; Spark expresses
    * them as `transform()` lambdas — the codegen'd higher-order
    * route, no UDF):
    *  - replace_all   → element lambda CASE
    *  - replace first → index lambda vs `array_position`
    *  - replace_n     → index lambda + prefix-occurrence count
    *    (`filter(slice(l, 1, i+1), …)` — O(len²) per ROW, fine for
    *    bounded arrays; occurrence semantics, not position)
    *  - resize        → `slice` / `concat(array_repeat)` branch
    * Deterministic repeat-heavy fixture (`x % 3` over a sequence)
    * so every rewrite has work to do on every row. The oracle uses
    * DuckDB's NATIVE `list_resize` for resize and rebuilds the
    * replace family positionally (parallel unnest +
    * generate_subscripts + ranked rebuild) — a genuinely independent
    * recomputation, not the same lambda re-typed. Arrays stringify
    * (array_join) for the scalar hash-comparator, the arrayFuncs
    * house pattern.
    */
  def arrayFuncs3(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 400)
      .select(col("o_orderkey").cast("long").as("o_orderkey"),
        expr("transform(sequence(1, 2 + CAST(o_orderkey % 6 AS INT)), x -> CAST(x % 3 AS BIGINT))")
          .as("l"))
      .select(
        col("o_orderkey"),
        array_join(col("l"), ",").as("src"),
        array_join(expr(
          "transform(l, x -> CASE WHEN x = 1 THEN CAST(9 AS BIGINT) ELSE x END)"), ",")
          .as("replaced_all"),
        array_join(expr(
          """transform(l, (x, i) ->
             CASE WHEN CAST(i AS BIGINT) + 1 = array_position(l, 1)
                  THEN CAST(9 AS BIGINT) ELSE x END)"""), ",")
          .as("replaced_first"),
        array_join(expr(
          """transform(l, (x, i) ->
             CASE WHEN x = 1 AND size(filter(slice(l, 1, i + 1), y -> y = 1)) <= 2
                  THEN CAST(9 AS BIGINT) ELSE x END)"""), ",")
          .as("replaced_n2"),
        array_join(expr(
          """CASE WHEN size(l) >= 4 THEN slice(l, 1, 4)
                  ELSE concat(l, array_repeat(CAST(0 AS BIGINT), 4 - size(l))) END"""), ",")
          .as("resized4"))
      .orderBy("o_orderkey")

  /** Struct construction + field access, map construction + key
    * access / keys / values / cardinality — scalar outputs only so
    * the oracle compares plain columns.
    */
  def structMap(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .select(
        col("n_nationkey").cast("long").as("nk"),
        struct(col("n_name").as("name"), col("n_regionkey").as("rk")).as("st"),
        map(lit("name"), col("n_name"), lit("key"), col("n_nationkey").cast("string")).as("m"))
      .select(
        col("nk"),
        col("st.name").as("s_name"),
        col("st.rk").cast("long").as("s_rk"),
        element_at(col("m"), "name").as("m_name"),
        map_keys(col("m")).as("mk"),
        size(map_values(col("m"))).cast("long").as("n_vals"))
      .select(
        col("nk"), col("s_name"), col("s_rk"), col("m_name"),
        array_join(sort_array(col("mk")), ",").as("keys_sorted"),
        col("n_vals"))
      .orderBy("nk")

  /** Binary encode/decode: utf8 bytes, base64 round-trip, hex/unhex. */
  def encodeBinary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region")
      .select(
        col("r_regionkey").cast("long").as("rk"),
        base64(encode(col("r_name"), "UTF-8")).as("b64"),
        decode(unbase64(base64(encode(col("r_name"), "UTF-8"))), "UTF-8").as("roundtrip"),
        hex(encode(col("r_name"), "UTF-8")).as("hx"),
        decode(unhex(hex(encode(col("r_name"), "UTF-8"))), "UTF-8").as("unhexed"),
        length(encode(col("r_name"), "UTF-8")).cast("long").as("n_bytes"))
      .orderBy("rk")

  /** String predicate sweep: contains/startswith/endswith/LIKE/ILIKE/rlike. */
  def stringPredicates(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        col("p_type").contains("BRASS").as("has_brass"),
        col("p_type").startsWith("STANDARD").as("std"),
        col("p_type").endsWith("TIN").as("tin"),
        col("p_name").like("%al%").as("lk"),
        col("p_name").ilike("%AL%").as("ilk"),
        col("p_brand").rlike("Brand#[0-9]+").as("rl"))
      .orderBy("p_partkey")

  /** Date arithmetic: make_date, day diffs, comparisons, truncation. */
  def dateArith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("month_start"),
        datediff(to_date(col("o_orderdate")), make_date(year(col("o_orderdate")), lit(1), lit(1)))
          .cast("long").as("day_of_year0"),
        (to_date(col("o_orderdate")) > lit("1997-06-01").cast("date")).as("late"))
      .orderBy("o_orderkey")

  /** PIVOT: orders count + decimal-exact totals per priority,
    * pivoted on order status. (Beyond the reference's DF-44 surface
    * — included for engine usefulness; oracle via CASE aggregation.)
    */
  def pivotStatus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(
        col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("o_orderpriority")

  /** gcd/lcm — the SURVEY-flagged gap (DF-44 builtins Spark lacks),
    * filled by native codegen expressions
    * (org.apache.spark.sql.graft.{Gcd,Lcm}).
    */
  def gcdLcm(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{Gcd, Lcm}
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        Gcd(col("p_partkey"), col("p_size").cast("long")).as("g"),
        Lcm(col("p_size").cast("long"), lit(6L)).as("l"),
        Gcd(lit(0L), col("p_partkey")).as("g0"))
      .orderBy("p_partkey")
  }

  /** Math stragglers: cbrt + factorial. */
  def mathFuncs2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        round(cbrt(col("p_retailprice")), 6).as("cb"),
        factorial(col("p_size") % 15).as("fact"))
      .orderBy("p_partkey")

  /** Date functions #2: month truncation, last_day, quarter,
    * normalized day-of-week, date sequences.
    */
  def dateFuncs2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        trunc(to_date(col("o_orderdate")), "MM").as("mstart"),
        last_day(to_date(col("o_orderdate"))).as("mend"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        // Spark dayofweek: Sunday=1 → normalize to ISO-ish Monday=0
        ((dayofweek(col("o_orderdate")) + lit(5)) % lit(7)).cast("long").as("dow_mon0"),
        size(expr("sequence(trunc(to_date(o_orderdate), 'MM'), last_day(to_date(o_orderdate)), interval 1 day)"))
          .cast("long").as("days_in_month"))
      .orderBy("o_orderkey")

  /** Aggregates over all-NULL / empty groups (3VL aggregate laws):
    * sum/min/max of NULL-only groups are NULL, count is 0.
    */
  def nullAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderstatus"),
        when(col("o_orderstatus") === "O", lit(null).cast("double"))
          .otherwise(col("o_totalprice")).as("tp"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("tp")).as("n_vals"),
        Num.dsum(col("tp")).as("s"),
        min(col("tp")).as("mn"),
        max(col("tp")).as("mx"),
        countDistinct(col("tp")).as("nd"))
      .orderBy("o_orderstatus")

  /** Integer division / modulo semantics — the cross-engine trap
    * FIXTURES.md flags (`/` on ints is float division in DuckDB,
    * integer division in Spark): exercised with the explicit
    * operators that DO agree (div // and %).
    */
  def intArith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        expr("l_partkey div 7").as("idiv"),
        (col("l_partkey") % lit(7)).cast("long").as("imod"),
        ((lit(0) - col("l_partkey")) % lit(7)).cast("long").as("negmod"),
        (col("l_partkey").cast("double") / lit(7.0)).as("fdiv"),
        pmod(lit(0) - col("l_partkey"), lit(7)).cast("long").as("posmod"))
      .orderBy("l_orderkey", "l_linenumber")

  // ---------------------------------------------------------------- oracle SQL

  val oracle: Map[String, String] = Map(
    "q_array_funcs2" -> """
      WITH g AS (SELECT l_orderkey, list(l_linenumber ORDER BY l_linenumber) AS items
                 FROM lineitem GROUP BY l_orderkey)
      SELECT l_orderkey,
             CAST(list_position(items, 2) AS BIGINT) AS pos2,
             coalesce(array_to_string(list_filter(items, x -> x <> 1), ','), '') AS no1,
             coalesce(array_to_string(list_transform(items, x -> CAST(x AS BIGINT) * 10), ','), '') AS x10,
             len(list_filter(items, x -> x >= 5)) > 0 AS has5plus,
             coalesce(array_to_string(items[1:2], ','), '') AS first2,
             coalesce(array_to_string(list_concat(items, [99]), ','), '') AS flat,
             len(list_intersect(items, [3, 4])) > 0 AS ovl,
             coalesce(array_to_string([l_orderkey, l_orderkey], ','), '') AS rep2
      FROM g ORDER BY l_orderkey""",

    // independent positional rebuild: parallel unnest +
    // generate_subscripts, occurrence rank, ordered list() —
    // resize via DuckDB's NATIVE list_resize
    "q_array_funcs3" -> """
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               list_transform(range(1, 3 + CAST(o_orderkey % 6 AS INT)),
                              x -> CAST(x % 3 AS BIGINT)) AS l
        FROM orders WHERE o_orderkey < 400),
      ex AS (SELECT o_orderkey, unnest(l) AS x, generate_subscripts(l, 1) AS i FROM base),
      occ AS (SELECT o_orderkey, x, i,
                     row_number() OVER (PARTITION BY o_orderkey, x ORDER BY i) AS r
              FROM ex),
      reb AS (SELECT o_orderkey,
                array_to_string(list(CASE WHEN x = 1 THEN 9 ELSE x END ORDER BY i), ',') AS replaced_all,
                array_to_string(list(CASE WHEN x = 1 AND r = 1 THEN 9 ELSE x END ORDER BY i), ',') AS replaced_first,
                array_to_string(list(CASE WHEN x = 1 AND r <= 2 THEN 9 ELSE x END ORDER BY i), ',') AS replaced_n2
              FROM occ GROUP BY o_orderkey)
      SELECT b.o_orderkey,
             array_to_string(b.l, ',') AS src,
             r.replaced_all, r.replaced_first, r.replaced_n2,
             -- list_resize's 3-arg fill form hits a DuckDB 1.0 crash
             -- (std::bad_array_new_length) on non-constant lists from
             -- a parquet scan; NULL-fill + coalesce is the same op
             array_to_string(list_transform(list_resize(b.l, 4), x -> coalesce(x, 0)), ',') AS resized4
      FROM base b JOIN reb r USING (o_orderkey)
      ORDER BY b.o_orderkey""",

    "q_struct_map" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS nk,
             n_name AS s_name,
             CAST(n_regionkey AS BIGINT) AS s_rk,
             n_name AS m_name,
             'key,name' AS keys_sorted,
             CAST(2 AS BIGINT) AS n_vals
      FROM nation ORDER BY nk""",

    "q_encode_binary" -> """
      SELECT CAST(r_regionkey AS BIGINT) AS rk,
             base64(encode(r_name)) AS b64,
             decode(from_base64(base64(encode(r_name)))) AS roundtrip,
             hex(r_name) AS hx,
             decode(unhex(hex(r_name))) AS unhexed,
             CAST(octet_length(encode(r_name)) AS BIGINT) AS n_bytes
      FROM region ORDER BY rk""",

    "q_string_predicates" -> """
      SELECT p_partkey,
             contains(p_type, 'BRASS') AS has_brass,
             starts_with(p_type, 'STANDARD') AS std,
             ends_with(p_type, 'TIN') AS tin,
             p_name LIKE '%al%' AS lk,
             p_name ILIKE '%AL%' AS ilk,
             regexp_matches(p_brand, 'Brand#[0-9]+') AS rl
      FROM part ORDER BY p_partkey""",

    "q_date_arith" -> """
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) AS d,
             make_date(CAST(date_part('year', o_orderdate) AS INT),
                       CAST(date_part('month', o_orderdate) AS INT), 1) AS month_start,
             CAST(date_diff('day',
               make_date(CAST(date_part('year', o_orderdate) AS INT), 1, 1),
               CAST(o_orderdate AS DATE)) AS BIGINT) AS day_of_year0,
             CAST(o_orderdate AS DATE) > DATE '1997-06-01' AS late
      FROM orders ORDER BY o_orderkey""",

    "q_date_funcs2" -> """
      SELECT o_orderkey,
             date_trunc('month', CAST(o_orderdate AS DATE)) AS mstart,
             last_day(CAST(o_orderdate AS DATE)) AS mend,
             CAST(date_part('quarter', o_orderdate) AS BIGINT) AS q,
             CAST((CAST(date_part('isodow', o_orderdate) AS BIGINT) - 1) AS BIGINT) AS dow_mon0,
             CAST(date_part('day', last_day(CAST(o_orderdate AS DATE))) AS BIGINT) AS days_in_month
      FROM orders ORDER BY o_orderkey""",

    "q_null_agg" -> s"""
      WITH b AS (SELECT o_orderstatus,
                        CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS tp
                 FROM orders)
      SELECT o_orderstatus, count(*) AS n_rows, count(tp) AS n_vals,
             ${Num.dsumSql("tp")} AS s, min(tp) AS mn, max(tp) AS mx,
             count(DISTINCT tp) AS nd
      FROM b GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_int_arith" -> """
      SELECT l_orderkey, l_linenumber,
             l_partkey // 7 AS idiv,
             CAST(l_partkey % 7 AS BIGINT) AS imod,
             CAST((0 - l_partkey) % 7 AS BIGINT) AS negmod,
             CAST(l_partkey AS DOUBLE) / 7.0E0 AS fdiv,
             CAST(((0 - l_partkey) % 7 + 7) % 7 AS BIGINT) AS posmod
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q_pivot" -> """
      SELECT o_orderpriority,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
             count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_gcd_lcm" -> """
      SELECT p_partkey,
             CAST(gcd(p_partkey, CAST(p_size AS BIGINT)) AS BIGINT) AS g,
             CAST(lcm(CAST(p_size AS BIGINT), 6) AS BIGINT) AS l,
             CAST(gcd(0, p_partkey) AS BIGINT) AS g0
      FROM part ORDER BY p_partkey""",

    "q_math_funcs2" -> """
      SELECT p_partkey,
             round(cbrt(p_retailprice), 6) AS cb,
             CAST(factorial(p_size % 15) AS BIGINT) AS fact
      FROM part ORDER BY p_partkey""")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_array_funcs2" -> (arrayFuncs2 _),
    "q_array_funcs3" -> (arrayFuncs3 _),
    "q_struct_map" -> (structMap _),
    "q_encode_binary" -> (encodeBinary _),
    "q_string_predicates" -> (stringPredicates _),
    "q_date_arith" -> (dateArith _),
    "q_date_funcs2" -> (dateFuncs2 _),
    "q_null_agg" -> (nullAgg _),
    "q_int_arith" -> (intArith _),
    "q_pivot" -> (pivotStatus _),
    "q_gcd_lcm" -> (gcdLcm _),
    "q_math_funcs2" -> (mathFuncs2 _))
}
