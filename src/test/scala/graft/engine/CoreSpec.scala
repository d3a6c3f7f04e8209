package graft.engine

import graft.SparkSpec
import java.nio.file.Files

/** CSV listing-table registration semantics (reference:
  * `/root/reference/csvb_engine/src/lib.rs:33-85`): multi-path union
  * under one name, schema inference, `.csv` extension filtering.
  */
class CoreSpec extends SparkSpec {

  private def writeCsv(dir: java.nio.file.Path, name: String, lines: Seq[String]): Unit = {
    val p = dir.resolve(name)
    Files.write(p, String.join("\n", lines: _*).getBytes)
  }

  test("multi-file CSV registers as one table with inferred schema") {
    val dir = Files.createTempDirectory("graft-csv")
    writeCsv(dir, "a.csv", Seq("id,name,score", "1,alpha,1.5", "2,beta,2.5"))
    writeCsv(dir, "b.csv", Seq("id,name,score", "3,gamma,3.5"))
    writeCsv(dir, "ignored.txt", Seq("id,name,score", "9,nope,9.9"))
    val df = Core.addCsvTable(spark, "t_csv", Seq(dir.toString))
    assert(df.count() === 3) // .txt filtered out, both .csv files unioned
    assert(df.schema("id").dataType.typeName === "integer")
    assert(df.schema("score").dataType.typeName === "double")
    assert(spark.sql("SELECT sum(id) FROM t_csv").head().getLong(0) === 6L)
  }

  test("unsigned/time widening contract (SURVEY §1.4): UInt32-range -> LongType, " +
      "UInt64-range -> Decimal(20,0) digit-exact, time-of-day stays a string") {
    val dir = Files.createTempDirectory("graft-csv-widen")
    // u32 holds values past Int32.MaxValue (a DataFusion UInt32 column);
    // u64 holds UInt64.MaxValue itself, which no Long can carry
    writeCsv(dir, "w.csv", Seq(
      "small,u32,u64,tod,ts,tst",
      "1,4294967295,18446744073709551615,12:34:56,2023-01-02 03:04:05,2023-01-02T03:04:05",
      "2,2147483648,9223372036854775808,23:59:59,2024-05-06 07:08:09.123456,2024-05-06T07:08:09"))
    val df = Core.addCsvTable(spark, "t_widen", Seq(dir.toString))
    assert(df.schema("small").dataType === org.apache.spark.sql.types.IntegerType)
    assert(df.schema("u32").dataType === org.apache.spark.sql.types.LongType)
    assert(df.schema("u64").dataType === org.apache.spark.sql.types.DecimalType(20, 0))
    // Time32/64 has no stable Spark type: the documented rule is to
    // avoid it — a time-of-day column must arrive as an untouched
    // string, never Spark's default lenient parse which anchors a bare
    // time to the CURRENT date (non-deterministic across runs)
    assert(df.schema("tod").dataType === org.apache.spark.sql.types.StringType)
    // ...while genuinely date-anchored timestamps (space or T form,
    // with or without fraction) still infer as timestamps
    assert(df.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    assert(df.schema("tst").dataType === org.apache.spark.sql.types.TimestampType)
    assert(spark.sql("SELECT CAST(min(ts) AS STRING) FROM t_widen").head().getString(0)
      === "2023-01-02 03:04:05")
    // the widened values round-trip digit-exact through SQL
    assert(spark.sql("SELECT max(u32) FROM t_widen").head().getLong(0) === 4294967295L)
    assert(spark.sql("SELECT max(u64) FROM t_widen").head().getDecimal(0)
      === new java.math.BigDecimal("18446744073709551615"))
    assert(spark.sql("SELECT sum(u64) FROM t_widen").head().getDecimal(0)
      === new java.math.BigDecimal("27670116110564327423"))
    assert(spark.sql("SELECT max(tod) FROM t_widen").head().getString(0) === "23:59:59")
  }

  test("CSV timestamp shape contract (r16 advice): no-seconds and non-colon " +
      "offsets parse; odd fractions degrade to string, bare time still stays string") {
    val dir = Files.createTempDirectory("graft-csv-tsshape")
    writeCsv(dir, "s.csv", Seq(
      "noSec,offColon,offPlain,offZ,fracOdd,offHour,bare",
      "2023-01-02 03:04,2023-01-02 03:04:05+01:00,2023-01-02 03:04:05+0100," +
        "2023-01-02T03:04:05Z,2023-01-02 03:04:05.123,2023-01-02 03:04:05+01,12:34:56",
      "2024-05-06 07:08,2024-05-06 07:08:09+00:00,2024-05-06 07:08:09+0000," +
        "2024-05-06T07:08:09Z,2024-05-06 07:08:09.9,2024-05-06 07:08:09+00,23:59:59"))
    val df = Core.addCsvTable(spark, "t_tsshape", Seq(dir.toString))
    import org.apache.spark.sql.types.{StringType, TimestampType}
    // accepted shapes: minute precision, ±HH:MM, ±HHMM, Z, and any
    // fraction width (Spark rewrites the S-run to a flexible-width
    // fraction, so .9/.123/.123456 all parse)
    assert(df.schema("noSec").dataType === TimestampType)
    assert(df.schema("offColon").dataType === TimestampType)
    assert(df.schema("offPlain").dataType === TimestampType)
    assert(df.schema("offZ").dataType === TimestampType)
    assert(df.schema("fracOdd").dataType === TimestampType)
    assert(spark.sql("SELECT CAST(min(fracOdd) AS STRING) FROM t_tsshape")
      .head().getString(0) === "2023-01-02 03:04:05.123")
    // colon and plain offsets of the same instant agree exactly
    assert(spark.sql(
      "SELECT count(*) FROM t_tsshape WHERE offColon <> offPlain").head().getLong(0) === 0L)
    // documented degradations: hour-only offsets and bare time stay
    // lossless strings (explicit contract, not silent data munge)
    assert(df.schema("offHour").dataType === StringType)
    assert(df.schema("bare").dataType === StringType)
    assert(spark.sql("SELECT max(bare) FROM t_tsshape").head().getString(0) === "23:59:59")
  }

  test("CSV timestamp shape contract (r17 advice): a fraction requires seconds — " +
      "minute-precision + fraction degrades to string") {
    // the pattern nests [.SSSSSS] INSIDE [:ss]: '03:04.5' must not
    // parse as 03:04:00.5 (the accidental shape a trailing
    // independent fraction optional produced)
    val dir = Files.createTempDirectory("graft-csv-minfrac")
    writeCsv(dir, "m.csv", Seq(
      "minFrac,secFrac",
      "2023-01-02 03:04.5,2023-01-02 03:04:05.5",
      "2024-05-06 07:08.25,2024-05-06 07:08:09.25"))
    val df = Core.addCsvTable(spark, "t_minfrac", Seq(dir.toString))
    import org.apache.spark.sql.types.{StringType, TimestampType}
    assert(df.schema("minFrac").dataType === StringType)
    assert(df.schema("secFrac").dataType === TimestampType)
    assert(spark.sql("SELECT max(minFrac) FROM t_minfrac").head().getString(0)
      === "2024-05-06 07:08.25")
    assert(spark.sql("SELECT CAST(min(secFrac) AS STRING) FROM t_minfrac")
      .head().getString(0) === "2023-01-02 03:04:05.5")
  }

  test("explicit multi-path registration unions all paths") {
    val d1 = Files.createTempDirectory("graft-csv1")
    val d2 = Files.createTempDirectory("graft-csv2")
    writeCsv(d1, "x.csv", Seq("k,v", "1,a"))
    writeCsv(d2, "y.csv", Seq("k,v", "2,b"))
    val df = Core.addCsvTable(spark, "t_multi", Seq(d1.toString, d2.toString))
    assert(df.count() === 2)
  }

  test("execute delegates SQL against registered tables") {
    Core.addParquetTable(spark, "t_region", Seq(s"$Sf/region.parquet"))
    val out = Core.execute(spark, "SELECT count(*) AS n FROM t_region").head()
    assert(out.getLong(0) === 5L)
  }

  test("parameterized SQL is the prepared-statement analog (SURVEY §2.9)") {
    Core.addParquetTable(spark, "t_region", Seq(s"$Sf/region.parquet"))
    val out = spark.sql(
      "SELECT count(*) AS n FROM t_region WHERE r_regionkey < :k",
      Map("k" -> 3)).head()
    assert(out.getLong(0) === 3L)
  }

  test("first-file schema pinning reproduces the reference's inference contract") {
    // first file: integer column; second file would widen it to double
    val d1 = Files.createTempDirectory("graft-pin1")
    val d2 = Files.createTempDirectory("graft-pin2")
    writeCsv(d1, "a.csv", Seq("id,v", "1,10", "2,20"))
    writeCsv(d2, "b.csv", Seq("id,v", "3,1.5"))
    val pinned = Core.addCsvTableFirstFileSchema(spark, "t_pin", Seq(d1.toString, d2.toString))
    assert(pinned.schema("v").dataType.typeName === "integer") // pinned from first file
    val sampled = Core.addCsvTable(spark, "t_all", Seq(d1.toString, d2.toString))
    assert(sampled.schema("v").dataType.typeName === "double") // Spark-default superset
  }

  test("copyTo round-trips csv and parquet") {
    val out = Files.createTempDirectory("graft-out")
    val df = spark.read.parquet(s"$Sf/region.parquet")
    Core.copyTo(df, s"$out/r.parquet")
    Core.copyTo(df, s"$out/r.csv", "csv")
    assert(spark.read.parquet(s"$out/r.parquet").count() === 5)
    assert(spark.read.option("header", "true").csv(s"$out/r.csv").count() === 5)
  }

  test("SQL COPY ... TO: subquery and table forms, format + header options") {
    val out = Files.createTempDirectory("graft-copy-sql")
    Core.addParquetTable(spark, "t_copy_region", Seq(s"$Sf/region.parquet"))
    // subquery form, parquet default
    val r1 = Core.execute(spark,
      s"COPY (SELECT r_regionkey, r_name FROM t_copy_region WHERE r_regionkey < 3) TO '$out/sub.parquet'")
    assert(r1.schema.isEmpty) // command frame → pgwire "COPY" tag
    assert(spark.read.parquet(s"$out/sub.parquet").count() === 3)
    // bare-table form with csv format + header
    Core.execute(spark, s"COPY t_copy_region TO '$out/t.csv' (FORMAT csv, HEADER true)")
    assert(spark.read.option("header", "true").csv(s"$out/t.csv").count() === 5)
    // quoted format, nested parens + quotes inside the subquery
    Core.execute(spark,
      s"COPY (SELECT upper(concat(r_name, '(x)''y')) AS v FROM t_copy_region) TO '$out/q.json' (FORMAT 'json')")
    assert(spark.read.json(s"$out/q.json").count() === 5)
    // a path with an escaped quote round-trips
    Core.execute(spark, s"COPY (SELECT 1 AS one) TO '$out/it''s.parquet'")
    assert(spark.read.parquet(s"$out/it's.parquet").count() === 1)
    // non-COPY statements still reach Spark's parser untouched
    assert(Core.execute(spark, "SELECT 41 + 1 AS v").head().getInt(0) === 42)
    // COPY-lookalike that isn't ours falls through to Spark's error
    intercept[Exception](Core.execute(spark, "COPY t_copy_region WITH nonsense"))
  }

  test("information_schema.tables/columns answer real SQL, joins included") {
    Core.addParquetTable(spark, "t_info_nation", Seq(s"$Sf/nation.parquet"))
    val tables = Core.execute(spark,
      "SELECT table_name, table_type FROM information_schema.tables WHERE table_name = 't_info_nation'")
      .collect()
    assert(tables.length === 1, tables.mkString(","))
    assert(tables.head.getString(1) === "VIEW" || tables.head.getString(1) === "BASE TABLE")
    // columns view carries names, positions, types, nullability
    val cols = Core.execute(spark, """
      SELECT column_name, ordinal_position, data_type, is_nullable
      FROM information_schema.columns WHERE table_name = 't_info_nation'
      ORDER BY ordinal_position""").collect()
    assert(cols.map(_.getString(0)).toSeq === Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(cols.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
    assert(cols.forall(_.getString(3) == "YES"))
    // a JOIN over the two views — the full-SQL surface, not a SHOW shim
    val joined = Core.execute(spark, """
      SELECT t.table_name, count(*) AS n_cols
      FROM information_schema.tables t
      JOIN information_schema.columns c ON t.table_name = c.table_name
      WHERE t.table_name = 't_info_nation' GROUP BY t.table_name""").collect()
    assert(joined.head.getLong(1) === 3L)
    // the snapshot refreshes: a table registered AFTER the first query shows up
    Core.addParquetTable(spark, "t_info_region", Seq(s"$Sf/region.parquet"))
    val n = Core.execute(spark,
      "SELECT count(*) FROM information_schema.tables WHERE table_name = 't_info_region'")
      .head().getLong(0)
    assert(n === 1L)
  }

  test("json and orc sources round-trip through registration + SQL") {
    val out = Files.createTempDirectory("graft-fmt")
    val df = spark.read.parquet(s"$Sf/region.parquet")
    Core.copyTo(df, s"$out/r.json", "json")
    Core.copyTo(df, s"$out/r.orc", "orc")
    Core.addJsonTable(spark, "t_region_json", Seq(s"$out/r.json"))
    Core.addOrcTable(spark, "t_region_orc", Seq(s"$out/r.orc"))
    assert(Core.execute(spark, "SELECT count(*) AS n FROM t_region_json").head().getLong(0) === 5L)
    assert(Core.execute(spark, "SELECT count(*) AS n FROM t_region_orc").head().getLong(0) === 5L)
    // columnar orc: projection reaches the scan like parquet
    val plan = Core.execute(spark, "SELECT r_name FROM t_region_orc WHERE r_regionkey > 1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("orc"), plan)
  }

  test("writeTarget: INSERT/TRUNCATE forms, backquoted identifiers with punctuation, non-writes") {
    assert(Core.writeTarget("INSERT INTO t VALUES (1)") === Some("t"))
    assert(Core.writeTarget("insert into db.t select * from s") === Some("db.t"))
    assert(Core.writeTarget("INSERT OVERWRITE TABLE t SELECT 1") === Some("t"))
    assert(Core.writeTarget("  TRUNCATE TABLE t") === Some("t"))
    // a backquoted name may hold a dash/space — must capture WHOLE,
    // or the write lock and the cross-session refresh key the wrong
    // (and unresolvable) name
    assert(Core.writeTarget("INSERT INTO `my-tbl` VALUES (1)") === Some("`my-tbl`"))
    assert(Core.writeTarget("INSERT INTO `a b`.`c-d` VALUES (1)") === Some("`a b`.`c-d`"))
    assert(Core.writeTarget("SELECT * FROM t") === None)
    assert(Core.writeTarget("CREATE TABLE t (id BIGINT)") === None)
    // a string literal mentioning INSERT is not a write
    assert(Core.writeTarget("SELECT 'INSERT INTO x'") === None)
    // optional TABLE keyword after INTO: the target is t, not the
    // word TABLE (a lock keyed on "table" plus a refresh of a
    // nonexistent relation re-exposes the staging race)
    assert(Core.writeTarget("INSERT INTO TABLE t VALUES (1)") === Some("t"))
    assert(Core.writeTarget("insert overwrite table db.t select 1") === Some("db.t"))
    // Spark allows CTEs before INSERT — the write target is behind
    // the WITH clause, including nested parens / quoted tricksters
    assert(Core.writeTarget("WITH c AS (SELECT 1 AS x) INSERT INTO t SELECT * FROM c")
      === Some("t"))
    assert(Core.writeTarget(
      "WITH a AS (SELECT 1), b AS (SELECT ')' AS s, 'insert into fake' AS t FROM a) " +
        "INSERT INTO TABLE real_t SELECT * FROM b") === Some("real_t"))
    assert(Core.writeTarget(
      "WITH c AS (SELECT `weird ) ins` FROM u) -- insert into nope\n" +
        "INSERT INTO `a b` SELECT * FROM c") === Some("`a b`"))
    // a CTE'd SELECT is still not a write
    assert(Core.writeTarget("WITH c AS (SELECT 1) SELECT * FROM c") === None)
    // underscore is an identifier char: a CTE NAME containing "insert"
    // is not a word boundary (both directions — the write behind it is
    // still found, and without one nothing matches)
    assert(Core.writeTarget(
      "WITH my_insert_x AS (SELECT 1) INSERT INTO t SELECT * FROM my_insert_x") === Some("t"))
    assert(Core.writeTarget("WITH my_insert_x AS (SELECT 1) SELECT * FROM my_insert_x") === None)
    // a double-quoted string literal mentioning INSERT is skipped
    assert(Core.writeTarget(
      "WITH c AS (SELECT \"insert into nope\" AS s) INSERT INTO t2 SELECT * FROM c") === Some("t2"))
    // Spark's default (non-ANSI) lexer escapes quotes with a
    // BACKSLASH too: \' inside a literal must not desync the scanner
    // (missed target = write-lock bypass; matched inside a literal =
    // wrong lock key)
    assert(Core.writeTarget(
      "WITH c AS (SELECT 'it\\'s (insert into fake' AS s) INSERT INTO t3 SELECT * FROM c")
      === Some("t3"))
    assert(Core.writeTarget(
      "WITH c AS (SELECT \"she said \\\"insert into nope\\\"\" AS s) " +
        "INSERT INTO t4 SELECT * FROM c") === Some("t4"))
    assert(Core.writeTarget(
      "WITH c AS (SELECT 'a\\'b' AS s) SELECT * FROM c") === None)
  }

  test("pretty renders a bounded aligned table") {
    Core.addParquetTable(spark, "t_nation", Seq(s"$Sf/nation.parquet"))
    val s = Core.pretty(Core.execute(spark, "SELECT n_name FROM t_nation ORDER BY n_name LIMIT 2"))
    assert(s.contains("n_name"))
    assert(s.linesIterator.size === 6) // rule, header, rule, 2 rows, rule
  }

  test("EXPLAIN ANALYZE as plain SQL returns executed-plan metrics (the reference's lib.rs:88 reach)") {
    val rows = Core.execute(spark,
      "EXPLAIN ANALYZE SELECT n_regionkey, count(*) AS n FROM t_nation GROUP BY n_regionkey")
      .collect().map(_.getString(0))
    // scan metrics with the REAL row count, exchange metrics from the
    // shuffle, and the total-rows footer — all from one execution
    assert(rows.exists(l => l.contains("numOutputRows=")), rows.mkString("\n"))
    assert(rows.exists(l => l.contains("Exchange") && l.contains("shuffleRecordsWritten=")),
      rows.mkString("\n"))
    assert(rows.last === "rows: 5", rows.last) // 5 distinct region keys
    // case-insensitive, leading whitespace, multiline inner query
    val rows2 = Core.execute(spark, "  explain   analyze\n SELECT count(*) AS n FROM t_nation")
      .collect().map(_.getString(0))
    assert(rows2.last === "rows: 1", rows2.mkString("\n"))
    // a plain EXPLAIN still goes to Spark's own parser untouched
    val plain = Core.execute(spark, "EXPLAIN SELECT 1").collect()
    assert(plain.nonEmpty)
    // `TABLE t` ALONE is a query (SELECT * shorthand) — its runtime
    // metrics ARE served; only the COMPUTE STATISTICS command form is
    // excluded from interception
    val bare = Core.execute(spark, "EXPLAIN ANALYZE TABLE t_nation").collect().map(_.getString(0))
    assert(bare.last === "rows: 25", bare.mkString("\n"))
    // Spark's own `EXPLAIN ANALYZE TABLE ... COMPUTE STATISTICS` (an
    // EXPLAIN of the ANALYZE TABLE command) must NOT be hijacked —
    // its result is Spark's `plan` column, not the metrics report
    spark.sql("CREATE TABLE IF NOT EXISTS graft_ea_t (x INT) USING parquet")
    try {
      val df = Core.execute(spark, "EXPLAIN ANALYZE TABLE graft_ea_t COMPUTE STATISTICS")
      assert(df.columns.toSeq === Seq("plan"), df.columns.toSeq)
      assert(df.collect().head.getString(0).contains("AnalyzeTable"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_ea_t")
  }
}
