package org.apache.spark.sql.graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types._
import org.apache.spark.sql.connector.expressions.{Expressions, LiteralValue}
import org.apache.spark.sql.connector.expressions.filter.{And, Predicate}
import org.apache.spark.unsafe.types.UTF8String

/** Postgres-dialect pinning for the federation path: a user running
  * `federate --jdbc postgresql://…` (the reference's headline use
  * case — its vendored connector unparses pushdown SQL to Postgres at
  * `postgres_connection.rs:171-223`) rides Spark's shipped
  * `PostgresDialect` through the same `jdbcShards` code FederationSpec
  * exercises end-to-end against Derby. No Postgres server exists in
  * this environment, so these tests pin the dialect-generated SQL and
  * type mapping DIRECTLY: identifier quoting, LIMIT pushdown, the
  * Spark→Postgres DDL types a COPY-out takes, the Postgres→Catalyst
  * types a scan takes (uuid/json/timestamptz/numeric edges), and the
  * compiled WHERE text of pushed predicates — including the
  * quote-escaping that makes the pushdown injection-safe.
  *
  * Lives in the org.apache.spark.sql package tree because the V2
  * literal constructors the compile tests need are `private[sql]`
  * (the IntegerMath precedent).
  */
class PostgresDialectSpec extends AnyFunSuite {

  private val d: JdbcDialect = JdbcDialects.get("jdbc:postgresql://shard0:5432/corpus")

  test("a postgresql:// shard URL resolves to the Postgres dialect; " +
      "identifiers double-quote; LIMIT pushes as a trailing clause") {
    assert(d.getClass.getName === "org.apache.spark.sql.jdbc.PostgresDialect")
    assert(d.quoteIdentifier("o_orderkey") === "\"o_orderkey\"")
    // a camel-case / reserved-word column survives quoting untouched
    assert(d.quoteIdentifier("user") === "\"user\"")
    // the chunked-read shape: the reference streams 4,000-row chunks
    // (postgres_connection.rs:186); Spark pushes LIMIT n instead
    assert(d.getLimitClause(4000) === "LIMIT 4000")
    // Derby, by contrast, must NOT claim the Postgres behaviors
    val derby = JdbcDialects.get("jdbc:derby:memory:x")
    assert(derby.getClass.getName !== d.getClass.getName)
  }

  test("Spark -> Postgres DDL type mapping (the write/COPY path): " +
      "no TINYINT, FLOAT8/FLOAT4, BYTEA, NUMERIC(p,s), tz-aware TIMESTAMP") {
    def jt(t: DataType): String =
      d.getJDBCType(t).map(_.databaseTypeDefinition).getOrElse("DEFAULT")
    assert(jt(StringType) === "TEXT")
    assert(jt(DoubleType) === "FLOAT8")
    assert(jt(FloatType) === "FLOAT4")
    assert(jt(BooleanType) === "BOOLEAN")
    assert(jt(ByteType) === "SMALLINT")  // postgres has no 1-byte int
    assert(jt(ShortType) === "SMALLINT")
    assert(jt(BinaryType) === "BYTEA")
    assert(jt(TimestampType) === "TIMESTAMP WITH TIME ZONE")
    // SURVEY §1.4's UInt64 widening target round-trips exactly
    assert(jt(DecimalType(20, 0)) === "NUMERIC(20,0)")
    assert(jt(DecimalType(38, 6)) === "NUMERIC(38,6)")
    // int/long fall through to the JDBC-standard INTEGER/BIGINT
    assert(jt(IntegerType) === "DEFAULT")
    assert(jt(LongType) === "DEFAULT")
  }

  test("Postgres -> Catalyst type mapping (the scan path): " +
      "uuid/json/jsonb read as strings, timestamptz as TimestampType, int2/float4 exact") {
    import java.sql.Types
    def ct(sqlType: Int, typeName: String): Option[DataType] =
      d.getCatalystType(sqlType, typeName, 0, new MetadataBuilder())
    assert(ct(Types.OTHER, "uuid") === Some(StringType))
    assert(ct(Types.OTHER, "json") === Some(StringType))
    assert(ct(Types.OTHER, "jsonb") === Some(StringType))
    assert(ct(Types.TIMESTAMP, "timestamptz") === Some(TimestampType))
    assert(ct(Types.SMALLINT, "int2") === Some(ShortType))
    assert(ct(Types.REAL, "float4") === Some(FloatType))
  }

  test("pushdown predicates compile to quoted, escape-safe Postgres WHERE text") {
    def compiled(p: Predicate): String = {
      val r = d.compileExpression(p)
      assert(r.isDefined, s"dialect refused to compile $p")
      r.get
    }
    val gt = new Predicate(">",
      Array(Expressions.column("o_totalprice"), LiteralValue(100.5d, DoubleType)))
    assert(compiled(gt) === """"o_totalprice" > 100.5""")
    // the injection surface: an embedded single quote doubles
    val eq = new Predicate("=", Array(Expressions.column("status"),
      LiteralValue(UTF8String.fromString("O'Brien"), StringType)))
    assert(compiled(eq) === """"status" = 'O''Brien'""")
    // timestamp binds render as a literal in the session (UTC) zone
    val ts = new Predicate(">=", Array(Expressions.column("ts"),
      LiteralValue(1700000000000000L, TimestampType)))
    assert(compiled(ts) === """"ts" >= '2023-11-14 22:13:20.0'""")
    // a 20-digit decimal (the UInt64 widening) renders digit-exact
    val dec = new Predicate("=", Array(Expressions.column("price"),
      LiteralValue(Decimal("12345678901234567890"), DecimalType(20, 0))))
    assert(compiled(dec) === """"price" = 12345678901234567890""")
    // conjunctions parenthesize both legs
    val and = new And(gt, eq)
    assert(compiled(and) ===
      """("o_totalprice" > 100.5) AND ("status" = 'O''Brien')""")
  }
}
