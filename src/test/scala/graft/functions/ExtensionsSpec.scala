package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.graft.GraftExtensions

class ExtensionsSpec extends SparkSpec {

  test("float_vector_dot is callable from SQL after install") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT float_vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head()
    assert(r.getDouble(0) === 11.0)
  }

  test("gcd/lcm are SQL-callable with DuckDB-compatible edge cases") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT gcd(12L, 18L), lcm(4L, 6L), gcd(0L, 7L), lcm(7L, 0L), gcd(-12L, 18L)").head()
    assert(r.getLong(0) === 6L)
    assert(r.getLong(1) === 12L)
    assert(r.getLong(2) === 7L)
    assert(r.getLong(3) === 0L)
    assert(r.getLong(4) === 6L)
  }

  test("install is idempotent and survives re-registration") {
    GraftExtensions.install(spark)
    GraftExtensions.install(spark)
    assert(spark.sql("SELECT float_vector_dot(array(CAST(1.0 AS FLOAT)), array(CAST(5.0 AS FLOAT)))")
      .head().getDouble(0) === 5.0)
  }
}
