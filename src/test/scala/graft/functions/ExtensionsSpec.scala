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

  test("gcd/lcm overflow edges fail loudly instead of wrapping") {
    import org.apache.spark.sql.graft.{Gcd, Lcm}
    // |Long.MinValue| is not representable: a naive abs-first Euclid
    // returns a negative gcd here
    assert(Gcd.gcd(Long.MinValue, 3L) === 1L)
    assert(Gcd.gcd(Long.MinValue, 6L) === 2L)
    assert(Gcd.gcd(Long.MinValue, Long.MinValue + 8) === 8L)
    intercept[ArithmeticException](Gcd.gcd(Long.MinValue, 0L))
    intercept[ArithmeticException](Gcd.gcd(Long.MinValue, Long.MinValue))
    // lcm(2^62, 3) = 3·2^62 > Long.MaxValue — DuckDB errors, so do we
    intercept[ArithmeticException](Lcm.lcm(1L << 62, 3L))
    intercept[ArithmeticException](Lcm.lcm(Long.MinValue, 3L))
    assert(Lcm.lcm(1L << 31, 6L) === 3L * (1L << 31))
  }

  test("install is idempotent and survives re-registration") {
    GraftExtensions.install(spark)
    GraftExtensions.install(spark)
    assert(spark.sql("SELECT float_vector_dot(array(CAST(1.0 AS FLOAT)), array(CAST(5.0 AS FLOAT)))")
      .head().getDouble(0) === 5.0)
  }
}
