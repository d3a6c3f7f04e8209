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

  test("install is idempotent and survives re-registration") {
    GraftExtensions.install(spark)
    GraftExtensions.install(spark)
    assert(spark.sql("SELECT float_vector_dot(array(CAST(1.0 AS FLOAT)), array(CAST(5.0 AS FLOAT)))")
      .head().getDouble(0) === 5.0)
  }
}
