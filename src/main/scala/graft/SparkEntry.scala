package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Federated, Pipeline, Pipeline2, Pipeline3, Relational, Relational2, Relational3, Relational4, Relational5, Relational6}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggGroupBy(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ Relational2.all ++ Relational3.all ++ Relational4.all ++
      Relational5.all ++ Relational6.all ++ Pipeline.all ++ Pipeline2.all ++
      Pipeline3.all ++ Federated.all ++ Analytics.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (approx sketches, hash-based
    * ops not reproducible in DuckDB) get the driver's rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Relational2.oracle ++ Relational3.oracle ++ Relational4.oracle ++
      Relational5.oracle ++ Relational6.oracle ++ Pipeline.oracle ++ Pipeline2.oracle ++
      Pipeline3.oracle ++ Federated.oracle ++ Analytics.oracle
}
