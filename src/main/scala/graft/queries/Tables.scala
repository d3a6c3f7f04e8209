package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Parquet fixture loading (TESTDATA.md) + numeric helpers shared by
  * the declared queries.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** Deterministic numeric aggregates for the DuckDB oracle compare.
  *
  * Double summation is order-dependent; Spark's parallel partial
  * aggregation and DuckDB's sequential scan would disagree in the low
  * bits. Routing sums through DECIMAL(38,6) makes the aggregate exact
  * (associative), then `round(_, 4)` + cast back to DOUBLE gives a
  * stable, engine-independent value. The same shape is emitted on the
  * oracle side by [[dsumSql]]/[[davgSql]].
  *
  * Scale note: decimal sums still combine map-side (partial agg) —
  * this is a determinism device, not a shuffle-shape change.
  */
object Num {
  private val D = DecimalType(38, 6)

  /** Exact order-independent SUM(double) → rounded double. */
  def dsum(c: Column): Column = round(sum(c.cast(D)), 4).cast("double")

  /** Exact-sum AVG: decimal sum → one double conversion → divide. */
  def davg(c: Column): Column =
    round(sum(c.cast(D)).cast("double") / count(c), 4).cast("double")

  def dsumSql(e: String): String =
    s"CAST(round(SUM(CAST(($e) AS DECIMAL(38,6))),4) AS DOUBLE)"

  def davgSql(e: String): String =
    s"CAST(round(CAST(SUM(CAST(($e) AS DECIMAL(38,6))) AS DOUBLE)/COUNT($e),4) AS DOUBLE)"
}
