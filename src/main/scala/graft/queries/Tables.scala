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

  /** Schema-adaptive documents/embeddings loaders — the round-10
    * lesson (events.ts changed physical type between driver data
    * generations and silently errored 20 queries): pin the column
    * types every pipeline query assumes. When the on-disk type
    * already matches, `SimplifyCasts` erases the cast, so the plans —
    * including scan pushdown — are byte-identical to the raw read.
    */
  def docs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("doc_id", col("doc_id").cast("long"))
      .withColumn("n_chars", col("n_chars").cast("long"))

  def embs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .withColumn("vec_id", col("vec_id").cast("long"))
      .withColumn("embedding", col("embedding").cast("array<float>"))

  /** Injective identifier-safe tag for a fixture dir: a readable
    * sanitized prefix plus an MD5 suffix of the RAW path. Plain
    * `replaceAll("[^A-Za-z0-9]", "_")` is not injective ("sf0.1" and
    * "sf0_1" collide), and anything keyed by the tag — Derby database
    * names, bucketed-table catalog names — would then silently serve
    * one dir's data for the other.
    */
  def pathTag(dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = md.take(6).map(b => f"$b%02x").mkString
    s"${dir.replaceAll("[^A-Za-z0-9]", "_").takeRight(24)}_$hex"
  }
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

  /** [[graft.engine.ExactMath.ppbSql]], re-exported for the query
    * layer's habit of importing Num for exactness devices.
    */
  def ppbSql(num: String, den: String, div: String): String =
    graft.engine.ExactMath.ppbSql(num, den, div)
}
