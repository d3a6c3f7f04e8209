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

  /** Exact-sum AVG, HALF_UP at 4 decimals computed in INTEGER
    * arithmetic end to end — the divide-through-double form this
    * replaces was correct until the exact quotient landed on a
    * 4-decimal TIE (e.g. 539.93/8 = 67.491250 at sf0.1), where Spark
    * rounds the decimal RENDERING of the double (HALF_UP → …3) and
    * DuckDB rounds the BINARY double (67.4912499…96 → …2): a
    * scale-dependent cross-engine flip. Device: micro-unit integer
    * sum A = |Σ|·10⁶, mean in 10⁻⁴ units = ⌊(A + n·50)/(n·100)⌋
    * (floor == HALF_UP once the half-denominator is added; sign
    * split keeps floor and the tie direction away-from-zero, the
    * BigDecimal HALF_UP convention). The Spark side avoids decimal
    * DIVISION rounding entirely by subtracting the exact remainder
    * first — (num − num % den)/den is integral, so the quotient is
    * exact at any result scale. The final /10000.0 is one IEEE
    * double op on an integer — identical in both engines.
    */
  def davg(c: Column): Column = davgOf(sum(c.cast(D)), count(c))

  /** The same device over ALREADY-AGGREGATED partials (`s` a
    * DECIMAL(38,6) sum, `n` a count) — the two-level merge shape
    * (q_incremental_agg) derives its final average through the
    * identical integers as the one-level [[davg]].
    */
  def davgOf(s: Column, n: Column): Column = {
    val sign = when(s < 0, lit(-1L)).otherwise(lit(1L))
    val num = (abs(s) * lit(1000000L)).cast(DecimalType(38, 0)) +
      (n * lit(50L)).cast(DecimalType(38, 0))
    val den = (n * lit(100L)).cast(DecimalType(38, 0))
    val r4 = ((num - num % den) / den).cast("long")
    ((sign * r4).cast("double") / lit(10000.0)).cast("double")
  }

  def dsumSql(e: String): String =
    s"CAST(round(SUM(CAST(($e) AS DECIMAL(38,6))),4) AS DOUBLE)"

  /** The oracle half of [[davg]] — same integers, DuckDB spelling
    * (HUGEINT carries the micro-unit sum; `//` floors positives).
    */
  def davgSql(e: String): String = {
    val s = s"SUM(CAST(($e) AS DECIMAL(38,6)))"
    val n = s"COUNT($e)"
    s"(CASE WHEN $s IS NULL THEN CAST(NULL AS DOUBLE) ELSE " +
      s"CAST((CASE WHEN $s < 0 THEN -1 ELSE 1 END) * " +
      s"((CAST(abs($s) * 1000000 AS HUGEINT) + $n * 50) // ($n * 100)) " +
      s"AS DOUBLE) / 10000.0 END)"
  }

  /** [[graft.engine.ExactMath.ppbSql]], re-exported for the query
    * layer's habit of importing Num for exactness devices.
    */
  def ppbSql(num: String, den: String, div: String): String =
    graft.engine.ExactMath.ppbSql(num, den, div)
}
