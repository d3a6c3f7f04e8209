package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime skew handling: the engine's two answers to a hot key are
  * the salted rewrite (graded, q_salted_join) and AQE's skew-join
  * split, which re-plans from REAL partition sizes at the shuffle
  * boundary. This spec proves the AQE path end-to-end: a join whose
  * hot key exceeds the skew threshold is split at runtime — the
  * final adaptive plan carries the skew marker and the result is
  * byte-identical to the unsplit join. At 100 TB this is the
  * default defense (no query rewrite needed); salting remains for
  * aggregation skew and deterministic plans.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition at runtime, result unchanged") {
    val s = spark
    import s.implicits._
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> s.conf.getOption(k) }
    conf.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // one hot key (0) carrying ~60% of the fact side; dim side is
      // uniform one-row-per-key so the join output stays linear. The
      // pad column keeps the hot partition's COMPRESSED shuffle bytes
      // well above the skew threshold (k/v alone compress under it).
      val fact = s.range(0, 300000)
        .select(when(col("id") < 180000, 0L).otherwise(col("id") % 997).as("k"),
          col("id").as("v"),
          md5(col("id").cast("string")).as("pad"))
      val dim = s.range(0, 997).select(col("id").as("k"), (col("id") * 7).as("w"))
      // sum(length(pad)) keeps the pad column alive through column
      // pruning, so the fact side's shuffle rows stay wide
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum("w").as("sw"), sum(length(col("pad"))).as("sp"))
      // collect() drives THIS DataFrame's QueryExecution (head would
      // wrap in a limit and execute a different one), so the adaptive
      // plan below is the final, executed one
      val row = joined.collect().head
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan)
      // ground truth: every fact row matches exactly one dim row
      assert(row.getLong(0) === 300000L)
      val expected = 180000L * 0L + (180000 until 300000).map(i => (i % 997) * 7L).sum
      assert(row.getLong(1) === expected)
      assert(row.getLong(2) === 32L * 300000L) // md5 hex pad survived pruning
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}
