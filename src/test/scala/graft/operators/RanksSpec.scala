package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared two-pass machinery must reproduce the single-window
  * running sum EXACTLY for any bucket count, both sort directions,
  * ties, skew, and NULL keys — the property every caller
  * (corpus packing, token budget, weighted percentiles) stakes its
  * oracle hash on.
  */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  // deterministic messy data: duplicate keys, skewed strata, nulls
  private def data = {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 5000).map { i =>
      val stratum = if (i % 10 < 7) "a" else if (i % 10 < 9) "b" else "c"
      val key: java.lang.Double =
        if (i % 97 == 0) null else (rnd.nextInt(50).toDouble + (if (i % 3 == 0) 0.5 else 0.0))
      (i.toLong, stratum, key, (rnd.nextInt(9) + 1).toLong)
    }
    rows.toDF("id", "s", "k", "w")
  }

  private def serial(desc: Boolean) = {
    val ord = if (desc) col("k").desc_nulls_last else col("k").asc_nulls_last
    val w = Window.partitionBy("s").orderBy(ord, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    data.withColumn("cum", sum("w").over(w))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def bucketed(desc: Boolean, n: Int) = {
    val keyed = Ranks.withRangeBucket(data, Seq("s"), col("k"), n, descending = desc)
    val ord = if (desc) col("k").desc_nulls_last else col("k").asc_nulls_last
    val wIn = Window.partitionBy("s", "bucket").orderBy(ord, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.withColumn("cum_in", sum("w").over(wIn))
      .join(broadcast(Ranks.bucketOffsets(keyed, Seq("s"), col("w"))), Seq("s", "bucket"))
      .select(col("id"), (col("b_off") + col("cum_in")).as("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bucketed running sums equal the single window for any bucket count, asc") {
    val want = serial(desc = false)
    for (n <- Seq(1, 2, 7, 64)) assert(bucketed(desc = false, n) === want, s"n=$n")
  }

  test("bucketed running sums equal the single window, desc with ties and nulls") {
    val want = serial(desc = true)
    for (n <- Seq(1, 3, 16)) assert(bucketed(desc = true, n) === want, s"n=$n")
  }

  test("collectedRangeBucket: literal-bounds running sums equal the single window (r21)") {
    val want = serial(desc = false)
    val base = data
    for (n <- Seq(1, 7, 64)) {
      val keyed = base.withColumn("bucket",
        Ranks.collectedRangeBucket(base, "s", col("k"), n))
      val wIn = Window.partitionBy("s", "bucket").orderBy(col("k").asc_nulls_last, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = keyed.withColumn("cum_in", sum("w").over(wIn))
        .join(broadcast(Ranks.bucketOffsets(keyed, Seq("s"), col("w"))), Seq("s", "bucket"))
        .select(col("id"), (col("b_off") + col("cum_in")).as("cum"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"n=$n")
    }
  }

  test("rangeBucketedAuto: literal path below the strata cap, join-form fallback above it, equivalent (r22)") {
    val want = serial(desc = false)
    def cum(keyed: org.apache.spark.sql.DataFrame) = {
      val wIn = Window.partitionBy("s", "bucket").orderBy(col("k").asc_nulls_last, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      keyed.withColumn("cum_in", sum("w").over(wIn))
        .join(broadcast(Ranks.bucketOffsets(keyed, Seq("s"), col("w"))), Seq("s", "bucket"))
        .select(col("id"), (col("b_off") + col("cum_in")).as("cum"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // 3 strata, cap 128 (default): the literal path — no
    // percentile_approx left in the final plan (bounds are collected)
    val lite = Ranks.rangeBucketedAuto(data, "s", col("k"), 16)
    assert(!lite.queryExecution.analyzed.toString.contains("percentile_approx"),
      "literal path expected below the cap")
    assert(cum(lite) === want, "literal path")
    // 3 strata against a cap of 2: the fallback path — the join form's
    // bounds aggregate stays IN the plan, and the result is identical
    val fell = Ranks.rangeBucketedAuto(data, "s", col("k"), 16, maxCollectedStrata = 2)
    assert(fell.queryExecution.analyzed.toString.contains("percentile_approx"),
      "join-form fallback expected above the cap")
    assert(cum(fell) === want, "fallback path")
    // the guarded Column form refuses loudly above the cap
    val e = intercept[IllegalArgumentException] {
      val rows = data.withColumn("s2", col("id") % 200)
      rows.withColumn("bucket", Ranks.collectedRangeBucket(rows, "s2", col("k"), 8))
    }
    assert(e.getMessage.contains("strata"))
  }

  test("bucketOffsetsWithTotal: b_off matches bucketOffsets and tw is the stratum grand total (r21)") {
    val keyed = Ranks.withRangeBucket(data, Seq("s"), col("k"), 8, descending = false)
    val wt = Ranks.bucketOffsetsWithTotal(keyed, Seq("s"), col("w")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val off = Ranks.bucketOffsets(keyed, Seq("s"), col("w")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val totals = data.groupBy("s").agg(sum("w").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wt.keySet === off.keySet)
    wt.foreach { case ((s, b), (boff, tw)) =>
      assert(boff === off((s, b)), s"b_off mismatch at ($s,$b)")
      assert(tw === totals(s), s"tw mismatch at ($s,$b)")
    }
  }

  test("empty strata-free input and all-null keys do not error") {
    val empty = Seq.empty[(Long, String, java.lang.Double, Long)].toDF("id", "s", "k", "w")
    assert(Ranks.withRangeBucket(empty, Seq("s"), col("k"), 8, descending = false).count() === 0)
    val nulls = Seq((1L, "a", null: java.lang.Double, 2L), (2L, "a", null: java.lang.Double, 3L))
      .toDF("id", "s", "k", "w")
    val keyed = Ranks.withRangeBucket(nulls, Seq("s"), col("k"), 8, descending = false)
    // every all-null row lands in the trailing bucket
    assert(keyed.select("bucket").distinct().collect().map(_.getInt(0)).toSeq === Seq(8))
  }
}
