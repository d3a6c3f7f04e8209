package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def bruteBucket(x: Long, j: Int): Long = {
    val (a, b) = Sketches.CmsHashes(j)
    ((x % Sketches.CmsP) * a + b) % Sketches.CmsP % Sketches.CmsW
  }

  test("cms: build matches the hash family, estimate is exact without collisions") {
    val df = Seq(("g", 7L), ("g", 7L), ("g", 7L), ("g", 11L)).toDF("g", "k")
    val sk = Sketches.cmsSketch(df, Seq("g"), col("k")).collect()
      .map(r => (r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    // every (j, bucket) holds exactly the brute-force count
    for (j <- 0 until Sketches.cmsDepth) {
      assert(sk((j, bruteBucket(7L, j))) >= 3L)
      assert(sk((j, bruteBucket(11L, j))) >= 1L)
    }
    // 7 and 11 do not collide on every row of this family -> min is exact
    val probes = Seq(("g", 7L), ("g", 11L), ("g", 999L)).toDF("g", "k")
    val est = Sketches.cmsEstimate(
        Sketches.cmsSketch(df, Seq("g"), col("k")), Seq("g"), probes, "k")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(est(7L) === 3L)
    assert(est(11L) === 1L)
    // an absent key estimates only its collisions -> >= 0, and never
    // below its true count of 0
    assert(est(999L) >= 0L)
  }

  test("cms: merge linearity — per-shard sketches sum to the direct global sketch") {
    val df = (1 to 400).map(i => (s"s${i % 3}", (i % 17).toLong)).toDF("shard", "k")
    val perShard = Sketches.cmsSketch(df, Seq("shard"), col("k"))
      .withColumn("g", lit("all"))
    val merged = Sketches.cmsMerge(perShard, Seq("g"))
      .select(col("j"), col("bucket"), col("cnt"))
    val direct = Sketches.cmsSketch(df.withColumn("g", lit("all")), Seq("g"), col("k"))
      .select(col("j"), col("bucket"), col("cnt"))
    assert(merged.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq ===
      direct.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq)
  }

  test("cms: Complete-mode streaming state equals the batch sketch across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val rows = (1 to 300).map(i => (s"t${i % 2}", (i % 40).toLong))
    val input = MemoryStream[(String, Long)]
    val q = Sketches.cmsSketch(input.toDF().toDF("g", "k"), Seq("g"), col("k"))
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
      .format("memory").queryName("cms_stream").start()
    try {
      rows.grouped(70).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("cms_stream").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    val batch = Sketches.cmsSketch(rows.toDF("g", "k"), Seq("g"), col("k")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(streamed === batch)
  }

  test("cms: never underestimates on an adversarial collision-heavy multiset") {
    // 500 distinct keys into 64 buckets: heavy collisions everywhere
    val df = (1 to 1500).map(i => ("g", (i % 500).toLong)).toDF("g", "k")
    val sk = Sketches.cmsSketch(df, Seq("g"), col("k"))
    val probes = (0 until 500 by 7).map(k => ("g", k.toLong)).toDF("g", "k")
    val est = Sketches.cmsEstimate(sk, Seq("g"), probes, "k").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val exact = (1 to 1500).map(_ % 500).groupBy(identity).map { case (k, v) => k.toLong -> v.size.toLong }
    for ((k, e) <- est) assert(e >= exact.getOrElse(k, 0L), s"key $k")
  }
}
