package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Pipeline3Spec extends SparkSpec {
  import spark.implicits._

  test("streaming heavy hitters equals the batch sketch query row-for-row") {
    // the replay splits the token stream into 4 micro-batches, so
    // agreement with the batch form proves the Misra-Gries state
    // merges across batch boundaries (no single batch sees the full
    // stream) and the MG theorems hold for the streamed merge order
    val streamed = Pipeline3.streamHeavyHitters(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    val batch = Relational6.heavyHitters(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.nonEmpty)
    // every guaranteed-heavy token is found with an in-bound estimate
    streamed.foreach { case (_, _, found, estOk) => assert(found && estOk) }
  }

  test("score calibration: exact decile bins, rates, and bucket invariance") {
    import graft.pipeline.TextAnalysis
    // 6 docs, scores 60..10 → with bins=3: ranks 1-2 bin 0, 3-4 bin 1,
    // 5-6 bin 2; flags fire for the top two and one middle doc
    val scored = Seq((1L, 60.0), (2L, 50.0), (3L, 40.0), (4L, 30.0), (5L, 20.0), (6L, 10.0))
      .toDF("doc_id", "score")
    val flags = Seq((1L, true), (2L, true), (3L, false), (4L, true), (5L, false), (6L, false))
      .toDF("doc_id", "flag")
    val got = TextAnalysis.scoreCalibration(scored, flags, bins = 3, nBuckets = 4)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      (0L, 2L, 2L, 1000000000L, 50.0, 60.0),
      (1L, 2L, 1L, 500000000L, 30.0, 40.0),
      (2L, 2L, 0L, 0L, 10.0, 20.0)))
    // two-pass bucketed ranking ≡ the serial single-bucket shape
    val serial = TextAnalysis.scoreCalibration(scored, flags, bins = 3, nBuckets = 1)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq === serial.toSeq)
    // ties on score fall back to doc_id order — a total order, so the
    // cut never splits nondeterministically
    val tied = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 5.0)).toDF("doc_id", "score")
    val tf = Seq((1L, true), (2L, true), (3L, false), (4L, false)).toDF("doc_id", "flag")
    val t = TextAnalysis.scoreCalibration(tied, tf, bins = 2, nBuckets = 4)
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(t.toSeq === Seq((0L, 2L), (1L, 0L)))
    // flags outside the scored universe are ignored (inner join)
    val extra = tf.unionAll(Seq((99L, true)).toDF("doc_id", "flag"))
    assert(TextAnalysis.scoreCalibration(tied, extra, bins = 2, nBuckets = 4)
      .agg(sum("n_docs")).head.getLong(0) === 4L)
  }

  test("dedup removal report: per-stratum counts follow the survivor election") {
    import graft.pipeline.Dedup
    val d = Seq(
      (1L, "en", "src0"), (2L, "en", "src0"), (3L, "en", "src0"),
      (4L, "en", "src1"), (5L, "de", "src0"))
      .toDF("doc_id", "lang", "source")
    // cluster {1,2}: survivor 2; docs 3-5 un-clustered
    val election = Seq((1L, 10L, 2L, false), (2L, 10L, 2L, true))
      .toDF("doc_id", "cluster_id", "keep_id", "is_kept")
    val got = Dedup.removalReport(d, election).orderBy("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      ("de", "src0", 1L, 0L, 0L, 0L),
      ("en", "src0", 3L, 2L, 1L, 333333333L),
      ("en", "src1", 1L, 0L, 0L, 0L)))
    // an empty election degenerates to a pure census
    val empty = Seq.empty[(Long, Boolean)].toDF("doc_id", "is_kept")
    assert(Dedup.removalReport(d, empty).collect()
      .forall(r => r.getLong(4) === 0L && r.getLong(5) === 0L))
  }

  test("streaming distinct sketch: state merges across batches and meets the 2% contract") {
    val streamed = Pipeline3.streamDistinctSketch(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val batch = Relational.events(spark, Sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed.keySet === batch.keySet)
    // exact columns agree with batch; the merged-sketch estimate is in
    // contract for every event type (no single micro-batch sees all
    // users, so this exercises the cross-batch HLL union)
    streamed.foreach { case (et, (n, u, ok)) =>
      assert((n, u) === batch(et)); assert(ok)
    }
  }

  test("stream late audit: the watermark drops exactly the closed-window stragglers") {
    val rows = Pipeline3.streamLateAudit(spark, Sf).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    // no bucket over-counts (a duplicate Append emission would make
    // the deficit negative) and no bucket loses non-straggler rows
    rows.foreach { case (_, nTotal, nStream, nDropped, lossy) =>
      assert(nDropped >= 0 && nDropped === nTotal - nStream)
      assert(lossy === (nDropped > 0))
    }
    // total drops = exactly the planted early-echo count
    val ev = Relational.events(spark, Sf)
    val mn = ev.agg(min(col("ts"))).head.getTimestamp(0)
    val earlyCount = ev.filter(
      col("ts") < lit(new java.sql.Timestamp(mn.getTime + 600000L))).count()
    assert(earlyCount > 0)
    assert(rows.map(_._4).sum === earlyCount)
    // drops concentrate in the earliest event-time region (the first
    // 10 minutes span at most two 15-minute buckets)
    val lossyBuckets = rows.filter(_._5).map(_._1)
    assert(lossyBuckets.nonEmpty && lossyBuckets.length <= 2)
    assert(lossyBuckets.forall(_.getTime < mn.getTime + 1800000L))
    // the in-delay stragglers were KEPT: the last real bucket double-
    // counts its echoes instead of dropping them
    val mx = ev.agg(max(col("ts"))).head.getTimestamp(0)
    val lastBucketStart = mx.getTime / 900000L * 900000L
    val last = rows.find(_._1.getTime === lastBucketStart).get
    assert(!last._5 && last._2 > 0)
    val recentCount = ev.filter(
      col("ts") > lit(new java.sql.Timestamp(mx.getTime - 180000L)) &&
        expr(s"unix_micros(ts) DIV 900000000 = ${mx.getTime / 900000L}")).count()
    // n_total of the last bucket includes the kept echoes once more
    // than the raw event count does
    val rawLast = ev.filter(
      expr(s"unix_micros(ts) DIV 900000000 = ${mx.getTime / 900000L}")).count()
    assert(last._2 === rawLast + recentCount)
  }

  test("null-aware anti join: the NOT IN trichotomy holds") {
    val r = Pipeline3.nullAwareAnti(spark, Sf).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    // a NULL in the subquery set makes NOT IN unsatisfiable
    assert(r("not_in_with_nulls") === 0L)
    // filtering the NULLs restores the plain anti join, and NOT EXISTS
    // (null-insensitive) agrees with it
    assert(r("not_in_nulls_filtered") > 0L)
    assert(r("not_exists") === r("not_in_nulls_filtered"))
  }

  test("streaming scd2 equals the batch interval build row-for-row") {
    // the replay splits events into 4 ts-range batches, so equality
    // with the batch operator proves closed versions emit correctly
    // across batch boundaries and the timeout flush finds every open
    // version (no single batch sees a full user history)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(2)) -> ((Option(r.getString(1)), r.getTimestamp(3),
        Option(r.getTimestamp(4)), r.getBoolean(5)))
    val streamed = Pipeline3.streamScd2(spark, Sf).collect().map(key).toMap
    val batch = graft.operators.Temporal.scd2Intervals(
      Relational.events(spark, Sf), "user_id", "ts", "event_type", "event_id")
      .collect().map(key).toMap
    assert(streamed.size === batch.size)
    assert(streamed === batch)
    // sanity: histories are real (multiple versions, exactly one current per user)
    val byUser = streamed.keys.groupBy(_._1)
    assert(byUser.values.exists(_.size > 1))
    byUser.foreach { case (_, ks) =>
      assert(ks.map(k => streamed(k)).count(_._4) === 1)
    }
  }

  test("source matrix: canonical unordered cells, exact ppb shares, cross flag") {
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L), (6L, 7L)).toDF("id_a", "id_b")
    val meta = Seq(1L -> "a", 2L -> "b", 3L -> "a", 4L -> "b", 5L -> "a", 6L -> "c", 7L -> "c")
      .toDF("doc_id", "source")
    val got = Pipeline3.sourceMatrixOn(pairs, meta).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // (4,5) = (b,a) canonicalizes into the same (a,b) cell as (1,2)
    assert(got === Map(
      ("a", "a") -> ((1L, 250000000L, false)),
      ("a", "b") -> ((2L, 500000000L, true)),
      ("c", "c") -> ((1L, 250000000L, false))))
  }

  test("threshold sweep: monotone nonincreasing in the cut, consistent with the pair table") {
    val sweep = Pipeline.dedupThresholdSweep(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sweep.map(_._1).toSeq === Seq(8000L, 8500L, 9000L, 9500L, 10000L))
    // tightening the cut can only shrink both counts
    sweep.sliding(2).foreach { case Array((_, p1, d1), (_, p2, d2)) =>
      assert(p2 <= p1 && d2 <= d1)
    }
    // the loosest cut sees the whole >= 0.8 pair table; docs affected is
    // the distinct endpoint count of exactly those pairs
    val pairs = Pipeline.dedupMinhashLsh(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val loosest = sweep.head
    assert(loosest._2 === pairs.length.toLong)
    assert(loosest._3 === pairs.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong)
    // and each count agrees with filtering the pair table by rounded bp
    for ((t, np, _) <- sweep)
      assert(np === pairs.count(p => math.round(p._3 * 10000) >= t).toLong)
  }
}
