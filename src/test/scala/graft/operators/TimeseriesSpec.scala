package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, String, Double)*) =
    rows.toSeq.toDF("event_id", "user_id", "tss", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
      .drop("tss")

  test("transitionMatrix: adjacency is per-user, ties break on event_id, ppb floors") {
    val events = ev(
      (1L, 1L, "2024-01-01 00:00:01", "a", 0.0),
      (2L, 1L, "2024-01-01 00:00:02", "b", 0.0),
      (3L, 1L, "2024-01-01 00:00:03", "a", 0.0),
      // u2: same instant — event_id orders a before b
      (4L, 2L, "2024-01-01 00:00:01", "a", 0.0),
      (5L, 2L, "2024-01-01 00:00:01", "b", 0.0),
      // u3: single event — no transition
      (6L, 3L, "2024-01-01 00:00:01", "c", 0.0))
    val m = Timeseries.transitionMatrix(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // a → b twice (u1 and u2), a's total outgoing = 2; b → a once
    assert(m(("a", "b")) === ((2L, 2L, 1000000000L)))
    assert(m(("b", "a")) === ((1L, 1L, 1000000000L)))
    assert(m.size === 2) // u3's lone event contributes nothing
    // floored ppb: 1 of 3 transitions = 333333333, not rounded up
    val uneven = ev(
      (1L, 9L, "2024-01-01 00:00:01", "x", 0.0),
      (2L, 9L, "2024-01-01 00:00:02", "y", 0.0),
      (3L, 9L, "2024-01-01 00:00:03", "x", 0.0),
      (4L, 9L, "2024-01-01 00:00:04", "y", 0.0),
      (5L, 9L, "2024-01-01 00:00:05", "x", 0.0),
      (6L, 9L, "2024-01-01 00:00:06", "z", 0.0))
    val ppb = Timeseries.transitionMatrix(uneven).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(ppb(("x", "y")) === 666666666L) // 2/3 floored
    assert(ppb(("x", "z")) === 333333333L) // 1/3 floored
  }

  test("timeWeightedAvg: hold-until-next weighting, last point carries no weight") {
    // u1: value 10 held 3s, value 20 held 1s, final 99 unweighted
    //     → (10·3 + 20·1)/4 = 12.5
    val events = ev(
      (1L, 1L, "2024-01-01 00:00:00", "e", 10.0),
      (2L, 1L, "2024-01-01 00:00:03", "e", 20.0),
      (3L, 1L, "2024-01-01 00:00:04", "e", 99.0),
      // u2: single event — no interval, excluded entirely
      (4L, 2L, "2024-01-01 00:00:00", "e", 7.0))
    val rows = Timeseries.timeWeightedAvg(events).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 1L)
    assert(r.getLong(1) === 2L)             // n_intervals
    assert(r.getLong(2) === 4000000L)       // total_us
    assert(r.getDouble(3) === 12.5)
  }

  test("timeWeightedAvg: zero-duration interval contributes zero weight") {
    val events = ev(
      (1L, 1L, "2024-01-01 00:00:00", "e", 10.0),
      (2L, 1L, "2024-01-01 00:00:00", "e", 50.0), // same instant as e1
      (3L, 1L, "2024-01-01 00:00:02", "e", 30.0))
    // e1 held 0s, e2 held 2s → (10·0 + 50·2)/2 = 50
    val r = Timeseries.timeWeightedAvg(events).collect().head
    assert(r.getDouble(3) === 50.0)
  }

  test("activeStreaks: consecutive days merge, gaps split, runs are per-user") {
    val events = ev(
      (1L, 1L, "2024-01-01 10:00:00", "e", 0.0),
      (2L, 1L, "2024-01-01 23:00:00", "e", 0.0), // same day, dedups
      (3L, 1L, "2024-01-02 00:00:01", "e", 0.0),
      (4L, 1L, "2024-01-03 12:00:00", "e", 0.0),
      (5L, 1L, "2024-01-05 12:00:00", "e", 0.0), // gap → new island
      (6L, 2L, "2024-01-03 00:00:00", "e", 0.0)) // other user, own island
    val islands = Timeseries.activeStreaks(events).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDate(2).toString, r.getLong(3)))
      .toSet
    assert(islands === Set(
      (1L, "2024-01-01", "2024-01-03", 3L),
      (1L, "2024-01-05", "2024-01-05", 1L),
      (2L, "2024-01-03", "2024-01-03", 1L)))
  }

  test("ewmaSql: warm-up renormalizes (first row = its own value), constants are fixed points") {
    ev(
      (1L, 1L, "2024-01-01 00:00:01", "e", 5.0),
      (2L, 1L, "2024-01-01 00:00:02", "e", 5.0),
      (3L, 1L, "2024-01-01 00:00:03", "e", 5.0),
      (4L, 2L, "2024-01-01 00:00:01", "e", 8.25))
      .createOrReplaceTempView("ts_ewma_const")
    val rows = spark.sql(Timeseries.ewmaSql("ts_ewma_const")).collect()
    // a constant series is a fixed point of any normalized moving
    // average, at every warm-up depth
    assert(rows.filter(_.getLong(0) == 1L).forall(_.getDouble(3) == 5.0))
    // a single observation renormalizes to exactly itself
    assert(rows.find(_.getLong(0) == 2L).get.getDouble(3) === 8.25)
  }

  test("ewmaSql matches a driver-side replay of the truncated recurrence") {
    val vals = Seq(1.0, 4.0, 2.0, 8.0, 5.0, 7.0, 3.0, 6.0, 9.0, 2.5)
    ev(vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, 1L, f"2024-01-01 00:00:${i + 1}%02d", "e", v)
    }: _*).createOrReplaceTempView("ts_ewma_replay")
    val got = spark.sql(Timeseries.ewmaSql("ts_ewma_replay"))
      .collect().sortBy(_.getLong(1)).map(_.getDouble(3))
    val a = 0.3
    val want = vals.indices.map { i =>
      val ks = (0 until 8).filter(_ <= i)
      val num = ks.map(k => a * math.pow(0.7, k) * vals(i - k)).sum
      val den = ks.map(k => a * math.pow(0.7, k)).sum
      num / den
    }
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-3, s"got $g want $w")
    }
  }

  private def daily(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("user_id", "ds", "v_obs")
      .withColumn("d", to_date(col("ds"))).drop("ds")

  test("gapFillDaily: densify, LOCF, and linear interpolation over a 3-day gap") {
    val df = daily((1L, "2024-01-01", 0.0), (1L, "2024-01-04", 3.0),
      (2L, "2024-01-02", 7.0))
    val rows = Timeseries.gapFillDaily(df).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (r.getBoolean(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(rows((1L, "2024-01-01")) === ((true, 0.0, 0.0)))
    assert(rows((1L, "2024-01-02")) === ((false, 0.0, 1.0))) // LOCF holds, interp climbs
    assert(rows((1L, "2024-01-03")) === ((false, 0.0, 2.0)))
    assert(rows((1L, "2024-01-04")) === ((true, 3.0, 3.0)))
    assert(rows((2L, "2024-01-02")) === ((true, 7.0, 7.0))) // single-day span: just itself
    assert(rows.size === 5)
  }

  test("gapFillDaily: .xxxx5 interpolation ties round HALF_UP identically for both signs") {
    // midpoint of 1.0001 and 1.0002 is exactly 1.00015 — the tie the
    // integer rounding exists for (double round() is engine-dependent
    // here); away-from-zero means the negative twin lands on -1.0002
    val df = daily(
      (1L, "2024-01-01", 1.0001), (1L, "2024-01-03", 1.0002),
      (2L, "2024-01-01", -1.0001), (2L, "2024-01-03", -1.0002))
    val rows = Timeseries.gapFillDaily(df).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.getDouble(4)).toMap
    assert(rows((1L, "2024-01-02")) === 1.0002)
    assert(rows((2L, "2024-01-02")) === -1.0002)
  }

  test("interArrivalPercentiles: gaps are per (user, type); disc ranks land on exact elements") {
    // user 1 type e: gaps 1s ×18, 10s, 100s (20 events) → p50=1s,
    // p95 = rank ceil(0.95·20)=19 → 10s, p99 = rank 20 → 100s;
    // user 2's single event and type f's single event contribute no gap
    val base = (0 until 18).scanLeft(0L)((acc, _) => acc + 1L) // 0, 1, ..., 18 s
    val times = base ++ Seq(base.last + 10L, base.last + 110L)
    val rows = times.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, 1L, 1704103200000000L + t * 1000000L, "e", 0.0)
    } :+ ((100L, 2L, 1704103200000000L, "e", 0.0)) :+ ((101L, 1L, 1704103200000000L, "f", 0.0))
    val df = rows.toDF("event_id", "user_id", "tus", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(tus)")).drop("tus")
    val got = Timeseries.interArrivalPercentiles(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got("e") === ((20L, 1000000.0, 10000000.0, 100000000.0)))
    assert(!got.contains("f")) // singletons yield no gaps
  }

  test("lag1Autocorr: linear trend reads r2 = 1e9 with sign +1, alternation sign -1, flat null") {
    var id = 0L
    def day(userBase: Long, typ: String, dayIdx: Int, k: Int) =
      (1 to k).map { j =>
        id += 1
        (id, userBase + j, f"2024-01-${dayIdx + 1}%02d 10:00:00", typ, 0.0)
      }
    val events = ev((
      // "trend": counts 1,2,3,4,5 → consecutive pairs colinear (y = x+1)
      (0 until 5).flatMap(i => day(10L, "trend", i, i + 1)) ++
      // "alt": counts 10,20,10,20,10 → perfect negative correlation
      (0 until 5).flatMap(i => day(20L, "alt", i, if (i % 2 == 0) 10 else 20)) ++
      // "flat": constant counts → zero variance → null r2, sign 0
      (0 until 4).flatMap(i => day(30L, "flat", i, 3))): _*)
    val got = Timeseries.lag1Autocorr(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(got("trend") === ((4L, 1, Some(1000000000L))))
    assert(got("alt") === ((4L, -1, Some(1000000000L))))
    assert(got("flat") === ((3L, 0, None)))
  }

  test("ewmaSql rejects out-of-range term counts") {
    intercept[IllegalArgumentException](Timeseries.ewmaSql("t", terms = 0))
    intercept[IllegalArgumentException](Timeseries.ewmaSql("t", terms = 17))
  }
}
