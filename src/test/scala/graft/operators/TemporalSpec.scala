package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks the latest at-or-before right row per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 10L, ts("2024-01-01 12:00:00"), 2.0),
      (3L, 20L, ts("2024-01-01 09:00:00"), 3.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 100L),
      (10L, ts("2024-01-01 11:00:00"), 101L),
      (20L, ts("2024-01-01 09:00:00"), 200L)) // equal ts → matches (<=)
      .toDF("user_id", "ts", "p_event")
    val out = Temporal.asofJoin(left, right, "user_id", "ts", Seq("p_event"))
      .orderBy("event_id").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(4)))).toSeq === Seq(
      (1L, Some(100L)), // 10:00 → 09:30 row
      (2L, Some(101L)), // 12:00 → 11:00 row
      (3L, Some(200L)))) // equal timestamp matches
  }

  test("left rows before any right row get null matches") {
    val left = Seq((1L, 10L, ts("2024-01-01 08:00:00"), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq((10L, ts("2024-01-01 09:00:00"), 100L))
      .toDF("user_id", "ts", "p_event")
    val out = Temporal.asofJoin(left, right, "user_id", "ts", Seq("p_event")).collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(4))
  }

  test("NULL field in the matched right row is preserved, not back-filled from older rows") {
    val left = Seq((1L, 10L, ts("2024-01-01 12:00:00"), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), Option(100L), Option(5.0)),
      (10L, ts("2024-01-01 11:00:00"), Option(101L), Option.empty[Double]))
      .toDF("user_id", "ts", "p_event", "p_value")
    val out = Temporal.asofJoin(left, right, "user_id", "ts", Seq("p_event", "p_value"))
      .collect()
    assert(out.length === 1)
    // the matched row is 11:00 (p_event=101, p_value NULL): the NULL
    // must survive — a per-column last(ignoreNulls) would have mixed
    // in 5.0 from the 09:00 row
    assert(out.head.getLong(4) === 101L)
    assert(out.head.isNullAt(5))
  }

  test("latestPerKeyTs keeps one deterministic row per (key, ts)") {
    val df = Seq(
      (10L, ts("2024-01-01 09:00:00"), 1L),
      (10L, ts("2024-01-01 09:00:00"), 7L),
      (10L, ts("2024-01-01 10:00:00"), 3L))
      .toDF("user_id", "ts", "p_event")
    val out = Temporal.latestPerKeyTs(df, "user_id", "ts", "p_event")
      .orderBy("ts").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(7L, 3L))
  }

  test("asof join matches a brute-force reference on randomized inputs") {
    val rng = new scala.util.Random(42) // fixed seed — deterministic spec
    for (_ <- 0 until 5) {
      val nL = 30 + rng.nextInt(40)
      val nR = 10 + rng.nextInt(30)
      def randTs() = ts(f"2024-01-01 ${rng.nextInt(24)}%02d:${rng.nextInt(60)}%02d:00")
      val leftRows = (1 to nL).map(i => (i.toLong, (rng.nextInt(4) + 1).toLong, randTs(), rng.nextDouble()))
      // unique (key, ts) on the right — the operator's documented precondition
      val rightRows = scala.util.Random.shuffle(
        (1 to nR).map(i => ((rng.nextInt(5) + 1).toLong, randTs(), i.toLong))
      ).distinctBy(r => (r._1, r._2))
      val left = leftRows.toDF("event_id", "user_id", "ts", "value")
      val right = rightRows.toDF("user_id", "ts", "p_event")
      val out = Temporal.asofJoin(left, right, "user_id", "ts", Seq("p_event"))
        .select("event_id", "r_p_event").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      // brute force: for each left row, the right row with max ts <= left.ts, same key
      leftRows.foreach { case (eid, uid, lts, _) =>
        val expect = rightRows.filter(r => r._1 == uid && !r._2.after(lts))
          .sortBy(_._2.getTime).lastOption.map(_._3)
        assert(out(eid) === expect, s"event $eid user $uid ts $lts")
      }
    }
  }

  test("asof join is a single-shuffle plan") {
    val events = graft.queries.Relational.events(spark, Sf)
    val l = events.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val r = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_event"))
    val plan = Temporal.asofJoin(l, r, "user_id", "ts", Seq("p_event"))
      .queryExecution.executedPlan.toString
    // one Exchange for the window partitioning; the union adds none
    val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges <= 2, plan) // hashpartitioning exchange (may appear in reuse text)
  }

  test("forward asof picks the earliest following right row, inclusive at equal ts") {
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val l = Seq((1L, 7L, t(100)), (2L, 7L, t(250)), (3L, 7L, t(400)), (4L, 8L, t(100)))
      .toDF("id", "k", "ts")
    val r = Seq((7L, t(100), "a"), (7L, t(300), "b"), (8L, t(50), "c"))
      .toDF("k", "ts", "v")
    val got = Temporal.asofJoin(l, r, "k", "ts", Seq("v"), forward = true)
      .orderBy("id").collect().map(x => x.getLong(0) -> Option(x.getString(3))).toMap
    // id1: equal-ts right matches (inclusive); id2: next is t300 "b";
    // id3: nothing follows -> NULL; id4: right at t50 precedes -> NULL
    assert(got === Map(1L -> Some("a"), 2L -> Some("b"), 3L -> None, 4L -> None))
    // backward on the same frame, for contrast: id3 sees "b", id4 sees "c"
    val back = Temporal.asofJoin(l, r, "k", "ts", Seq("v"))
      .orderBy("id").collect().map(x => x.getLong(0) -> Option(x.getString(3))).toMap
    assert(back === Map(1L -> Some("a"), 2L -> Some("a"), 3L -> Some("b"), 4L -> Some("c")))
  }

  test("interval overlap join: bucketed rewrite equals the naive theta join, as an equi-join plan") {
    import spark.implicits._
    val l = Seq((1L, 10L, 25L), (2L, 30L, 30L), (3L, 95L, 140L))
      .toDF("lid", "ls", "le")
    val r = Seq((10L, 20L, 40L), (20L, 26L, 29L), (30L, 100L, 100L), (40L, 500L, 600L))
      .toDF("rid", "rs", "re")
    val got = Temporal.intervalOverlapJoin(l, r, "ls", "le", "rs", "re", bucketUs = 7L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // naive all-pairs ground truth
    val naive = l.crossJoin(r)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === naive)
    // hand-checked: 1 overlaps [20,40] (touching at 20..25); 2 is the
    // point 30 inside [20,40]; 3 contains the point 100; nothing
    // meets [26,29] or [500,600] except closed-bound touches
    assert(naive === Set((1L, 10L), (2L, 10L), (3L, 30L)))
    // bucket width must not change the answer, only the explode factor
    for (b <- Seq(1L, 3L, 1000L)) {
      val g = Temporal.intervalOverlapJoin(l, r, "ls", "le", "rs", "re", b)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(g === naive, s"bucket $b")
    }
    // the rewrite is an equi-join, not a nested loop
    val plan = Temporal.intervalOverlapJoin(l, r, "ls", "le", "rs", "re", 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("scd2 intervals: change compaction, versioning, null-state changes, tiebreaks") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: A, A (no change), B, B, A — 3 versions
      (1L, "2024-01-01 10:00:00", Some("A"), 1L),
      (1L, "2024-01-01 11:00:00", Some("A"), 2L),
      (1L, "2024-01-01 12:00:00", Some("B"), 3L),
      (1L, "2024-01-01 13:00:00", Some("B"), 4L),
      (1L, "2024-01-01 14:00:00", Some("A"), 5L),
      // u2: NULL -> A -> NULL: null states are real versions
      (2L, "2024-01-01 10:00:00", None, 6L),
      (2L, "2024-01-01 11:00:00", Some("A"), 7L),
      (2L, "2024-01-01 12:00:00", None, 8L),
      // u3: ts collision broken by event_id: B(id 10) is the later state
      (3L, "2024-01-01 10:00:00", Some("A"), 9L),
      (3L, "2024-01-01 10:00:00", Some("B"), 10L))
      .toDF("user_id", "tss", "attr", "event_id")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"), col("attr"), col("event_id"))
    val got = Temporal.scd2Intervals(ev, "user_id", "ts", "attr", "event_id")
      .orderBy("user_id", "version").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
    val u1 = got.filter(_._1 == 1L)
    assert(u1.map(x => (x._2, x._3, x._6)).toSeq ===
      Seq((Some("A"), 1L, false), (Some("B"), 2L, false), (Some("A"), 3L, true)))
    // intervals chain: v1 closes exactly when v2 opens
    assert(u1(0)._5.get === u1(1)._4 && u1(1)._5.get === u1(2)._4)
    assert(u1(1)._4 === ts("2024-01-01 12:00:00"))
    val u2 = got.filter(_._1 == 2L)
    assert(u2.map(_._2).toSeq === Seq(None, Some("A"), None))
    assert(u2.last._6 && u2.init.forall(!_._6))
    val u3 = got.filter(_._1 == 3L)
    assert(u3.map(x => (x._2, x._6)).toSeq === Seq((Some("A"), false), (Some("B"), true)))
    // exactly one current row per key, versions are 1..n
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.count(_._6) === 1)
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq)
    }
  }

  test("pitJoin: probes pick the version valid at their as-of instant, boundaries half-open") {
    // key 1: A from 10:00, B from 12:00 (current)
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "A"),
      (2L, 1L, ts("2024-01-01 12:00:00"), "B"))
      .toDF("event_id", "user_id", "ts", "attr")
    val dim = Temporal.scd2Intervals(events, "user_id", "ts", "attr", "event_id")
    val probes = Seq(
      (100L, 1L, ts("2024-01-01 09:59:59")), // before v1 → NULLs
      (101L, 1L, ts("2024-01-01 10:00:00")), // valid_from inclusive → A
      (102L, 1L, ts("2024-01-01 11:59:59")), // inside v1 → A
      (103L, 1L, ts("2024-01-01 12:00:00")), // valid_to exclusive → B
      (104L, 1L, ts("2024-01-01 23:00:00")), // open current version → B
      (105L, 9L, ts("2024-01-01 12:00:00"))) // unknown key → NULLs
      .toDF("probe_id", "user_id", "asof")
    val got = Temporal.pitJoin(probes, dim, "user_id", "asof")
      .orderBy("probe_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(got.toSeq === Seq(
      (100L, None, None),
      (101L, Some("A"), Some(1L)),
      (102L, Some("A"), Some(1L)),
      (103L, Some("B"), Some(2L)),
      (104L, Some("B"), Some(2L)),
      (105L, None, None)))
    // exactly one output row per probe: intervals partition the timeline
    assert(got.length === 6)
  }

  test("pitJoin: colliding dim payload columns come back suffixed _dim; probe's stay intact") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "A"),
      (2L, 1L, ts("2024-01-01 12:00:00"), "B"))
      .toDF("event_id", "user_id", "ts", "attr")
    val dim = Temporal.scd2Intervals(events, "user_id", "ts", "attr", "event_id")
    // probes carry their OWN valid_from and attr — resolution must not
    // be ambiguous, and neither probe column may be dropped/overwritten
    val probes = Seq(
      (100L, 1L, ts("2024-01-01 11:00:00"), ts("2023-06-01 00:00:00"), "probe_attr"))
      .toDF("probe_id", "user_id", "asof", "valid_from", "attr")
    val out = Temporal.pitJoin(probes, dim, "user_id", "asof")
    // probe's valid_from survives with its value; dim's was dropped
    assert(out.columns.count(_ == "valid_from") === 1)
    val row = out.collect().head
    assert(row.getAs[java.sql.Timestamp](out.columns.indexOf("valid_from")) ===
      ts("2023-06-01 00:00:00"))
    // both attrs present: the probe's keeps the bare name, the dim
    // version's is renamed attr_dim (no duplicate output columns)
    assert(out.columns.count(_ == "attr") === 1)
    assert(out.columns.count(_ == "attr_dim") === 1)
    assert(row.getString(out.columns.indexOf("attr")) === "probe_attr")
    assert(row.getString(out.columns.indexOf("attr_dim")) === "A")
    assert(row.getLong(out.columns.indexOf("version")) === 1L)
  }

  test("pitJoin: fails fast when both <name> and <name>_dim are taken on the probe") {
    val events = Seq((1L, 1L, ts("2024-01-01 10:00:00"), "A"))
      .toDF("event_id", "user_id", "ts", "attr")
    val dim = Temporal.scd2Intervals(events, "user_id", "ts", "attr", "event_id")
    val probes = Seq((100L, 1L, ts("2024-01-01 11:00:00"), "p", "pd"))
      .toDF("probe_id", "user_id", "asof", "attr", "attr_dim")
    val ex = intercept[IllegalArgumentException] {
      Temporal.pitJoin(probes, dim, "user_id", "asof")
    }
    assert(ex.getMessage.contains("attr"))
  }
}
