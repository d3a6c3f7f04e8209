package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val Steps = Seq("view", "click", "purchase")

  private def ev(rows: (Long, String, String)*) =
    rows.toSeq.toDF("user_id", "tss", "event_type")
      .withColumn("ts", to_timestamp(col("tss")))

  test("funnel state machine: order matters, out-of-order steps don't count") {
    val events = ev(
      // u1: the full funnel in order
      (1L, "2024-01-01 00:00:01", "view"),
      (1L, "2024-01-01 00:00:02", "click"),
      (1L, "2024-01-01 00:00:03", "purchase"),
      // u2: click BEFORE the first view never counts
      (2L, "2024-01-01 00:00:01", "click"),
      (2L, "2024-01-01 00:00:02", "view"),
      (2L, "2024-01-01 00:00:03", "purchase"),
      // u3: purchase before click is skipped, later click still advances
      (3L, "2024-01-01 00:00:01", "view"),
      (3L, "2024-01-01 00:00:02", "purchase"),
      (3L, "2024-01-01 00:00:03", "click"),
      // u4: view only
      (4L, "2024-01-01 00:00:05", "view"),
      // u5: click only — never enters the funnel
      (5L, "2024-01-01 00:00:01", "click"))
    val stages = Funnel.userStages(events, Steps).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stages === Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0))
  }

  test("same-timestamp step events count (>= semantics via priority ordering)") {
    val events = ev(
      (6L, "2024-01-01 00:00:01", "view"),
      (6L, "2024-01-01 00:00:01", "click"), // same instant as the view
      (6L, "2024-01-01 00:00:02", "purchase"))
    val stages = Funnel.userStages(events, Steps).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stages === Map(6L -> 3))
  }

  test("fold matches a brute-force reference on random event streams") {
    // property-style: 40 users × random step sequences, the
    // distributed fold must equal a driver-side replay of the same
    // greedy state machine over the (ts, priority)-sorted events
    val rnd = new scala.util.Random(11)
    val types = Seq("view", "click", "purchase", "error", "signup")
    val rows = for {
      u <- 1L to 40L
      n = 1 + rnd.nextInt(8)
      i <- 0 until n
    } yield (u, f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00",
      types(rnd.nextInt(types.size)))
    val got = Funnel.userStages(ev(rows: _*), Steps).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = rows.groupBy(_._1).collect { case (u, evs) =>
      val sorted = evs
        .map { case (_, t, ty) => (java.sql.Timestamp.valueOf(t).getTime, Steps.indexOf(ty)) }
        .sortBy(e => (e._1, e._2))
      var st = 0
      sorted.foreach { case (_, p) => if (st < Steps.size && p == st) st += 1 }
      u -> st
    }.filter { case (u, _) => rows.exists(r => r._1 == u && Steps.contains(r._3)) }.toMap
    assert(got === want)
  }

  test("report counts users reaching at least each stage") {
    val events = ev(
      (1L, "2024-01-01 00:00:01", "view"),
      (1L, "2024-01-01 00:00:02", "click"),
      (1L, "2024-01-01 00:00:03", "purchase"),
      (2L, "2024-01-01 00:00:02", "view"),
      (3L, "2024-01-01 00:00:01", "view"),
      (3L, "2024-01-01 00:00:03", "click"),
      (5L, "2024-01-01 00:00:01", "click"))
    val rep = Funnel.report(events, Steps).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rep.toSeq.sortBy(_._1) ===
      Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }
}
