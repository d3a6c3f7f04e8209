package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("changeset apply: update, delete, insert, update-then-delete, resurrect, untouched") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (5L, "e", 50.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (1L, Some("a2"), Some(11.0), 1L, "upsert"),  // plain update
      (2L, None, None, 1L, "delete"),              // plain delete
      (6L, Some("f"), Some(60.0), 1L, "upsert"),   // insert
      (3L, Some("c2"), Some(31.0), 1L, "upsert"),  // update then...
      (3L, None, None, 2L, "delete"),              //   ...delete: must vanish
      (4L, None, None, 1L, "delete"),              // delete then...
      (4L, Some("d2"), Some(42.0), 2L, "upsert"))  //   ...upsert: resurrects
      .toDF("k", "name", "bal", "seq", "op")
    val got = Upsert.applyChangeset(snap, changes, Seq("k"), "seq", "op")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq(
      (1L, "a2", 11.0),  // updated
      (4L, "d2", 42.0),  // resurrected with the later values
      (5L, "e", 50.0),   // untouched snapshot row survives
      (6L, "f", 60.0)))  // inserted
    // idempotence: applying an empty changeset is the identity
    val empty = changes.limit(0)
    val again = Upsert.applyChangeset(snap, empty, Seq("k"), "seq", "op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(again.toSeq === Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (5L, "e", 50.0)))
    // the aggregate shape: no window, partial-combining hash aggregate
    val plan = Upsert.applyChangeset(snap, changes, Seq("k"), "seq", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }
}
