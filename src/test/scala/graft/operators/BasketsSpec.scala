package graft.operators

import graft.SparkSpec

class BasketsSpec extends SparkSpec {
  import spark.implicits._

  test("pairMetrics: hand-checked support/confidence/lift, duplicates dedup, canonical order") {
    // baskets: 1{A,B}, 2{A,B,C}, 3{A}, 4{B,C} — A appears twice in
    // basket 3 to prove the per-basket dedup
    val items = Seq(
      (1L, "A"), (1L, "B"),
      (2L, "A"), (2L, "B"), (2L, "C"),
      (3L, "A"), (3L, "A"),
      (4L, "B"), (4L, "C")).toDF("oid", "item")
    val rows = Baskets.pairMetrics(items, "oid", "item").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    // n_A=3 n_B=3 n_C=2, N=4
    // AB: n_ab=2, conf=2/3→666666666, lift=(666666666·4)//3=888888888
    assert(rows(("A", "B")) === ((3L, 3L, 2L, 4L, 666666666L, 888888888L)))
    // AC: n_ab=1, conf=1/3→333333333, lift=(333333333·4)//2=666666666
    assert(rows(("A", "C")) === ((3L, 2L, 1L, 4L, 333333333L, 666666666L)))
    // BC: n_ab=2, conf=2/3→666666666, lift=(666666666·4)//2=1333333332
    assert(rows(("B", "C")) === ((3L, 2L, 2L, 4L, 666666666L, 1333333332L)))
    // no reverse-direction or self pairs
    assert(rows.size === 3)
  }

  test("pairMetrics: baskets with a single item produce no pairs but count in totals") {
    val items = Seq((1L, "A"), (2L, "A"), (3L, "A"), (3L, "B")).toDF("oid", "item")
    val rows = Baskets.pairMetrics(items, "oid", "item").collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getString(0), r.getString(1)) === (("A", "B")))
    assert(r.getLong(2) === 3L) // n_a counts all of A's baskets
    assert(r.getLong(5) === 3L) // n_baskets counts pair-less baskets too
    // perfect implication B→A but measured direction is A→B: 1/3
    assert(r.getLong(6) === 333333333L)
  }
}
