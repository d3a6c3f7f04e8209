package graft.operators

import graft.SparkSpec

class DiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  test("keyDistribution: hand-checked counts, hottest key, share and skew ppb") {
    // key 1 x6, key 2 x2, key 3 x2 → n=10, keys=3, max=6, median cnt=2
    val df = (Seq.fill(6)(1L) ++ Seq.fill(2)(2L) ++ Seq.fill(2)(3L)).toDF("k")
    val r = Diagnostics.keyDistribution(df, "k").collect().head
    assert(r.getLong(0) === 10L)      // n_rows
    assert(r.getLong(1) === 3L)       // n_keys
    assert(r.getLong(2) === 6L)       // max_cnt
    assert(r.getDouble(3) === 2.0)    // p50_cnt
    assert(r.getLong(4) === 1L)       // hot_key
    assert(r.getLong(5) === 6L)       // hot_cnt
    assert(r.getLong(6) === 600000000L)  // 6/10 share
    assert(r.getLong(7) === 1800000000L) // max/mean = 6/(10/3) = 1.8
  }

  test("keyDistribution: uniform keys report skew exactly 10^9 and tie-break the hot key low") {
    val df = Seq(5L, 5L, 7L, 7L, 9L, 9L).toDF("k")
    val r = Diagnostics.keyDistribution(df, "k").collect().head
    assert(r.getLong(7) === 1000000000L)
    assert(r.getLong(4) === 5L) // count tie → smallest key wins
  }
}
