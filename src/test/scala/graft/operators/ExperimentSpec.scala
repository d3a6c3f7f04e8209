package graft.operators

import graft.SparkSpec

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private def report(cells: (Int, Int, Int, Int)) = {
    // (a, b, c, d) = (v0 conv, v0 non, v1 conv, v1 non)
    val (a, b, c, d) = cells
    val rows = Seq.fill(a)((0, 1)) ++ Seq.fill(b)((0, 0)) ++
      Seq.fill(c)((1, 1)) ++ Seq.fill(d)((1, 0))
    Experiment.abReport(rows.toDF("variant", "converted")).collect().head
  }

  test("abReport: hand-computed 2x2 — chi2 and both ppb rates") {
    // a=30 b=70 c=60 d=40: chi2 = 200*(30*40-70*60)^2/(100*100*90*110)
    //                            = 200*9e6/9.9e7 = 18.1818...
    val r = report((30, 70, 60, 40))
    assert(r.getLong(0) === 100L && r.getLong(1) === 30L)
    assert(r.getLong(2) === 100L && r.getLong(3) === 60L)
    assert(r.getLong(4) === 300000000L)
    assert(r.getLong(5) === 600000000L)
    assert(r.getDouble(6) === 18.1818)
    assert(r.getBoolean(7)) // 18.18 >> 3.84
  }

  test("abReport: a null effect is not significant") {
    val r = report((50, 50, 50, 50))
    assert(r.getDouble(6) === 0.0 && !r.getBoolean(7))
  }

  test("abReport: the flag decision sits exactly at the chi2 critical value") {
    // 2x2 with chi2 just under 3.841459: n=200, cells (43,57,57,43)
    // chi2 = 200*(43*43-57*57)^2/(100^2*100^2) = 200*1960000/1e8 = 3.92 -> sig
    assert(report((43, 57, 57, 43)).getBoolean(7))
    // (44,56,56,44): chi2 = 200*(44^2-56^2)^2/1e8 = 2.88 -> not sig
    assert(!report((44, 56, 56, 44)).getBoolean(7))
  }

  test("abReport: degenerate margin (everyone converts) yields null chi2, false flag") {
    val r = report((50, 0, 50, 0))
    assert(r.isNullAt(6))
    assert(!r.getBoolean(7)) // 0 > 0 is false — the exact compare can't divide by zero
  }

  test("abReport: decimation caps the exact-flag domain without flipping clear decisions") {
    // (300,700,600,400), decimateOver=100 → k=20, HALF_UP cells
    // (15,35,30,20): proportions preserved, decimated chi2 ≈ 9.09 —
    // still significant; displayed counts/rates stay FULL
    val rows = (Seq.fill(300)((0, 1)) ++ Seq.fill(700)((0, 0)) ++
      Seq.fill(600)((1, 1)) ++ Seq.fill(400)((1, 0))).toDF("variant", "converted")
    val r = Experiment.abReport(rows, decimateOver = 100L).collect().head
    assert(r.getLong(0) === 1000L && r.getLong(1) === 300L) // full n0/conv0
    assert(r.getLong(4) === 300000000L)                     // full ppb
    assert(r.getBoolean(7))
    // BigInt reference on the decimated 2x2 (a2,b2,c2,d2)=(15,35,30,20)
    val (a2, b2, c2, d2) = (BigInt(15), BigInt(35), BigInt(30), BigInt(20))
    val dd = a2 * d2 - b2 * c2
    val lhs = BigInt(1000000) * (a2 + b2 + c2 + d2) * dd * dd
    val rhs = BigInt(3841459) * (a2 + b2) * (c2 + d2) * (a2 + c2) * (b2 + d2)
    assert((lhs > rhs) === r.getBoolean(7))
    // a null effect stays null under decimation
    val nul = (Seq.fill(500)((0, 1)) ++ Seq.fill(500)((0, 0)) ++
      Seq.fill(500)((1, 1)) ++ Seq.fill(500)((1, 0))).toDF("variant", "converted")
    assert(!Experiment.abReport(nul, decimateOver = 100L).collect().head.getBoolean(7))
    // below the cap k=1: identical flag to the undecimated form
    assert(Experiment.abReport(rows).collect().head.getBoolean(7))
  }

  test("didReport: hand-computed panel — cell means and the parallel-trends difference") {
    // ctl: pre mean 10, post mean 12 (+2); trt: pre 20, post 25 (+5) → DiD = 3
    val rows = Seq(
      (0, 0, 8.0), (0, 0, 12.0),        // ctl pre
      (0, 1, 11.0), (0, 1, 13.0),       // ctl post
      (1, 0, 15.0), (1, 0, 25.0),       // trt pre
      (1, 1, 20.0), (1, 1, 30.0))       // trt post
      .toDF("variant", "period", "value")
    val r = Experiment.didReport(rows).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 2L, 2L, 2L)))
    assert(r.getDouble(4) === 10.0 && r.getDouble(5) === 12.0)
    assert(r.getDouble(6) === 20.0 && r.getDouble(7) === 25.0)
    assert(r.getDouble(8) === 3.0)
  }

  test("didReport: an empty cell yields null mean and null estimate, not a crash") {
    val rows = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 1, 5.0)).toDF("variant", "period", "value")
    val r = Experiment.didReport(rows).collect().head
    assert(r.isNullAt(6)) // trt pre missing
    assert(r.isNullAt(8))
  }

  private def kappaOf(n11: Int, n10: Int, n01: Int, n00: Int) = {
    val rows = Seq.fill(n11)((true, true)) ++ Seq.fill(n10)((true, false)) ++
      Seq.fill(n01)((false, true)) ++ Seq.fill(n00)((false, false))
    Experiment.kappaReport(rows.toDF("rater_a", "rater_b")).collect().head
  }

  test("kappaReport: perfect agreement is kappa 1, the cells and ppb terms are exact") {
    val r = kappaOf(30, 0, 0, 70)
    assert(r.getLong(0) === 100L && r.getLong(1) === 30L && r.getLong(4) === 70L)
    assert(r.getLong(5) === 1000000000L)             // po = 1
    assert(r.getLong(6) === 580000000L) // pe = (30·30 + 70·70)/10⁴ = 0.58
    assert(r.getDouble(7) === 1.0)
  }

  test("kappaReport: independent raters land at kappa 0") {
    // marginals 50/50 both, independent: cells 25 each → po = pe = 0.5
    val r = kappaOf(25, 25, 25, 25)
    assert(r.getLong(5) === 500000000L && r.getLong(6) === 500000000L)
    assert(r.getDouble(7) === 0.0)
  }

  test("kappaReport: hand-computed mixed case") {
    // n=100: n11=40 n10=10 n01=20 n00=30 → po=0.7
    // pe = (50·60 + 50·40)/10000 = 0.5 → kappa = 0.2/0.5 = 0.4
    val r = kappaOf(40, 10, 20, 30)
    assert(r.getLong(5) === 700000000L)
    assert(r.getLong(6) === 500000000L)
    assert(r.getDouble(7) === 0.4)
  }
}
