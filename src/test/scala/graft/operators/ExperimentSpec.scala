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
}
