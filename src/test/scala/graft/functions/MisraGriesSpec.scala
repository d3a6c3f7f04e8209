package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MisraGriesSpec extends SparkSpec {

  /** Skewed stream: tokens h0/h1/h2 dominate, 200 light tokens trail. */
  private def stream(copiesHeavy: Int, copiesLight: Int): Seq[String] =
    (0 until 3).flatMap(i => Seq.fill(copiesHeavy)(s"h$i")) ++
      (0 until 200).flatMap(i => Seq.fill(copiesLight)(s"light$i"))

  private def sketchOf(toks: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    val mg = udaf(new MisraGries(k))
    toks.toDF("tok").repartition(parts)
      .agg(mg(col("tok")).as("s")).head().getMap[String, Long](0).toMap
  }

  test("MG contract holds under multi-partition merges: heavy keys present, error bounded") {
    val toks = stream(copiesHeavy = 500, copiesLight = 4)
    val n = toks.size
    val k = 10
    val bound = n.toDouble / (k + 1)
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7, 32)) {
      val sketch = sketchOf(toks, k, parts)
      assert(sketch.size <= k)
      // presence theorem: every key above the bound is in the summary
      exact.filter(_._2 > bound).keys.foreach { key =>
        assert(sketch.contains(key), s"heavy $key missing at parts=$parts")
      }
      // error theorem: never overestimates, underestimates by <= n/(k+1)
      sketch.foreach { case (key, est) =>
        val t = exact(key)
        assert(est <= t, s"$key overestimated at parts=$parts")
        assert(t - est <= bound, s"$key error ${t - est} > $bound at parts=$parts")
      }
    }
  }

  test("fewer distinct keys than k: the sketch is exact counting") {
    val toks = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(7)("c")
    val sketch = sketchOf(toks, k = 16, parts = 5)
    assert(sketch === Map("a" -> 40L, "b" -> 25L, "c" -> 7L))
  }

  test("nulls are ignored, not counted") {
    import spark.implicits._
    val mg = udaf(new MisraGries(4))
    val sketch = Seq("x", null, "x", null, "y").toDF("tok")
      .agg(mg(col("tok")).as("s")).head().getMap[String, Long](0).toMap
    assert(sketch === Map("x" -> 2L, "y" -> 1L))
  }
}
