package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The sketch-bracket exact quantile must equal the buffer-everything
  * sort aggregate on every input — exactness is the whole point.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def check(df: org.apache.spark.sql.DataFrame, qs: Seq[Double]): Unit = {
    val got = Quantiles.exactDisc(df, Seq("g"), "v", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    val want = Quantiles.sortBasedDisc(df, Seq("g"), "v", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got === want)
  }

  test("bracketed quantiles equal sort-based percentile_disc on the lineitem fixture") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    check(li, Seq(0.5, 0.9))
    check(li, Seq(0.01, 0.25, 0.75, 0.99)) // tails still bracket correctly
  }

  test("exact on adversarial groups: ties, tiny groups, skewed duplicates") {
    val rows =
      // heavy ties: the rank-k value sits inside a duplicate run
      (1 to 100).map(i => ("ties", math.min(i, 50).toDouble)) ++
      // single- and two-element groups: k = ceil(q*n) edges
      Seq(("one", 7.0), ("two", 1.0), ("two", 2.0)) ++
      // all-identical group: every quantile is the constant
      (1 to 20).map(_ => ("const", 3.14))
    val df = rows.toDF("g", "v")
    check(df, Seq(0.1, 0.5, 0.9))
  }

  test("NaN sorts greatest: high quantiles land on NaN exactly like percentile_disc") {
    // NaN rows count into the rank space but no bracket can reach
    // them (every NaN comparison is false) — the operator must decide
    // the NaN tail arithmetically, not drop the (group, q) row
    val df = (Seq.fill(8)(("m", 1.0)) ++ Seq(("m", 2.0), ("m", Double.NaN),
      ("allnan", Double.NaN), ("allnan", Double.NaN))).toDF("g", "v")
    val got = Quantiles.exactDisc(df, Seq("g"), "v", Seq(0.5, 0.95))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got(("m", 0.5)) === 1.0)
    assert(got(("m", 0.95)).isNaN) // rank 10 of 10 is the NaN row
    assert(got(("allnan", 0.5)).isNaN && got(("allnan", 0.95)).isNaN)
    // and the reference sort aggregate agrees on the same input
    val want = Quantiles.sortBasedDisc(df, Seq("g"), "v", Seq(0.5, 0.95))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, x) =>
      assert((x.isNaN && want(k).isNaN) || x === want(k), s"$k: $x vs ${want(k)}") }
  }

  test("null values fall out of the count and the bracket") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("a", Some(2.0)))
      .toDF("g", "v")
    val got = Quantiles.exactDisc(df, Seq("g"), "v", Seq(0.5)).collect()
    assert(got.length === 1)
    assert(got.head.getDouble(2) === 2.0) // median of {1,2,3}, null ignored
  }

  test("robustStats: hand-checked quartiles, MAD, and Tukey fences") {
    // group "s": 1..11 plus one far outlier 1000
    //   sorted n=12 → p25 = rank ceil(3) = 3, median = rank 6, p75 = rank 9
    //   IQR = 6, fences [3-9, 9+9] = [-6, 18] → only 1000 is out
    //   deviations from median 6: {5,4,3,2,1,0,1,2,3,4,5,994} → MAD = rank 6 of
    //   sorted {0,1,1,2,2,3,3,4,4,5,5,994} = 3
    val df = ((1 to 11).map(i => ("s", i.toDouble)) :+ (("s", 1000.0)))
      .toDF("g", "v")
    val r = Quantiles.robustStats(df, Seq("g"), "v").collect().head
    assert(r.getLong(1) === 12L)     // n_rows
    assert(r.getDouble(2) === 3.0)   // p25
    assert(r.getDouble(3) === 6.0)   // median
    assert(r.getDouble(4) === 9.0)   // p75
    assert(r.getDouble(5) === 6.0)   // iqr
    assert(r.getDouble(6) === 3.0)   // mad
    assert(r.getLong(7) === 1L)      // the single planted outlier
  }

  test("robustStats: constant group has zero dispersion and no outliers") {
    val df = (1 to 9).map(_ => ("c", 42.0)).toDF("g", "v")
    val r = Quantiles.robustStats(df, Seq("g"), "v").collect().head
    assert(r.getDouble(5) === 0.0 && r.getDouble(6) === 0.0 && r.getLong(7) === 0L)
  }

  test("quantileNormalize: strata map onto the global distribution, bucket-width invariant") {
    // stratum A = {10, 20, 30, 40}, stratum B = {100, 200}
    // global sorted = [10, 20, 30, 40, 100, 200], n_g = 6
    // A (n_s=4): ranks 1..4 → targets ceil(6r/4) = 2, 3, 5, 6 → 20, 30, 100, 200
    // B (n_s=2): ranks 1, 2 → targets 3, 6 → 30, 200
    val df = Seq(("A", 10L, 1L), ("A", 20L, 2L), ("A", 30L, 3L), ("A", 40L, 4L),
      ("B", 100L, 5L), ("B", 200L, 6L)).toDF("g", "v", "id")
    val got = Quantiles.quantileNormalize(df, Seq("g"), "v", "id").collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 20L, 2L -> 30L, 3L -> 100L, 4L -> 200L, 5L -> 30L, 6L -> 200L))
    // the bucket count is pure parallelism: serial shape ≡ bucketed shape
    val serial = Quantiles.quantileNormalize(df, Seq("g"), "v", "id", nBuckets = 1)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(serial === got)
  }

  test("quantileNormalize on the fixture: every stratum's image is a subset of global values, order-preserving") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val out = Quantiles.quantileNormalize(docs, Seq("lang"), "n_chars", "doc_id")
    val globalVals = docs.select("n_chars").collect().map(_.getLong(0)).toSet
    val rows = out.collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(rows.length === docs.count())
    rows.foreach { case (_, _, nv) => assert(globalVals.contains(nv)) }
    // within a stratum the map is monotone in the source value
    rows.groupBy(_._1).values.foreach { st =>
      val sorted = st.sortBy(x => (x._2, x._3))
      sorted.zip(sorted.tail).foreach { case (a, b) => assert(a._3 <= b._3) }
    }
  }

  test("the bracket sliver is small: the final sort never sees the whole group") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val n = li.count()
    // reproduce the operator's bracket predicate and measure its size
    val margin = 4.0 / 10000
    val stats = li.groupBy("g").agg(
      percentile_approx(col("v"), array(lit(0.5 - margin), lit(0.5 + margin)), lit(10000)).as("bs"))
    val bracketRows = li.join(broadcast(stats), "g")
      .filter(col("v") >= element_at(col("bs"), 1) && col("v") <= element_at(col("bs"), 2))
      .count()
    assert(bracketRows < n / 10, s"bracket $bracketRows of $n rows")
  }
}
