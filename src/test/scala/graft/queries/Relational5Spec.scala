package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fifth query batch: plan-level and semantic assertions beyond the
  * driver's DuckDB oracle.
  */
class Relational5Spec extends SparkSpec {

  test("bloom prefilter probes a scalar-subquery bloom before the semi join") {
    val df = Relational5.bloomPrefilter(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(plan.contains("Subquery") || plan.contains("subquery"), plan)
    // the probe is a pre-filter only: result identical to the plain semi join
    import spark.implicits._
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val urgent = spark.read.parquet(s"$Sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT" && year(col("o_orderdate")) === 1995)
    val exact = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
    assert(df.agg(sum("n_items")).head.getLong(0) === exact.count())
  }

  test("bloom filter is selective: false means definitely absent") {
    org.apache.spark.sql.graft.GraftExtensions.install(spark)
    spark.read.parquet(s"$Sf/orders.parquet").createOrReplaceTempView("orders_bf")
    // build over even keys, probe all: every even key must hit (no false
    // negatives); odd-key hits are the (bounded) false-positive set
    val hits = spark.sql("""
      SELECT o_orderkey % 2 AS par, count(*) AS n,
             count_if(might_contain(
               (SELECT bloom_filter_agg(xxhash64(o_orderkey), CAST(10000 AS BIGINT))
                FROM orders_bf WHERE o_orderkey % 2 = 0),
               xxhash64(o_orderkey))) AS n_hit
      FROM orders_bf GROUP BY par ORDER BY par""").collect()
    val even = hits.find(_.getLong(0) == 0L).get
    assert(even.getLong(1) === even.getLong(2)) // no false negatives
    val odd = hits.find(_.getLong(0) == 1L).get
    assert(odd.getLong(2) < odd.getLong(1) / 10) // fp rate well under 10%
  }

  test("incremental partial-aggregate merge equals direct aggregation") {
    val twoLevel = Relational5.incrementalAgg(spark, Sf)
    val direct = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("mon"),
        col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice").cast("decimal(38,6)")), 4).cast("double").as("total"),
        count(lit(1)).as("n_orders"))
    assert(twoLevel.select("mon", "o_orderpriority", "total", "n_orders")
      .exceptAll(direct).isEmpty)
    assert(direct.exceptAll(
      twoLevel.select("mon", "o_orderpriority", "total", "n_orders")).isEmpty)
  }

  test("variant extraction agrees with string-path JSON extraction") {
    val v = Relational5.variantJson(spark, Sf)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val viaString = spark.read.parquet(s"$Sf/events.parquet")
      .select(col("event_id"),
        get_json_object(
          concat(lit("{\"m\":{\"vc\":"), floor(col("value") * 100).cast("long").cast("string"),
            lit(",\"t\":\""), col("event_type"), lit("\"},\"ks\":["),
            (col("user_id") % 5).cast("string"), lit(","), (col("user_id") % 7).cast("string"),
            lit("]}")),
          "$.m.vc").cast("long").as("vc"))
    assert(v.select("event_id", "vc").exceptAll(viaString).isEmpty)
  }

  test("top-ngrams plan is a partial-agg top-k, not a global vocabulary sort") {
    val df = Relational5.topNgrams(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val rows = df.collect()
    assert(rows.length === 50)
    // deterministic total order: counts descend, ties break by bigram
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sameElements(pairs.sortBy { case (c, b) => (-c, b) }))
  }

  test("percentile_cont interpolates exactly on a known small case") {
    import spark.implicits._
    Seq(1.0, 2.0, 3.0, 4.0).toDF("x").createOrReplaceTempView("pctl_t")
    val r = spark.sql(
      """SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY x) AS p25,
        |       percentile_disc(0.25) WITHIN GROUP (ORDER BY x) AS p25d
        |FROM pctl_t""".stripMargin).head
    assert(r.getDouble(0) === 1.75) // (4-1)*0.25 = idx 0.75 -> 1 + 0.75*(2-1)
    assert(r.getDouble(1) === 1.0)
  }

  test("bucketed join + keyed aggregation run with zero pre-sort exchanges") {
    val df = Relational5.bucketedJoin(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    // the bucketed scans satisfy both the join and the aggregate
    // distributions; the only repartitioning is the final ORDER BY
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("streaming upsert state equals the batch latest-wins operator") {
    val streamed = graft.queries.Pipeline.streamUpsert(spark, Sf)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = Relational.events(spark, Sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val direct = graft.operators.Upsert.latestWins(
      batch, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_type").as("last_type"), col("value").as("last_value"))
    assert(streamed.exceptAll(direct).isEmpty && direct.exceptAll(streamed).isEmpty)
  }

  test("concurrent streamUpsert invocations do not clobber each other's state") {
    // regression pin: v0..vN snapshot names under a SHARED state dir
    // let two concurrent runs overwrite each other's versions mid-read;
    // each invocation now gets its own subdirectory
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = Await.result(
      Future.sequence(Seq(
        Future(graft.queries.Pipeline.streamUpsert(spark, Sf).collect()),
        Future(graft.queries.Pipeline.streamUpsert(spark, Sf).collect()))),
      5.minutes)
    assert(runs(0).length > 0)
    assert(runs(0).toSeq === runs(1).toSeq)
  }

  test("pathTag is injective across punctuation-differing dirs (bucketed-cache key safety)") {
    // regression pin: a sanitize-only tag collided for "sf0.1" vs
    // "sf0_1", so a catalog cache keyed by it could serve one dir's
    // bucketed tables for the other
    val tags = Seq("/data/sf0.1", "/data/sf0_1", "/data/sf0-1", "/data_sf0.1")
      .map(graft.queries.Tables.pathTag)
    assert(tags.distinct.size === tags.size, tags)
    assert(tags.forall(_.matches("[A-Za-z0-9_]+")), tags) // identifier-safe
  }

  test("HLL sketch partials merge losslessly across re-grouping (mergeable-state invariance)") {
    // the 100 TB cardinality pattern: store per-day sketches, answer
    // any coarser grain by merging — never re-scan the base table.
    // DataSketches HLL is a pure function of the item SET, so the
    // merged estimate must be bit-identical to the direct sketch.
    Relational.events(spark, Sf).createOrReplaceTempView("ev_hll")
    val merged = spark.sql("""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               hll_sketch_agg(user_id) AS sk
        FROM ev_hll GROUP BY d)
      SELECT hll_sketch_estimate(hll_union_agg(sk)) AS est FROM daily""").head.getLong(0)
    val direct = spark.sql(
      "SELECT hll_sketch_estimate(hll_sketch_agg(user_id)) AS est FROM ev_hll").head.getLong(0)
    val exact = spark.sql("SELECT count(DISTINCT user_id) FROM ev_hll").head.getLong(0)
    assert(merged === direct)
    assert(math.abs(merged - exact).toDouble / exact < 0.05)
  }

  test("full outer join emits both unmatched directions and matches the NULL bucket null-safely") {
    val rows = Relational5.joinFullOuter(spark, Sf).collect()
    assert(rows.exists(r => r.isNullAt(4) && !r.isNullAt(2)), "no a-only row")
    assert(rows.exists(r => r.isNullAt(2) && !r.isNullAt(4)), "no b-only row")
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(4)),
      "NULL keys did not match null-safely")
  }

  test("tpch q18/q22 shapes return non-empty, ordered results at sf0.001") {
    val q18 = Relational5.tpchQ18(spark, Sf).collect()
    assert(q18.nonEmpty)
    val prices = q18.map(_.getDouble(4))
    assert(prices.sameElements(prices.sortBy(-_)))
    val q22 = Relational5.tpchQ22(spark, Sf).collect()
    assert(q22.nonEmpty)
    assert(q22.map(_.getLong(0)).toSeq == q22.map(_.getLong(0)).toSeq.sorted)
  }
}
