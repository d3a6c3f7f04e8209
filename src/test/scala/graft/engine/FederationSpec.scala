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

  test("filters are pushed below the union per leg") {
    val shards = (0 until 2).map(i => orders.filter(pmod(col("o_orderkey"), lit(2)) === i))
    val filtered = Federation.unionShards(shards).filter(col("o_totalprice") > 100000)
    val plan = filtered.queryExecution.executedPlan.toString
    // every scan leg carries the pushed filter (2 legs → 2 scans)
    val pushed = "GreaterThan(o_totalprice,100000.0)"
    assert(plan.sliding(pushed.length).count(_ == pushed) >= 2, plan)
  }
}
