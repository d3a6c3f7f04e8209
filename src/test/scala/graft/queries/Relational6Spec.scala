package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Relational6Spec extends SparkSpec {

  test("tpch q5: cyclic join graph groups revenue per nation, descending") {
    val rows = Relational6.tpchQ5(spark, Sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(1))
    assert(revs.sameElements(revs.sortBy(-(_: Double))))
    // the cycle edge is real: every surviving row had c_nation == s_nation,
    // so rebuilding without that edge can only ADD revenue
    val names = rows.map(_.getString(0)).toSet
    assert(names.subsetOf(
      spark.read.parquet(s"$Sf/nation.parquet").select("n_name")
        .collect().map(_.getString(0)).toSet))
  }

  test("tpch q13: customers with zero qualifying orders survive the outer join") {
    val rows = Relational6.tpchQ13(spark, Sf).collect()
    val histogram = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // total histogram mass = number of customers (no one dropped)
    val nCustomers = spark.read.parquet(s"$Sf/customer.parquet").count()
    assert(histogram.values.sum === nCustomers)
    // the ON-clause filter (<> '1-URGENT') must NOT behave like a WHERE:
    // urgent-only customers land in the 0 bucket instead of vanishing
    val ordersByCust = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy("o_custkey")
      .agg(count(when(col("o_orderpriority") =!= "1-URGENT", 1)).as("n"))
    val zeroBucket = nCustomers -
      ordersByCust.filter(col("n") > 0).count()
    assert(histogram.getOrElse(0L, 0L) === zeroBucket)
  }

  test("tpch q15: the filtered supplier(s) carry exactly the max revenue") {
    val rows = Relational6.tpchQ15(spark, Sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length === 1) // every survivor ties at the max
  }

  test("tpch q19: disjunctive predicate keeps only rows satisfying some arm") {
    val row = Relational6.tpchQ19(spark, Sf).collect().head
    assert(row.getLong(1) > 0, "no items matched any arm — fixture drifted?")
    // brute-force recount of the disjunction without the join shape
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val p = spark.read.parquet(s"$Sf/part.parquet")
    val brute = li.join(p, col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .count()
    assert(row.getLong(1) === brute)
  }
}
