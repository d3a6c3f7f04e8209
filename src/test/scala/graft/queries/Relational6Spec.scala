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

  test("tpch q4: EXISTS counts each qualifying order once, however many late lines") {
    val rows = Relational6.tpchQ4(spark, Sf).collect()
    assert(rows.nonEmpty)
    // brute force: distinct qualifying orders via an explicit semi join
    val o = spark.read.parquet(s"$Sf/orders.parquet")
      .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val brute = o.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"), "left_semi")
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap === brute)
  }

  test("tpch q6: scan-only revenue matches the decimal-contract brute force") {
    val row = Relational6.tpchQ6(spark, Sf).collect().head
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
        col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
    val brute = li.agg(Num.dsum(col("l_extendedprice") * col("l_discount"))).head.getDouble(0)
    assert(row.getDouble(0) === brute)
  }

  test("tpch q8: market share is a true fraction of the year's volume") {
    val rows = Relational6.tpchQ8(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0, s"share $share out of range for year ${r.getInt(0)}")
    }
  }

  test("tpch q12: high+low conditional counts partition the joined rows exactly") {
    val rows = Relational6.tpchQ12(spark, Sf).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val o = spark.read.parquet(s"$Sf/orders.parquet")
    val brute = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"))
      .count()
    assert(total === brute, "CASE-count arms must cover every joined row exactly once")
  }

  test("tpch q14: promo percentage is consistent with its own components") {
    val row = Relational6.tpchQ14(spark, Sf).collect().head
    val (promo, total, pct) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(promo >= 0.0 && promo <= total)
    assert(math.abs(pct - 100.0 * promo / total) < 1e-3)
  }

  test("tpch q2: every surviving supplier carries its part's EUROPE-min cost") {
    val rows = Relational6.tpchQ2(spark, Sf).collect()
    assert(rows.nonEmpty)
    // rebuild the derived partsupp relationally and recompute the min per part
    val nSupp = spark.read.parquet(s"$Sf/supplier.parquet").count()
    val ps = spark.read.parquet(s"$Sf/part.parquet")
      .crossJoin(spark.range(4).toDF("k"))
      .select(col("p_partkey").as("ps_partkey"),
        ((col("p_partkey") * 7 + col("k") * 13 + 1) % nSupp).as("ps_suppkey"),
        round(lit(1.0) + ((col("p_partkey") * 31 + col("k") * 101) % 10000) / 100.0, 2).as("ps_supplycost"))
    val euroSupp = spark.read.parquet(s"$Sf/supplier.parquet")
      .join(spark.read.parquet(s"$Sf/nation.parquet"), col("s_nationkey") === col("n_nationkey"))
      .join(spark.read.parquet(s"$Sf/region.parquet"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
    val minCost = ps.join(euroSupp, col("ps_suppkey") === col("s_suppkey"))
      .groupBy("ps_partkey").agg(min("ps_supplycost").as("mc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(r.getDouble(5) === minCost(r.getLong(3)),
        s"part ${r.getLong(3)} row does not carry the regional min cost")
    }
  }

  test("tpch q9: profit rows only come from '%red%' parts' (supp,part) pairs") {
    val rows = Relational6.tpchQ9(spark, Sf).collect()
    assert(rows.nonEmpty)
    // every (nation, year) key must be reachable from a red part's lineitem
    val nations = rows.map(_.getString(0)).toSet
    val supplierNations = spark.read.parquet(s"$Sf/supplier.parquet")
      .join(spark.read.parquet(s"$Sf/nation.parquet"), col("s_nationkey") === col("n_nationkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(nations.subsetOf(supplierNations))
    // descending year within nation (the Q9 output contract)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val years = rs.map(_.getInt(1)).toSeq
      assert(years === years.sortBy(-(_: Int)))
    }
  }

  test("tpch q11: kept parts are exactly those above 0.5% of the national stock") {
    val rows = Relational6.tpchQ11(spark, Sf).collect()
    assert(rows.nonEmpty, "NATION_3 must hold a supplier at every fixture SF")
    val values = rows.map(_.getDouble(1))
    assert(values.sameElements(values.sortBy(-(_: Double))))
    // rebuild partsupp for NATION_3 suppliers and recompute both sides
    val nSupp = spark.read.parquet(s"$Sf/supplier.parquet").count()
    val n3 = spark.read.parquet(s"$Sf/supplier.parquet")
      .join(spark.read.parquet(s"$Sf/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_3")
    val perPart = spark.read.parquet(s"$Sf/part.parquet")
      .crossJoin(spark.range(4).toDF("k"))
      .select(col("p_partkey").as("ps_partkey"),
        ((col("p_partkey") * 7 + col("k") * 13 + 1) % nSupp).as("ps_suppkey"),
        (lit(1) + (col("p_partkey") * 13 + col("k") * 37) % 9999).as("ps_availqty"),
        round(lit(1.0) + ((col("p_partkey") * 31 + col("k") * 101) % 10000) / 100.0, 2).as("ps_supplycost"))
      .join(n3, col("ps_suppkey") === col("s_suppkey"))
      .groupBy("ps_partkey")
      .agg(sum(col("ps_supplycost") * col("ps_availqty")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val threshold = perPart.values.sum * 0.005
    val expected = perPart.filter(_._2 > threshold).keySet
    assert(rows.map(_.getLong(0)).toSet === expected)
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

  test("sketch column: merged estimates hit the 2% contract and the merge is non-additive") {
    val rows = Relational6.aggSketchColumn(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(3),
      s"merged HLL estimate outside 2% for ${r.getString(0)}"))
    // the union is doing real work: sub-group sketches overlap on
    // partkeys, so the merged distinct is LESS than the sum of
    // per-(flag, status) distincts wherever a flag has > 1 status
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val perGroup = li.groupBy("l_returnflag", "l_linestatus")
      .agg(countDistinct("l_partkey").as("d"))
      .groupBy("l_returnflag").agg(sum("d").as("sum_d"), count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    perGroup.foreach { case (flag, (sumD, k)) =>
      if (k > 1) assert(exact(flag) < sumD,
        s"$flag: merged distinct must undercut the additive sum on overlapping groups")
    }
  }
}
