package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-level proof that bucketed co-location removes the join
  * shuffle entirely (the "pre-partitioned join" scale technique).
  */
class BucketingSpec extends SparkSpec {

  test("equi-join of two tables bucketed on the key has no Exchange") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val o = spark.read.parquet(s"$Sf/orders.parquet")
    Bucketing.writeBucketed(li, "li_bkt", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "o_bkt", "o_orderkey", 4)
    // force a sort-merge join so the exchange (or its absence) is visible
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the only exchange allowed is the final groupBy on o_orderstatus
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"), joinPart)
      // and it still computes the right answer
      val viaBuckets = joined.orderBy("o_orderstatus").collect().map(r => (r.getString(0), r.getLong(1)))
      val direct = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(viaBuckets.toSeq === direct.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }

  test("aggregation on the bucket key needs no pre-agg exchange") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    Bucketing.writeBucketed(li, "li_bkt2", "l_orderkey", 4)
    try {
      val agg = spark.table("li_bkt2").groupBy("l_orderkey").agg(sum("l_quantity"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    } finally spark.sql("DROP TABLE IF EXISTS li_bkt2")
  }
}
