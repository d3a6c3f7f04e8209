package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvmSpec extends SparkSpec {
  import spark.implicits._

  test("maintainJoin equals recomputing the join over the applied snapshot") {
    val base = Seq((1L, 10L, 5.0), (2L, 20L, 6.0), (3L, 10L, 7.0), (4L, 30L, 8.0))
      .toDF("k", "fk", "v")
    val dim = Seq((10L, "A"), (20L, "B"), (30L, "C")).toDF("dk", "tag")
    val outCols = Seq("k", "fk", "v", "tag")
    val m = base.join(dim, col("fk") === col("dk")).select(outCols.map(col): _*)
    // update k=2 (new value AND re-pointed fk), delete k=3, insert k=5
    val upserts = Seq((2L, 30L, 60.0), (5L, 20L, 9.0)).toDF("k", "fk", "v")
    val deletes = Seq(Tuple1(3L)).toDF("k")
    val maintained = Ivm.maintainJoin(m, dim, upserts, deletes, "k", "fk", "dk", outCols)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    val applied = Seq((1L, 10L, 5.0), (2L, 30L, 60.0), (4L, 30L, 8.0), (5L, 20L, 9.0))
      .toDF("k", "fk", "v")
    val recomputed = applied.join(dim, col("fk") === col("dk")).select(outCols.map(col): _*)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    assert(maintained === recomputed)
    assert(maintained.size === 4)
  }

  test("maintainJoin: an upsert pointing at a missing dim key drops out, like the recompute") {
    val base = Seq((1L, 10L, 1.0)).toDF("k", "fk", "v")
    val dim = Seq((10L, "A")).toDF("dk", "tag")
    val outCols = Seq("k", "fk", "v", "tag")
    val m = base.join(dim, col("fk") === col("dk")).select(outCols.map(col): _*)
    val upserts = Seq((1L, 99L, 2.0)).toDF("k", "fk", "v") // 99 not in dim
    val deletes = spark.emptyDataFrame.select(lit(0L).as("k")).limit(0)
    val maintained = Ivm.maintainJoin(m, dim, upserts, deletes, "k", "fk", "dk", outCols)
    assert(maintained.count() === 0L)
  }

  test("maintainJoin never shuffles the view: the touched-key anti join is broadcast") {
    val base = Seq((1L, 10L, 1.0), (2L, 10L, 2.0)).toDF("k", "fk", "v")
    val dim = Seq((10L, "A")).toDF("dk", "tag")
    val outCols = Seq("k", "fk", "v", "tag")
    val m = base.join(dim, col("fk") === col("dk")).select(outCols.map(col): _*)
    val plan = Ivm.maintainJoin(m, dim, Seq((2L, 10L, 3.0)).toDF("k", "fk", "v"),
        Seq(Tuple1(1L)).toDF("k"), "k", "fk", "dk", outCols)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }
}
