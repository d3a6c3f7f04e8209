package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataChecksSpec extends SparkSpec {

  import spark.implicits._

  test("planted violations are counted per check; clean data reports zero") {
    val rows = Seq(
      (1L, 10.0, 0.05), // clean
      (2L, -3.0, 0.05), // negative price
      (3L, 10.0, 1.5),  // discount out of range
      (4L, -1.0, -0.2)  // both
    ).toDF("id", "price", "disc")
    val report = DataChecks.rowChecks(rows, Seq(
      "price_negative" -> (col("price") < 0),
      "disc_out_of_range" -> (col("disc") < 0 || col("disc") > 1),
      "id_null" -> col("id").isNull))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report === Map("price_negative" -> 2L, "disc_out_of_range" -> 2L, "id_null" -> 0L))
  }

  test("row checks fuse into a single scan of the table") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val report = DataChecks.rowChecks(li, Seq(
      "a" -> (col("l_quantity") < 0),
      "b" -> (col("l_discount") > 1),
      "c" -> (col("l_tax") < 0)))
    val plan = report.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllMatchIn(plan).size === 1, plan)
  }

  test("uniqueness counts extra rows; FK counts orphans") {
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val child = Seq(1L, 1L, 2L, 9L, 8L).toDF("fk")
    val uniq = DataChecks.uniquenessCheck(child, "fk_unique", "fk").head
    assert(uniq.getString(0) === "fk_unique" && uniq.getLong(1) === 1L) // one extra '1'
    val fk = DataChecks.fkCheck(child, "fk", parent, "k", "child_fk").head
    assert(fk.getString(0) === "child_fk" && fk.getLong(1) === 2L) // 9 and 8
  }

  test("FK check excludes NULL child keys by contract (null-tolerant on both sides)") {
    // NULL child keys are a nullability concern, not an RI violation;
    // a NULL in the parent key set must not blank the check either
    // (the NOT IN trap this contract exists to avoid)
    val parent = Seq(Some(1L), Some(2L), None).toDF("k")
    val child = Seq(Some(1L), None, Some(9L), None).toDF("fk")
    val fk = DataChecks.fkCheck(child, "fk", parent, "k", "child_fk").head
    assert(fk.getLong(1) === 1L) // only 9 — the two NULLs don't count
    val nulls = DataChecks.rowChecks(child, Seq("fk_null" -> col("fk").isNull)).head
    assert(nulls.getLong(1) === 2L) // NULLs surface in the null check instead
  }
}
