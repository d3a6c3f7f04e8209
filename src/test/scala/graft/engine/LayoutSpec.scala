package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LayoutSpec extends SparkSpec {

  private def events = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$Sf/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  test("partitioned layout prunes directories: a one-day filter reads one partition's files") {
    val out = Files.createTempDirectory("graft-layout").toString
    val withDate = events.withColumn("event_date", to_date(col("ts")))
    Layout.writePartitioned(withDate, out, "event_date", Seq("user_id"))
    val dates = withDate.select("event_date").distinct().count()
    assert(dates > 1, "fixture must span multiple days for this test to mean anything")

    val all = spark.read.parquet(out)
    val oneDay = all.filter(col("event_date") === all.select(max("event_date")).head.getDate(0))
    // the filter must reach the scan as a partition filter...
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"))
    // ...and the scan must read strictly fewer files than the full table
    val filesAll = Layout.filesRead(spark, all)
    val filesOne = Layout.filesRead(spark, oneDay)
    assert(filesOne >= 1 && filesOne < filesAll,
      s"expected pruning: $filesOne of $filesAll files")
    // round-trip row fidelity
    assert(all.count() === withDate.count())
  }

  test("range-sorted layout: files carry disjoint key ranges and full content survives") {
    val out = Files.createTempDirectory("graft-layout-rs").toString
    Layout.writeRangeSorted(events.select("event_id", "user_id", "value"), out, "event_id", 4)
    val back = spark.read.parquet(out)
    assert(back.count() === events.count())
    // per-file min/max on the sort key must not overlap (disjoint ranges)
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("event_id").as("lo"), max("event_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length >= 2)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlapping file ranges: $hi1 vs $lo2")
      case _ =>
    }
  }
}
