package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LayoutSpec extends SparkSpec {

  private def events = graft.queries.Relational.events(spark, Sf)

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

  test("z-order layout prunes on BOTH dimensions; 1-D sort only on its own key") {
    val data = events.select("event_id", "user_id", "value")
    val ids = data.agg(min("event_id"), max("event_id"), min("user_id"), max("user_id")).head
    val (eLo, eHi, uLo, uHi) = (ids.getLong(0), ids.getLong(1), ids.getLong(2), ids.getLong(3))
    val zDir = Files.createTempDirectory("graft-z").toString
    val sDir = Files.createTempDirectory("graft-s").toString
    // 16 z-tiles → the top 4 Morton bits split files: 2 bits of
    // discrimination per dimension even for the lower-priority one
    Layout.writeZOrdered(data, zDir, "user_id", "event_id", 16)
    Layout.writeRangeSorted(data, sDir, "user_id", 16)
    val total = data.count()
    // narrow range on the SECONDARY column (event_id ~ 1/8 of domain)
    val lo = eLo + (eHi - eLo) / 2
    val hi = lo + (eHi - eLo) / 8
    def scanned(dir: String) = Layout.rowsScanned(spark,
      spark.read.parquet(dir).filter(col("event_id").between(lo, hi)))
    val zRows = scanned(zDir)
    val sRows = scanned(sDir)
    // user-sorted files all span the full event_id range: no skipping
    // possible; z-ordered tiles bound event_id per file, so the
    // reader skips most of the table
    assert(sRows === total, s"user-sorted layout unexpectedly skipped: $sRows of $total")
    assert(zRows < total / 2, s"z-order should skip most rows: scanned $zRows of $total")
    // and the z layout still prunes on the other column too (coarser:
    // user_id owns the even Morton bits, so fewer of the top file-
    // splitting bits — some files must still be skipped)
    val uMid = uLo + (uHi - uLo) / 2
    val zU = Layout.rowsScanned(spark,
      spark.read.parquet(zDir).filter(col("user_id").between(uMid, uMid + (uHi - uLo) / 16)))
    assert(zU < (total * 4) / 5, s"z-order should also prune on user_id: $zU of $total")
    // layouts hold identical data
    assert(spark.read.parquet(zDir).count() === total)
  }

  test("dynamic partition pruning: a filtered dim join prunes fact partitions at runtime") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-dpp").toString
    val withDate = events.withColumn("event_date", to_date(col("ts")))
    Layout.writePartitioned(withDate, out, "event_date", Seq("user_id"))
    val fact = spark.read.parquet(out)
    val oneDate = withDate.select(max("event_date")).head.getDate(0)
    // the dim must be file-backed: a LocalRelation dim gets its filter
    // constant-folded away (ConvertToLocalRelation), and DPP's
    // selective-predicate check then sees no filter to exploit
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString
    Seq((oneDate, "keep"), (java.sql.Date.valueOf("1970-01-01"), "drop"))
      .toDF("event_date", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.filter(col("tag") === "keep"), "event_date")
    val filesJoined = Layout.filesRead(spark, joined)
    val filesAll = Layout.filesRead(spark, fact)
    assert(joined.queryExecution.executedPlan.toString.contains("dynamicpruning"),
      "expected a dynamic partition pruning subquery in the scan")
    assert(filesJoined < filesAll, s"DPP should prune: $filesJoined of $filesAll files")
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

  test("small-file compaction: file count collapses to the bin-packed target, content survives") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
    // shatter: 32 undersized files
    spark.range(200000).selectExpr("id", "id * 3 AS v")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/in")
    val in = Layout.dataFiles(spark, s"$dir/in")
    assert(in.size === 32, in.size)
    val bytesIn = in.map(_._2).sum
    val target = bytesIn / 3 // force ~4 output files
    val report = Layout.compactSmallFiles(spark, s"$dir/in", s"$dir/out", target).collect().head
    val expectedOut = ((bytesIn + target - 1) / target).toInt
    assert(report.getLong(0) === 32L)
    assert(report.getLong(1) === bytesIn)
    assert(report.getLong(2) === expectedOut.toLong, report.toString)
    assert(Layout.dataFiles(spark, s"$dir/out").size === expectedOut)
    // content preserved exactly
    val src = spark.read.parquet(s"$dir/in").agg(
      org.apache.spark.sql.functions.count("*"),
      org.apache.spark.sql.functions.sum("v")).collect().head
    val dst = spark.read.parquet(s"$dir/out").agg(
      org.apache.spark.sql.functions.count("*"),
      org.apache.spark.sql.functions.sum("v")).collect().head
    assert(src === dst)
  }
}
