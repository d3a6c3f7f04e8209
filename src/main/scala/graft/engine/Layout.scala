package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout management — the write-side half of the 100 TB story.
  * Scan-time pruning (partition directories, parquet min/max
  * row-group stats) only exists if the writer laid the data out for
  * it; at 100 TB the layout IS the index. The reference appends flat
  * CSV (`/root/reference/csvb_engine/src/lib.rs:87-89`), so this
  * module is a Spark-native extra, same tier as the COPY TO sink.
  */
object Layout {

  /** Hive-style directory partitioning + in-file ordering:
    * `partitionBy` turns equality/range predicates on the partition
    * column into directory pruning (zero I/O for excluded
    * partitions); `sortWithinPartitions` on the secondary keys makes
    * parquet row-group min/max stats tight, so selective predicates
    * skip row groups inside surviving files. `maxRecordsPerFile`
    * bounds file size (the small-files / giant-files trade-off is
    * explicit, not incidental).
    *
    * The `repartition(partCol)` before the write routes each output
    * partition through one task — without it every input task writes
    * a file into every directory (the classic small-files explosion:
    * tasks × partitions files).
    */
  def writePartitioned(df: DataFrame, path: String, partCol: String,
      sortCols: Seq[String], maxRecordsPerFile: Long = 5_000_000L): Unit =
    df.repartition(col(partCol))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .partitionBy(partCol)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)

  /** Range-layout for a sort-dominant access pattern: co-locate key
    * ranges into files (`repartitionByRange` + in-file sort) so both
    * file-level and row-group min/max stats are tight on the sort
    * key — the "sorted table" layout for as-of / range scans when a
    * partition column would be too fine-grained.
    */
  def writeRangeSorted(df: DataFrame, path: String, sortCol: String,
      files: Int): Unit =
    df.repartitionByRange(files, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(path)

  /** The files a filtered scan of `path` actually reads (post-
    * pruning), from the executed plan's scan metrics — the
    * measurable proof that a layout prunes.
    */
  def filesRead(spark: SparkSession, df: DataFrame): Long = {
    // run THIS Dataset's QueryExecution (a `write` would plan a fresh
    // one and leave these metrics unpopulated), then read the scan
    // node's numFiles metric
    // collect() is the action bound to THIS Dataset's QueryExecution
    // (count()/foreach()/write each plan a fresh one whose metrics we
    // couldn't see); caller passes bounded frames
    df.collect()
    // AdaptiveSparkPlanExec exposes no children to TreeNode.collect —
    // unwrap to the final physical plan first
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.map(_.metrics("numFiles").value).sum
  }
}
