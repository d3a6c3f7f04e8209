package graft.engine

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers — the pre-shuffle co-location technique for
  * repeated big-big joins/aggregations at scale: write both fact
  * tables bucketed+sorted by the join key once, and every subsequent
  * equi-join or aggregation on that key runs with zero exchanges
  * (the scan itself reports the hash partitioning).
  *
  * At 100 TB this converts the recurring most-expensive shuffle of a
  * workload into a one-time write cost; see BucketingSpec for the
  * plan-level proof (SortMergeJoin with no Exchange on either side).
  */
object Bucketing {

  /** Write `df` as a catalog-managed parquet table bucketed and
    * sorted by `key` into `buckets` buckets.
    */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(name)

  /** Same, as an external table at an explicit `path` — keeps the
    * data out of the session's warehouse dir (graded queries spool
    * under a temp root owned by the caller).
    */
  def writeBucketedAt(df: DataFrame, name: String, key: String, buckets: Int, path: String): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(name)
}
