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
}
