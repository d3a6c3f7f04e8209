package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches with CROSS-ENGINE hash functions.
  *
  * The count-min sketch (Cormode & Muthukrishnan 2005) here is built
  * on the classic universal family `h_j(x) = ((a_j·x + b_j) mod p)
  * mod w` with `p = 2³¹−1` — plain BIGINT arithmetic both Spark and
  * DuckDB evaluate digit-for-digit, so unlike the xxhash-based
  * sketches (HLL, MinHash) the WHOLE sketch — build, merge, point
  * estimate — replays relationally in the oracle, not just contract
  * booleans. Overflow-safe by construction: `(x mod p) · a_j <
  * 2³¹·2³¹ = 2⁶² < 2⁶³` for every multiplier in the family.
  *
  * Representation: a sketch is the relation `(group…, j, bucket,
  * cnt)` — at most `groups × depth × width` rows regardless of data
  * size (the map-side combine collapses the per-row explode before
  * any shuffle). Merging sketches = `groupBy(group…, j, bucket)
  * .sum(cnt)` — the linearity that makes CMS the distributed
  * frequency sketch: per-partition / per-day / per-source sketches
  * sum into the global one with no re-scan of the data.
  */
object Sketches {

  /** Mersenne prime 2³¹−1: the universal-hash modulus. */
  val CmsP = 2147483647L

  /** Sketch width (buckets per row): error ≤ e·N/w with prob 1−δ.
    * 1024 prices the sketch at depth×width×8 B = 32 KiB per group —
    * the realistic trade for corpus-scale frequency tracking.
    */
  val CmsW = 1024

  /** The depth-4 hash family `(a_j, b_j)` — classic LCG multipliers,
    * all < 2³¹ so products stay inside BIGINT. Shared verbatim with
    * the generated oracle via [[cmsHashValuesSql]].
    */
  val CmsHashes: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L),
    (69621L, 0L),
    (48271L, 11L),
    (1566083941L, 987654321L))

  /** Depth of the sketch (rows = independent hash functions). */
  def cmsDepth: Int = CmsHashes.length

  /** `(j, a, b)` rows as SQL VALUES text for the oracle — one
    * constant table on both sides, no drift.
    */
  def cmsHashValuesSql: String =
    CmsHashes.zipWithIndex.map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")

  /** The bucket of `x` under hash row `j` — non-negative inputs
    * only (callers hash keys, ids, counts; both engines' `%` agree
    * on non-negatives).
    */
  def cmsBucket(x: Column, j: Int): Column = {
    val (a, b) = CmsHashes(j)
    ((x % CmsP) * a + b) % CmsP % CmsW
  }

  /** Build one CMS per distinct `groupCols` combination over the
    * multiset of `key` values: the relation `(group…, j, bucket,
    * cnt)`. The depth-fold posexplode happens INSIDE the scan stage
    * and the aggregate map-side combines, so the shuffle carries at
    * most `groups × depth × width` rows.
    */
  def cmsSketch(df: DataFrame, groupCols: Seq[String], key: Column): DataFrame = {
    val buckets = array((0 until cmsDepth).map(j => cmsBucket(key, j)): _*)
    df.select(groupCols.map(col) :+ posexplode(buckets).as(Seq("j", "bucket")): _*)
      .groupBy((groupCols :+ "j" :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches by summing counts — drop the dimensions being
    * merged away from `groupCols` and the linearity does the rest.
    */
  def cmsMerge(sketch: DataFrame, groupCols: Seq[String]): DataFrame =
    sketch.groupBy((groupCols :+ "j" :+ "bucket").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate the frequency of each `(group…, key)` row in
    * `probes` against `sketch`: `min_j cnt[j, h_j(key)]`, absent
    * buckets counting 0. CMS never underestimates — `est ≥ true
    * count` deterministically, which the graded query asserts as a
    * boolean both engines recompute.
    */
  def cmsEstimate(sketch: DataFrame, groupCols: Seq[String], probes: DataFrame,
      key: String): DataFrame = {
    val expanded = probes.select(
      (groupCols :+ key).map(col) :+ posexplode(
        array((0 until cmsDepth).map(j => cmsBucket(col(key), j)): _*))
        .as(Seq("j", "bucket")): _*)
    expanded
      .join(sketch, (groupCols :+ "j" :+ "bucket").map(c => expanded(c) === sketch(c))
        .reduce(_ && _), "left")
      .groupBy((groupCols :+ key).map(expanded(_)): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
