package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators the reference lacks (SURVEY §2.3 flags as-of
  * join as absent from DataFusion 44) but a time-keyed pipeline
  * needs.
  *
  * Implemented by composition (SURVEY §7.3 preference tier (a)): the
  * tagged-union + last-non-null-window rewrite. Both sides are
  * unioned with a side tag, sorted within each key partition by
  * (ts, tag) — right rows sort before left rows at equal timestamps
  * so `<=` matches — and each left row reads the latest preceding
  * right values via `last(_, ignoreNulls = true)` over an unbounded
  * preceding frame.
  *
  * Scale: exactly ONE shuffle (hash by key for the window), state is
  * a single carried value per column — the same asymptotics as a
  * native sort-merge as-of operator, with AQE/skew handling for
  * free. This is why tier (a) beats a custom SparkPlan here: the
  * semantics are expressible, so the optimizer stays in charge.
  */
object Temporal {

  /** Left as-of join: for each left row, the right row with the
    * greatest `tsCol` ≤ left's `tsCol`, within the same `keyCol` —
    * or, with `forward = true`, the SMALLEST right ts ≥ left's (the
    * next-event direction: outcome labeling, time-to-conversion —
    * the feature-store complement of the backward feature lookup).
    * `rightVals` are the right-side columns to carry. Right side
    * must be unique per (key, ts) — pre-dedup if not (see
    * [[latestPerKeyTs]]).
    *
    * The forward form is the same tagged-union single-shuffle device
    * run on the REVERSED timeline (ts desc): "latest preceding right
    * row" under the reversed order IS the earliest following one,
    * and right-before-left at equal ts keeps the match inclusive in
    * both directions.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightVals: Seq[String],
      forward: Boolean = false): DataFrame = {
    val lCols = left.columns.toSeq
    // Carry ONE struct of all right-side values, not one carried
    // column per value: per-column last(_, ignoreNulls) would skip a
    // legitimately-NULL field in the matched row (falling back to an
    // older row) and could mix fields from different right rows. The
    // struct is non-null exactly when a right row exists, so its
    // fields — NULL or not — always come from the same matched row.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    val l = left
      .select((lCols.map(col) :+ lit(1).as("__side")) :+
        lit(null).cast(rStructType).as("__rs"): _*)
    val r = right
      .select((lCols.map(c =>
        if (c == keyCol || c == tsCol) col(c) else lit(null).cast(left.schema(c).dataType).as(c))
        :+ lit(0).as("__side")) :+ struct(rightVals.map(col): _*).as("__rs"): _*)
    val tsOrd = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(tsOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionAll(r)
      .withColumn("__carried", last(col("__rs"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(col) ++
        rightVals.map(c => col("__carried").getField(c).as(s"r_$c")): _*)
  }

  /** Deduplicate a time-keyed side to one row per (key, ts), keeping
    * the row with the greatest tiebreak column — makes as-of
    * matching deterministic when timestamps can collide.
    */
  def latestPerKeyTs(df: DataFrame, keyCol: String, tsCol: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol), col(tsCol)).orderBy(col(tiebreak).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Distributed interval-overlap join via bucket alignment — the
    * equi-join rewrite of the interval×interval theta join Spark has
    * no native operator for: each CLOSED interval [start, end]
    * explodes to the fixed-width bucket ids it covers, the two sides
    * hash-join on bucket id, the exact overlap predicate
    * (lStart ≤ rEnd ∧ rStart ≤ lEnd) runs as a residual filter, and
    * `distinct` collapses pairs that share several buckets. Columns
    * must be disjoint across the two sides.
    *
    * Scale shape: a naive interval join is a BroadcastNestedLoopJoin
    * (all-pairs when neither side broadcasts); this form is a plain
    * equi-join both engines shuffle/broadcast like any other, at the
    * cost of span/bucket explode rows per interval — size `bucketUs`
    * near the typical interval length so the explode factor stays
    * O(1) (the same bucket-width-vs-value-range reasoning as the
    * banded range-join rewrite, applied to two interval sets).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs >= 1, s"bucket width must be positive, got $bucketUs")
    def bucketed(df: DataFrame, s: String, e: String) =
      df.withColumn("__b", explode(expr(s"sequence($s DIV $bucketUs, $e DIV $bucketUs)")))
    bucketed(left, lStart, lEnd)
      .join(bucketed(right, rStart, rEnd), "__b")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("__b")
      .distinct()
  }

  /** SCD-type-2 interval build from a change log: collapse each
    * key's event stream to the rows where `attrCol` actually CHANGES
    * (change-data-capture compaction), and emit validity intervals —
    * `valid_from` = the change's timestamp, `valid_to` = the next
    * change's timestamp (NULL while current), plus a version number
    * and `is_current` — the slowly-changing-dimension history table
    * every warehouse derives from an event feed ([[graft.operators
    * .Upsert]] is the SCD-1 "latest wins" sibling; this keeps the
    * full history queryable as of any time, the batch analog of the
    * CDC upsert stream).
    *
    * Determinism: rows are ordered by (ts, tiebreak) per key — a
    * total order, so the change set and interval bounds are
    * engine-exact. Scale: both windows hash-partition by the key
    * (one shuffle, reused by both — same partitioning); per-key
    * state is one carried value. Keys grow with the data, so no
    * stratum-width funnel exists here.
    */
  /** Point-in-time (PIT) join: each probe row picks up the dimension
    * version that was valid AT ITS OWN as-of timestamp — the
    * feature-store read that prevents label leakage (joining
    * "current" attributes onto historical training rows silently
    * leaks the future; the PIT rule is the fix, and every feature
    * platform's correctness hinges on it). Intervals partition each
    * key's timeline ([[scd2Intervals]]'s output shape: half-open
    * `[valid_from, valid_to)`, NULL `valid_to` = current), so every
    * probe matches at most one version; probes before the key's
    * first version keep NULLs (left join).
    *
    * Scale: an equi-join on the key with the interval containment as
    * a residual — per-key interval count is the key's CHANGE count
    * (bounded by attribute churn, not corpus size), so the residual
    * scan per probe is short and the join is a plain hash join AQE
    * can re-plan. No window, no explode.
    *
    * Output naming contract: dimension payload columns keep their
    * names UNLESS the probe side already has a column of that name,
    * in which case the dim's copy is emitted as `<name>_dim`
    * (duplicate output names would defer the ambiguity error to the
    * first downstream select, far from its cause). If `<name>_dim`
    * is itself taken, the call fails fast with the column named.
    */
  def pitJoin(probes: DataFrame, intervals: DataFrame, keyCol: String,
      asofCol: String): DataFrame = {
    // prefix EVERY dim column (not just the key): the join condition
    // and the post-join drops must resolve against the dim side even
    // when the probes side carries a column of the same name (its own
    // valid_from, or an attribute also present on the probe) — bare
    // names against the joined plan would be ambiguous or drop the
    // probe's column
    val payload = intervals.columns
      .filterNot(Set(keyCol, "valid_from", "valid_to", "is_current"))
    // payload names the probe side already carries get a
    // deterministic `_dim` suffix in the output: renaming __d_<c>
    // back to a bare name that exists on the probe would emit
    // DUPLICATE column names and defer the ambiguity error to the
    // first downstream select, far from its cause. A name where even
    // the suffixed form collides has no safe spelling — fail fast.
    val probeCols = probes.columns.toSet
    val outName: Map[String, String] = payload.map { c =>
      if (!probeCols.contains(c)) c -> c
      else if (!probeCols.contains(s"${c}_dim") && !payload.contains(s"${c}_dim"))
        c -> s"${c}_dim"
      else throw new IllegalArgumentException(
        s"pitJoin: dimension payload column `$c` collides with a probe " +
          s"column and `${c}_dim` is taken too; rename it before joining")
    }.toMap
    val dim = intervals.select(
      Seq(col(keyCol).as("__d_k"), col("valid_from").as("__d_from"),
        col("valid_to").as("__d_to")) ++
        payload.map(c => col(c).as(s"__d_$c")): _*)
    val joined = probes.join(dim,
        probes(keyCol) === dim("__d_k") &&
          dim("__d_from") <= probes(asofCol) &&
          (dim("__d_to").isNull || dim("__d_to") > probes(asofCol)),
        "left")
      .drop("__d_k", "__d_from", "__d_to")
    payload.foldLeft(joined)((df, c) => df.withColumnRenamed(s"__d_$c", outName(c)))
  }

  def scd2Intervals(events: DataFrame, keyCol: String, tsCol: String,
      attrCol: String, tiebreak: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(tiebreak).asc)
    events
      .select(col(keyCol), col(tsCol), col(attrCol), col(tiebreak))
      .withColumn("__prev", lag(col(attrCol), 1).over(byKey))
      // null-safe inequality: a NULL attribute is a real state —
      // NULL -> value and value -> NULL are both changes, and the
      // first row per key (prev = NULL from lag) always opens v1
      .withColumn("__chg",
        row_number().over(byKey) === 1 || !(col(attrCol) <=> col("__prev")))
      .filter(col("__chg"))
      .withColumn("version", row_number().over(byKey).cast("long"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(attrCol), col("version"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }
}
