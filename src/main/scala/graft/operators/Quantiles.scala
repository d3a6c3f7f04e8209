package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact quantiles at 100 TB — the sketch-bracket algorithm.
  *
  * Spark's exact percentile aggregates (`percentile`,
  * `percentile_disc`, `median`) buffer EVERY value of a group in one
  * aggregation buffer: O(group) executor memory, the documented
  * scale-killer of q_percentile_exact (a 10^10-row group at sf-100TB
  * does not fit anywhere). The classic fix is that an exact quantile
  * only needs a SORT of the rows near the target rank — and a
  * mergeable sketch can bracket that neighborhood cheaply:
  *
  *  1. one aggregation pass computes, per group, the count and a
  *     quantile-sketch bracket [lo, hi] around each requested q
  *     (`percentile_approx` at `accuracy` A has rank error ≤ n/A, so
  *     sketching q ± 4/A guarantees the true rank-k value lies
  *     inside);
  *  2. one scan counts rows strictly below `lo` (the rank offset);
  *  3. one scan keeps only the bracket rows — expected ≈ 8n/A per
  *     group (~160 rows at n = 200k, A = 10k), independent of skew —
  *     and a per-group window sort of that sliver reads off the
  *     exact rank-k value.
  *
  * Every pass is a partial-aggregating scan or a filter; the only
  * sort touches O(n/A) rows per group. Memory is O(sketch + bracket),
  * never O(group). Semantics are PERCENTILE_DISC: the smallest value
  * whose cumulative distribution reaches q (rank k = ceil(q·n)),
  * which is also what the DuckDB oracle computes.
  */
object Quantiles {

  /** Exact discrete quantiles of `valCol` (non-null rows) per group,
    * one output row per (group, q): `groupCols..., q, value`.
    * Requires 4/accuracy < q < 1 - 4/accuracy so the bracket stays
    * inside (0, 1).
    */
  def exactDisc(df: DataFrame, groupCols: Seq[String], valCol: String,
      qs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val margin = 4.0 / accuracy
    require(qs.nonEmpty, "no quantiles requested")
    qs.foreach(q => require(q > margin && q < 1 - margin,
      s"q=$q outside the bracketable range ($margin, ${1 - margin})"))
    val g = groupCols.map(col)
    val v = col(valCol)
    val base = df.filter(v.isNotNull).select(g :+ v: _*)

    // NaN sorts GREATER than every double in both Spark's and
    // DuckDB's sort order, so percentile_disc returns NaN whenever
    // the target rank lands in a group's NaN tail. Brackets can't
    // reach NaN (every NaN comparison is false), so NaN rows are
    // counted into the total rank space but excluded from the sketch
    // and the sliver — a rank past the finite prefix IS the answer
    // NaN, decided arithmetically below.
    val fin = when(!isnan(v), v)

    // pass 1: per-group counts + sketch brackets for every q in one
    // aggregation (percentile_approx takes the whole bounds array and
    // ignores the nulls the NaN-mask introduces)
    val bounds = qs.flatMap(q => Seq(q - margin, q + margin))
    val boundsCol = array(bounds.map(lit): _*)
    val stats = base.groupBy(g: _*).agg(
      count(v).as("__n"),
      count(fin).as("__n_fin"),
      percentile_approx(fin, boundsCol, lit(accuracy)).as("__bs"))
    // one row per (group, q) with its bracket and target rank. perQ
    // feeds three consumers and re-derives the pass-1 aggregate per
    // consumer — measured A/B (r21): checkpointing it here SLOWS the
    // direct-scan callers (an extra write job costs more than two
    // re-aggregations of a parquet scan: latency_percentiles 2.3→3.6 s)
    // and only pays when `df` itself is an expensive derivation, which
    // is the CALLER's call — robustStats checkpoints its quartile frame
    // before the MAD pass for exactly that reason.
    val perQ = stats.select(
      g :+ posexplode(array(qs.indices.map(i =>
        struct(lit(qs(i)).as("q"),
          element_at(col("__bs"), 2 * i + 1).as("lo"),
          element_at(col("__bs"), 2 * i + 2).as("hi"))): _*)) :+ col("__n") :+ col("__n_fin"): _*)
      .select(g ++ Seq(col("col.q").as("q"), col("col.lo").as("lo"),
        col("col.hi").as("hi"), ceil(col("col.q") * col("__n")).cast("long").as("k"),
        col("__n_fin")): _*)
    val nanHits = perQ.filter(col("k") > col("__n_fin"))
      .select(g ++ Seq(col("q"), lit(Double.NaN).as("value")): _*)
    val finQ = perQ.filter(col("k") <= col("__n_fin"))

    // passes 2+3 share one broadcast join of the tiny per-(group, q)
    // bracket table against the base scan
    val joined = base.filter(!isnan(v)).join(broadcast(finQ), groupCols)
    val keys = (g :+ col("q")).map(_.toString)
    val cLo = joined.groupBy(g :+ col("q"): _*)
      .agg(sum(when(v < col("lo"), 1L).otherwise(0L)).as("__c_lo"))
    val w = Window.partitionBy(g :+ col("q"): _*).orderBy(v.asc)
    val bracket = joined.filter(v >= col("lo") && v <= col("hi"))
      .withColumn("__rn", row_number().over(w))
    bracket.join(cLo, keys)
      .filter(col("__rn") === col("k") - col("__c_lo"))
      .select(g ++ Seq(col("q"), v.as("value")): _*)
      .unionAll(nanHits)
  }

  /** Reference implementation for the spec: Spark's buffer-everything
    * `percentile_disc`, one row per (group, q).
    */
  def sortBasedDisc(df: DataFrame, groupCols: Seq[String], valCol: String,
      qs: Seq[Double]): DataFrame = {
    val g = groupCols.map(col)
    qs.map { q =>
      df.filter(col(valCol).isNotNull)
        .groupBy(g: _*)
        .agg(expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY $valCol)").as("value"))
        .select(g ++ Seq(lit(q).as("q"), col("value")): _*)
    }.reduce(_ unionAll _)
  }

  /** Quantile normalization — map each stratum's value distribution
    * onto the GLOBAL distribution (the batch-effect correction of
    * bioinformatics/feature pipelines: after it, every stratum has
    * the same marginal distribution). Discrete convention: a row at
    * within-stratum rank r of n_s rows maps to the global value at
    * rank ⌈r·n_g/n_s⌉ — rank 1 → the global minimum region, rank
    * n_s → the global maximum, ties broken by `idCol` so the map is
    * a function.
    *
    * Scale: BOTH rankings (per-stratum and global) run through the
    * [[Ranks]] two-pass bucketed machinery — no stratum-width and no
    * corpus-width window ever materializes on one task (the global
    * ranking is exactly [[graft.pipeline.Corpus.trainingOrder]]'s
    * shape). The target-rank lookup is a plain equi-join on the
    * unique global rank. The ⌈r·n_g/n_s⌉ product routes through
    * DECIMAL(38,0) so the arithmetic survives 10¹²-row strata.
    */
  def quantileNormalize(df: DataFrame, strataCols: Seq[String], valCol: String,
      idCol: String, nBuckets: Int = 64): DataFrame = {
    import graft.operators.Ranks.{bucketOffsets, withRangeBucket}
    val v = col(valCol)
    val base = df.select((strataCols ++ Seq(valCol, idCol)).distinct.map(col): _*)
      .filter(v.isNotNull)
    // pass 1: exact rank within each stratum, bucket-parallel
    val keyed = withRangeBucket(base, strataCols, v, nBuckets, descending = false)
    val wIn = Window.partitionBy((strataCols :+ "bucket").map(col): _*)
      .orderBy(v.asc, col(idCol).asc)
    val ranked = keyed
      .withColumn("__rin", row_number().over(wIn).cast("long"))
      .join(broadcast(bucketOffsets(keyed, strataCols, lit(1L))), strataCols :+ "bucket")
      .withColumn("__r", col("b_off") + col("__rin"))
      .drop("bucket", "b_off", "__rin")
    // pass 2: exact GLOBAL rank of the same key (empty-strata Ranks)
    val gkeyed = withRangeBucket(base.select(v, col(idCol)), Seq(), v, nBuckets, descending = false)
    val wG = Window.partitionBy(col("bucket")).orderBy(v.asc, col(idCol).asc)
    val globalRanked = gkeyed
      .withColumn("__gin", row_number().over(wG).cast("long"))
      .join(broadcast(bucketOffsets(gkeyed, Seq(), lit(1L))), Seq("bucket"))
      .select((col("b_off") + col("__gin")).as("__grank"), v.as("norm_value"))
    val nS = base.groupBy(strataCols.map(col): _*).agg(count(lit(1)).as("__ns"))
    val nG = base.agg(count(lit(1)).as("__ng"))
    ranked
      .join(broadcast(nS), strataCols)
      .crossJoin(broadcast(nG))
      .withColumn("__gtarget",
        expr("""CAST((CAST(__r AS DECIMAL(38,0)) * __ng + __ns - 1) DIV __ns AS BIGINT)"""))
      .join(globalRanked, col("__gtarget") === col("__grank"))
      .select((strataCols.map(col) ++ Seq(col(idCol), v, col("norm_value"))): _*)
  }

  /** Robust dispersion statistics per group over `valCol` (read as
    * DOUBLE): exact PERCENTILE_DISC quartiles, IQR, MAD (median of
    * absolute deviations from the group median — the robust sigma,
    * MAD·1.4826 ≈ σ for normal data), and the Tukey-fence outlier
    * count (beyond quartile ± 1.5·IQR, compared as `2x ≶ 2q ∓ 3·IQR`
    * so integer-valued inputs stay exact in double).
    *
    * Both percentile passes run through [[exactDisc]] — bounded
    * memory per group at any group width — and the quartile table is
    * broadcast back for the deviation/fence scans, so the whole
    * report is three linear scans plus sliver sorts, never a
    * buffer-the-group aggregate (the q_percentile_exact hazard this
    * module exists to remove).
    */
  def robustStats(df: DataFrame, groupCols: Seq[String], valCol: String): DataFrame = {
    val g = groupCols.map(col)
    val v = col(valCol).cast("double")
    val base = df.filter(v.isNotNull).select(g :+ v.as("__v"): _*)
    // the quartile frame is one row per group, but its lineage is the
    // whole first sketch-bracket pass; the MAD pass joins it back onto
    // the corpus and (before r21) re-derived that pass once per
    // internal exactDisc scan — checkpoint the handful of rows so every
    // downstream consumer reads a literal-sized parquet instead
    val piv = graft.engine.Scratch.checkpoint(
      exactDisc(base, groupCols, "__v", Seq(0.25, 0.5, 0.75))
        .groupBy(g: _*)
        .agg(
          max(when(col("q") === 0.25, col("value"))).as("p25"),
          max(when(col("q") === 0.5, col("value"))).as("median"),
          max(when(col("q") === 0.75, col("value"))).as("p75")),
      "robust-piv")
    val joined = base.join(broadcast(piv), groupCols)
    val mad = exactDisc(
        joined.withColumn("__absdev", abs(col("__v") - col("median"))),
        groupCols, "__absdev", Seq(0.5))
      .groupBy(g: _*).agg(max(col("value")).as("mad"))
    val iqr3 = (col("p75") - col("p25")) * 3
    // n_rows rides the fences aggregate (the broadcast join keeps
    // exactly one piv row per group, so count(joined) == count(base)
    // per group) — one corpus scan instead of two
    val fences = joined.groupBy(g: _*).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("__v") * 2 < col("p25") * 2 - iqr3
            || col("__v") * 2 > col("p75") * 2 + iqr3, 1L).otherwise(0L)).as("n_outliers"))
    fences
      .join(broadcast(piv), groupCols)
      .withColumn("iqr", col("p75") - col("p25"))
      .join(broadcast(mad), groupCols)
      .select(g ++ Seq(col("n_rows"), col("p25"), col("median"), col("p75"),
        col("iqr"), col("mad"), col("n_outliers")): _*)
  }
}
