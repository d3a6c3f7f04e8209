package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators: the steps between a cleaned document
  * set and a training run — deterministic train/val/test splitting
  * and fixed-budget sequence packing. Both are pure narrow/window
  * transformations with no driver state, and both are *content-
  * addressed* (hash of stable ids, not RNG), so any engine — and any
  * re-run — reproduces the same assignment: reproducible splits are
  * a correctness property of a data pipeline, not a convenience.
  */
object Corpus {

  /** Deterministic stratified split by stable content hash:
    * bucket = first 6 hex digits of md5(doc_id) mod 100, mapped to
    * train/val/test by percentage. Unlike `randomSplit` (RNG +
    * partition-order dependent) this is a pure per-row projection —
    * no shuffle, identical assignment on any cluster, any partition
    * layout, any engine; adding documents never reassigns existing
    * ones (the property that keeps eval sets stable as a corpus
    * grows).
    */
  def deterministicSplit(docs: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
      .cast("long") % 100
    docs.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Leakage-safe train/val/test split: the same content-hash
    * assignment as [[deterministicSplit]], but keyed on each
    * document's near-duplicate cluster representative (its
    * connected-component label) instead of its own id — so a
    * near-duplicate pair can never straddle train and eval, the
    * split-leakage failure mode the decontamination literature warns
    * about (eval examples whose near-copies sit in train score as
    * memorization, not generalization). Documents in no cluster
    * represent themselves, which makes the assignment IDENTICAL to
    * [[deterministicSplit]]'s on the un-clustered majority.
    *
    * Scale shape: the label table covers clustered docs only — a
    * small fraction of any real corpus — so the left join broadcasts
    * (AQE picks this up from runtime stats); assignment is then the
    * same pure per-row projection as the plain split. No extra
    * shuffle, partition-invariant, and stable under corpus growth
    * except when clusters merge — inherent to the semantics, since a
    * doc's split must follow its cluster.
    */
  def leakageSafeSplit(docs: DataFrame, labels: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val rep = docs
      .join(labels.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
      .withColumn("rep_id", coalesce(col("cluster_id"), col("doc_id")))
    val bucket = conv(substring(md5(col("rep_id").cast("string")), 1, 6), 16, 10)
      .cast("long") % 100
    rep.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Fixed-budget sequence packing (concat-and-chunk): documents are
    * laid head-to-tail in a deterministic order and cut into
    * `budgetTokens`-sized bins — the standard pretraining batch
    * assembly. A document's bin is decided by its *starting* offset
    * (floor(prefix-sum-before / budget)), so bins may overflow by at
    * most one document tail, never underfill mid-stream.
    *
    * Scale shape: the prefix sum runs per (lang, source) stratum —
    * a partitioned window, one shuffle, parallel across strata — not
    * a global ORDER BY (which would serialize the corpus through one
    * task at 100 TB). Bins are keyed (lang, source, bin).
    */
  def packSequences(docs: DataFrame, budgetTokens: Int = 200): DataFrame = {
    val w = Window.partitionBy("lang", "source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum", sum("n_tok").over(w))
      .withColumn("bin", floor((col("cum") - col("n_tok")) / lit(budgetTokens.toDouble)).cast("long"))
  }

  /** Temperature-flattened mixture sampling at α = 0.5: each
    * language's keep target is ceil(sqrt(cnt · min_cnt)) — the
    * geometric mean of its own size and the smallest language's, the
    * midpoint of the standard cnt^α interpolation between fully
    * balanced (α = 0, everyone cut to the minimum — that is
    * [[graft.queries.Pipeline.mixBalance]]) and fully proportional
    * (α = 1, no cut). Rare languages keep everything; dominant ones
    * are tempered, not flattened — the usual multilingual-pretraining
    * compromise. sqrt is IEEE correctly-rounded, so the target is
    * engine-exact (no libm pow).
    *
    * Survivors are picked in content-hash order (md5 of doc_id), the
    * same RNG-free device as [[deterministicSplit]]: any engine, any
    * run, any partitioning reproduces the identical sample.
    *
    * Scale shape: the per-language targets are a lang-keyed aggregate
    * (a handful of rows, broadcast back); the rank cut is one window
    * per language partition. At 100 TB the exact rank becomes an
    * approx-quantile cut on the same hash — same estimator, no full
    * per-group sort.
    */
  def temperatureSample(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    val targets = counts
      .crossJoin(broadcast(counts.agg(min(col("cnt")).as("mn"))))
      .select(col("lang"),
        ceil(sqrt(col("cnt").cast("double") * col("mn"))).cast("long").as("tgt"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    docs.select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(w))
      .join(broadcast(targets), "lang")
      .filter(col("rn") <= col("tgt"))
      .select(col("doc_id"), col("lang"))
  }

  /** Per-language source-mix drift report: for each language, the
    * total-variation distance between ITS source distribution and the
    * corpus-wide one — the continuous-monitoring number a curation
    * pipeline alarms on when one language's crawl mix silently skews
    * (TVD = ½·Σ_s |p(s|lang) − p(s)|, the "what fraction of this
    * language's documents are from the wrong sources" reading).
    *
    * Determinism contract: no libm. TVD is assembled from EXACT
    * integer counts — ½·Σ|cnt_ls·total − cnt_s·langTot| /
    * (langTot·total) — summed as DECIMAL(38,0) (overflow-safe at any
    * corpus size: counts ≤ 2⁶³, products ≤ 2¹²⁶ < 10³⁸... bounded by
    * the decimal sum, and each |term| itself fits DECIMAL(38,0) for
    * corpora to ~10¹⁸ docs), with ONE final double division of exact
    * integers — IEEE-identical on any engine — rounded to 6dp.
    *
    * Scale shape: two tiny keyed aggregates (lang×source and source —
    * dimension-sized, broadcast), a broadcast grid join so sources a
    * language LACKS still contribute |0 − p(s)|, and a lang-keyed
    * final aggregate. The corpus is scanned once; nothing shuffles
    * data rows.
    */
  def mixDrift(docs: DataFrame): DataFrame = {
    val ls = docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("cnt_ls"))
    val s = docs.groupBy(col("source")).agg(count(lit(1)).as("cnt_s"))
    val langTot = ls.groupBy(col("lang")).agg(sum(col("cnt_ls")).as("lang_tot"))
    val total = docs.count()
    val D = "decimal(38,0)"
    // full lang × source grid: absent combos must still pay |0 - p(s)|
    val grid = langTot.crossJoin(broadcast(s))
      .join(ls, Seq("lang", "source"), "left")
      .na.fill(0L, Seq("cnt_ls"))
    grid
      .groupBy(col("lang"), col("lang_tot"))
      .agg(sum(abs(col("cnt_ls").cast(D) * lit(total) - col("cnt_s").cast(D) * col("lang_tot")))
        .as("num"))
      .select(col("lang"), col("lang_tot").as("n_docs"),
        round(col("num").cast("double")
          / (lit(2.0) * col("lang_tot").cast("double") * lit(total.toDouble)), 6).as("tvd"))
  }

  /** Deterministic global training order: every document gets an
    * exact global rank in content-hash order — the RNG-free "shuffle"
    * a reproducible training run consumes (same device as
    * [[deterministicSplit]]: the hash IS the permutation, identical
    * on any engine, any run, any partitioning).
    *
    * Scale shape — the point of this operator: a global
    * `row_number() OVER (ORDER BY h)` would funnel the corpus through
    * ONE window partition. Instead this is the standard two-pass
    * distributed ranking: the hash's first byte range-partitions rows
    * into 256 buckets (hash uniformity makes them balanced), each
    * bucket ranks internally (parallel windows), and a 256-row
    * offset table — the only global state — broadcasts back to shift
    * per-bucket ranks into the exact global permutation. Ordering by
    * (bucket, h, doc_id) equals ordering by (h, doc_id) because the
    * bucket IS h's prefix.
    */
  def trainingOrder(docs: DataFrame): DataFrame = {
    val keyed = docs
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .withColumn("bucket", conv(substring(col("h"), 1, 2), 16, 10).cast("int"))
    // 256-row cumulative offsets: the tiny single-partition window is
    // dimension-sized by construction, never corpus-sized
    val offsets = keyed.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum(col("cnt")).over(
          Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    val w = Window.partitionBy("bucket").orderBy(col("h").asc, col("doc_id").asc)
    keyed
      .withColumn("rk", row_number().over(w))
      .join(broadcast(offsets), "bucket")
      .select(col("doc_id"), (col("offset") + col("rk")).cast("long").as("global_rank"))
  }

  /** Deterministic negative sampling for contrastive training: k
    * pseudo-random negatives per anchor, RNG-free — the offset into
    * the id ring is a content hash of (anchor, j), so any engine,
    * any run, any partitioning draws the identical negatives (the
    * same reproducibility contract as [[deterministicSplit]]).
    * offset ∈ [1, n−1] ⇒ a negative never equals its anchor.
    *
    * Id-space contract: the ring arithmetic assumes ids 0..n−1 (the
    * fixture contract); for sparse ids the trailing semi join — kept
    * even in the dense case so the semantics are "existing docs
    * only" — drops unmapped draws, and a production corpus densifies
    * first (rank or hash-ring join). Scale shape: a per-row explode
    * (k rows per anchor, the contrastive batch dimension) + one
    * id-keyed semi join; the corpus count is the single driver-side
    * scalar (a count, not data).
    */
  def negativeSamples(docs: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, s"negative sampling needs k >= 1, got $k") // sequence(1, 0) would yield [1, 0]
    val n = docs.count()
    require(n >= 2, s"negative sampling needs at least 2 docs, got $n")
    val ids = docs.select(col("doc_id"))
    ids
      .select(col("doc_id"), explode(expr(s"sequence(1, $k)")).as("j"))
      .withColumn("off",
        lit(1L) + conv(substring(md5(
          concat(col("doc_id").cast("string"), lit(":"), col("j").cast("string"))), 1, 6), 16, 10)
          .cast("long") % lit(n - 1))
      .withColumn("neg_id", (col("doc_id") + col("off")) % lit(n))
      .select(col("doc_id"), col("j"), col("neg_id"))
      .join(ids.select(col("doc_id").as("neg_id")), Seq("neg_id"), "left_semi")
      .select(col("doc_id"), col("j"), col("neg_id"))
  }

  /** Token-budget-capped corpus selection: per (lang, source) stratum,
    * keep the best-quality documents whose CUMULATIVE token count
    * stays within `budget` — the mixing step that allocates a fixed
    * token budget to each source when assembling a training mix.
    * Greedy quality-ranked PREFIX semantics (not knapsack): documents
    * are ranked (quality DESC NULLS LAST, doc_id ASC — a total
    * order), and a document is kept iff the running total through
    * itself fits. Deterministic, monotone in the budget, and
    * engine-reproducible — the knapsack optimum is none of those.
    *
    * Scale shape: one partitioned window (shuffle by stratum, sort
    * within) — parallel across strata like [[packSequences]], never
    * a global sort; the budget filter is a per-row predicate on the
    * running sum.
    *
    * `docs` supplies (doc_id, lang, source); `quality` supplies
    * (doc_id, n_tokens, quality) — [[graft.pipeline.TextAnalysis
    * .qualityScores]] shape, joined on doc_id so tokenization is
    * computed (or reused) once.
    */
  def tokenBudgetSelect(docs: DataFrame, quality: DataFrame, budget: Long): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("quality").desc_nulls_last, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("lang"), col("source"))
      .join(quality.select(col("doc_id"), col("n_tokens"), col("quality")), Seq("doc_id"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }
}
