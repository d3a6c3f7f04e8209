package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  // The two-pass bucketed-ranking machinery lives in
  // [[graft.operators.Ranks]] (shared with the weighted-percentile
  // query family); the corpus operators below are its original
  // callers — see each scaladoc for the per-operator bucketing
  // choice (hash-prefix vs approx-quantile ranges).
  import graft.operators.Ranks.{bucketOffsets, withRangeBucket}

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
    * Scale shape: the label table covers clustered docs only. On
    * clean corpora that is a small fraction and AQE broadcasts the
    * join from runtime stats — but real web crawls run 30-50%
    * near-dup rates, where the label side is corpus-scale; the join
    * is a plain doc_id equi-join, so AQE then degrades it gracefully
    * to a shuffle join (one extra shuffle on the label side,
    * CorpusSpec exercises a ≥30%-clustered corpus) rather than
    * breaking. Assignment after the join is the same pure per-row
    * projection as the plain split: partition-invariant, and stable
    * under corpus growth except when clusters merge — inherent to
    * the semantics, since a doc's split must follow its cluster.
    *
    * Labels are defensively deduped to one row per doc_id (min
    * cluster_id — deterministic) so a malformed multi-label input
    * cannot duplicate documents through the left join;
    * [[graft.pipeline.Dedup.connectedComponents]] already emits
    * unique doc_ids, making the dedupe a no-op aggregate there.
    */
  def leakageSafeSplit(docs: DataFrame, labels: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val uniq = labels.select(col("doc_id"), col("cluster_id"))
      .groupBy(col("doc_id")).agg(min(col("cluster_id")).as("cluster_id"))
    val rep = docs
      .join(uniq, Seq("doc_id"), "left")
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
    * Scale shape: a plain per-(lang, source) window would be a
    * stratum-width funnel — with a fixed handful of strata each
    * window partition grows linearly with the corpus, so at 100 TB
    * single tasks sort terabytes. Instead the prefix sum is the
    * two-pass distributed form [[trainingOrder]] uses for the global
    * case, applied WITHIN each stratum: per-stratum approximate
    * doc_id quantiles range-partition rows into `nBuckets`
    * order-consistent sub-buckets, each (stratum, bucket) runs its
    * running sum in parallel, and a broadcast strata × buckets offset
    * table shifts local sums into the exact stratum-wide prefix sums
    * — cum-for-cum identical to the single window (the graded oracle
    * replays the single-window form). Window-partition width is
    * corpus/(strata·nBuckets), tunable independently of corpus size.
    */
  def packSequences(docs: DataFrame, budgetTokens: Int = 200, nBuckets: Int = 64): DataFrame = {
    val strata = Seq("lang", "source")
    // tokenization is consumed THREE times below (quantile bounds,
    // the windowed rows, the offset table) and Spark replicates an
    // unspooled subtree into each consumer — spool the narrow
    // text-free frame once so the corpus text is read and split
    // exactly once at any scale (same Scratch pattern as
    // TextAnalysis.perplexityBuckets)
    val base = graft.engine.Scratch.checkpoint(
      docs.select(col("doc_id"), col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok")),
      "pack-base")
    val keyed = withRangeBucket(base, strata, col("doc_id"), nBuckets, descending = false)
    val wIn = Window.partitionBy("lang", "source", "bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .withColumn("cum_in", sum("n_tok").over(wIn))
      .join(broadcast(bucketOffsets(keyed, strata, col("n_tok"))), strata :+ "bucket")
      .withColumn("cum", col("b_off") + col("cum_in"))
      .withColumn("bin", floor((col("cum") - col("n_tok")) / lit(budgetTokens.toDouble)).cast("long"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"), col("cum"), col("bin"))
  }

  /** Length-bucketed batching report — the padding-efficiency signal
    * behind bucketed batch assembly (group sequences of similar
    * length so each batch pads to its own bucket ceiling, not the
    * global max): documents land in token-length buckets rounded up
    * to the next multiple of `padMultiple` (the accelerator tile
    * size real pipelines pad to), and each bucket reports its
    * document count, true token mass, padded token mass, the waste
    * delta, and an integer parts-per-billion fill ratio.
    *
    * Everything is exact integer arithmetic — bucket ceilings come
    * from integer div, never float log2/pow, so the report
    * hash-matches any engine. Scale shape: one projection + one
    * partial-combining aggregate over a bucket-count-sized key space
    * (seq-length/padMultiple buckets); no window, no join, nothing
    * grows with the corpus but the scan.
    */
  def lengthBuckets(docs: DataFrame, padMultiple: Int = 32): DataFrame = {
    require(padMultiple >= 1, s"padMultiple must be positive, got $padMultiple")
    docs
      .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
      // DIV, not `/` — Spark's `/` on BIGINT is IEEE double division
      .withColumn("bucket_max",
        expr(s"((n_tok + ${padMultiple - 1}) DIV $padMultiple) * CAST($padMultiple AS BIGINT)"))
      .groupBy("bucket_max")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tok"))
      .select(
        col("bucket_max"),
        col("n_docs"),
        col("sum_tok"),
        (col("bucket_max") * col("n_docs") - col("sum_tok")).as("pad_waste"),
        expr("CAST((sum_tok * 1000000000) DIV (bucket_max * n_docs) AS BIGINT)")
          .as("fill_ppb"))
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
    * (a handful of rows, broadcast back). The rank cut does NOT run
    * one window per language — per-language partitions grow linearly
    * with the corpus — but the [[trainingOrder]] two-pass applied
    * within each language: the ordering key is the md5 hash itself,
    * so its first `hexChars` characters ARE an order-consistent range
    * bucket (no quantile sketch needed, hash uniformity balances the
    * buckets for free), each (lang, bucket) ranks in parallel, and a
    * broadcast langs × buckets offset table restores the exact
    * per-language ranks. Rank-for-rank identical to the single
    * window; this supersedes the earlier idea of an approx-quantile
    * threshold cut, which would only have approximated the target
    * counts — the two-pass keeps them exact at the same parallelism.
    */
  def temperatureSample(docs: DataFrame, hexChars: Int = 2): DataFrame = {
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    val targets = counts
      .crossJoin(broadcast(counts.agg(min(col("cnt")).as("mn"))))
      .select(col("lang"),
        ceil(sqrt(col("cnt").cast("double") * col("mn"))).cast("long").as("tgt"))
    val keyed = docs
      .select(col("doc_id"), col("lang"), md5(col("doc_id").cast("string")).as("h"))
      .withColumn("bucket", conv(substring(col("h"), 1, hexChars), 16, 10).cast("int"))
    val w = Window.partitionBy(col("lang"), col("bucket"))
      .orderBy(col("h").asc, col("doc_id").asc)
    keyed
      .withColumn("rk", row_number().over(w))
      .join(broadcast(bucketOffsets(keyed, Seq("lang"), lit(1L))), Seq("lang", "bucket"))
      .withColumn("rn", col("b_off") + col("rk"))
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
  def mixDrift(docs: DataFrame): DataFrame =
    mixDriftFromCounts(
      docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("cnt_ls")),
      docs.count())

  /** [[mixDrift]]'s TVD derivation from an ALREADY-AGGREGATED
    * (lang, source, cnt_ls) count table — the ONE definition of the
    * arithmetic, shared by the batch form (counts from a corpus scan)
    * and the streaming monitor (counts from the Complete-mode
    * aggregation state), so the two forms are bit-identical by
    * construction and share one oracle. Source and language totals
    * are re-derived from the count table (every document lands in
    * exactly one (lang, source) cell, so the sums equal direct
    * counts); `total` is the caller's corpus size — a dimension-sized
    * driver scalar either way.
    */
  def mixDriftFromCounts(ls: DataFrame, total: Long): DataFrame = {
    val s = ls.groupBy(col("source")).agg(sum(col("cnt_ls")).as("cnt_s"))
    val langTot = ls.groupBy(col("lang")).agg(sum(col("cnt_ls")).as("lang_tot"))
    // enforce the docstring's overflow bound loudly: past ~1e18 docs
    // the DECIMAL(38,0) |term|s could overflow, and under non-ANSI
    // mode overflow -> NULL, which sum() silently DROPS — the metric
    // would understate drift instead of failing
    require(total < 1000000000000000000L,
      s"mixDrift's exact-integer TVD is bounded at 1e18 documents, got $total")
    val D = "decimal(38,0)"
    // full lang × source grid: absent combos must still pay |0 - p(s)|
    val grid = langTot.crossJoin(broadcast(s))
      .join(ls, Seq("lang", "source"), "left")
      .na.fill(0L, Seq("cnt_ls"))
    grid
      .groupBy(col("lang"), col("lang_tot"))
      .agg(sum(abs(col("cnt_ls").cast(D) * lit(total) - col("cnt_s").cast(D) * col("lang_tot")))
        .as("num"))
      .select(col("lang"), col("lang_tot").cast("long").as("n_docs"),
        round(col("num").cast("double")
          / (lit(2.0) * col("lang_tot").cast("double") * lit(total.toDouble)), 6).as("tvd"))
  }

  /** Waterfilling token-budget allocator: split a global character
    * budget `total · budgetNum / budgetDen` across languages as
    * evenly as availability allows — every language gets the common
    * water level except those whose whole corpus fits UNDER it, which
    * are capped at what they have (the classic max-min fair
    * allocation; the mixing step a budgeted multilingual run uses to
    * stop English from absorbing the whole budget).
    *
    * Closed form, no iteration: sort languages by availability
    * ascending; with inclusive prefix sums P_k, the capped set is the
    * maximal prefix where `P_k + avail_k·(L−k) ≤ B` — that LHS is
    * NONDECREASING in k under the sort (difference telescopes to
    * `(avail_{k+1}−avail_k)(L−k) ≥ 0`), so "capped" is a prefix and
    * one window pass finds it. The remaining budget divides exactly:
    * base = (B−P*) DIV m, and the first `B−P* mod m` uncapped
    * languages (availability order) get +1 — safe because maximality
    * of the prefix forces every uncapped availability ≥ base+1. All
    * integer arithmetic: the allocation replays digit-for-digit on
    * any engine.
    *
    * Scale shape: ONE corpus-scan aggregate to the language frame;
    * everything after runs on that dimension-sized relation (the
    * single-partition window over ≤ thousands of language rows is the
    * [[graft.operators.Ranks.bucketOffsets]] precedent — the corpus
    * itself never shuffles). `avail·(L−rn)` stays inside BIGINT up to
    * ~10¹⁴ chars × 10⁴ languages.
    */
  def waterfillBudget(docs: DataFrame, budgetNum: Int = 1, budgetDen: Int = 2): DataFrame =
    waterfillAlloc(docs.groupBy(col("lang")).agg(sum(col("n_chars")).as("avail")),
      budgetNum, budgetDen)

  /** The waterfill closed form over an already-aggregated
    * `(lang, avail)` frame — factored out of [[waterfillBudget]] so
    * other availability measures (e.g. tokenizer piece counts in
    * [[graft.pipeline.TextAnalysis.tokenizeBudget]]) share the exact
    * same integer allocation.
    */
  def waterfillAlloc(c: DataFrame, budgetNum: Int = 1, budgetDen: Int = 2): DataFrame = {
    require(budgetDen > 0 && budgetNum >= 0,
      s"budget fraction $budgetNum/$budgetDen must be nonnegative")
    val w = Window.orderBy(col("avail").asc, col("lang").asc)
    val g = c
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum",
        sum(col("avail")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = c.agg(sum(col("avail")).as("total"), count(lit(1)).as("nl"))
    val j = g.crossJoin(broadcast(tot))
      .withColumn("budget", expr(s"(total * $budgetNum) DIV $budgetDen"))
      .withColumn("capped", col("cum") + col("avail") * (col("nl") - col("rn")) <= col("budget"))
    val pre = j.agg(
      sum(when(col("capped"), 1L).otherwise(0L)).as("k"),
      max(when(col("capped"), col("cum")).otherwise(lit(0L))).as("pstar"))
    j.crossJoin(broadcast(pre))
      .withColumn("alloc",
        when(col("capped"), col("avail")).otherwise(
          expr("(budget - pstar) DIV (nl - k)") +
            when(col("rn") - col("k") <= expr("(budget - pstar) % (nl - k)"), 1L)
              .otherwise(0L)))
      .select(col("lang"), col("avail"), col("alloc"), col("capped"),
        // an all-empty language (avail = 0) is vacuously fully used
        when(col("avail") > 0,
          expr(s"CAST(${utilPpbSql("DIV")} AS BIGINT)"))
          .otherwise(lit(1000000000L)).as("util_ppb"))
      .orderBy("lang")
  }

  /** Rendezvous-hash constants, shared verbatim with the generated
    * oracle: the universal-family modulus and three multipliers,
    * all < 2³¹ so `(doc_id mod p)·a` stays inside BIGINT.
    */
  val RendezvousP = 2147483647L
  val RendezvousA = 48271L
  val RendezvousB = 69621L
  val RendezvousC = 12345L

  /** Per-shard multipliers `a^(s+1) mod p` — the shard must enter
    * the weight MULTIPLICATIVELY: an additive `shard·b` term is
    * linear in s, so one shard's weight dominates for every document
    * and the "hash" routes everything to one place.
    */
  def rendezvousMultipliers(n: Int): Seq[Long] =
    (1 to n).map(i => BigInt(RendezvousA).modPow(i, RendezvousP).toLong)

  /** Per-(doc, shard) rendezvous weight as shared SQL text: the doc
    * id is scrambled FIRST (`x = (doc·c + b) mod p` — without this,
    * small sequential ids never wrap against the low-power shard
    * multipliers and the low shards starve), then `((x + 1)·m_s)
    * mod p`. Plain BIGINT arithmetic both engines evaluate
    * identically; every product stays under 2⁶².
    */
  def rendezvousWeightSql(doc: String, m: String): String =
    s"((((($doc % $RendezvousP) * $RendezvousC + $RendezvousB) % $RendezvousP + 1) * ($m)) % $RendezvousP)"

  /** Rendezvous (highest-random-weight) shard assignment — Thaler &
    * Ravishankar 1998, the routing primitive consistent output
    * partitioning is built on: each document goes to the shard with
    * the highest per-(doc, shard) hash weight (ties to the lowest
    * shard id). The property that makes it the 100 TB choice over
    * `doc_id mod n`: growing n → n+1 moves ONLY the documents whose
    * new-shard weight wins — every mover lands on the NEW shard and
    * nothing reshuffles among the old ones, so a shard add is an
    * incremental copy, not a corpus-wide repartition. That law is
    * exact for ANY fixed weight function and the graded query
    * asserts it relationally.
    *
    * Scale: ONE per-row codegen HOF pass (the n-way argmax runs
    * inside the scan stage); no shuffle, no state.
    */
  def rendezvousShard(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 1 && n <= 4096, s"n must be in [1, 4096], got $n")
    val ms = rendezvousMultipliers(n).mkString("array(", "L, ", "L)")
    val best = s"""array_max(transform(sequence(0, ${n - 1}),
      s -> struct(${rendezvousWeightSql("doc_id", s"element_at($ms, s + 1)")} AS w, -s AS ns)))"""
    docs.select(col("doc_id"), expr(s"CAST(-(($best).ns) AS BIGINT)").as("shard"))
  }

  /** Overflow-free floored `alloc·10⁹ DIV avail` as three base-1000
    * long-division digits: the largest intermediate is `avail·1000`
    * (< 2⁶³ for any avail ≤ 9.2·10¹⁵ — ~100× the 10¹⁴-char corpus
    * the scaladoc sizes), where the direct `alloc · 10⁹` wraps in
    * Spark and raises in DuckDB past avail ≈ 9.2·10⁹. Exact:
    * standard long division, and all operands are non-negative
    * (alloc ≤ avail by the waterfill maximality argument) so floor
    * DIV and `%` agree across engines. `div` is the engine
    * spelling — `DIV` (Spark) / `//` (DuckDB) — one generated text
    * on both sides, no recipe drift.
    */
  def utilPpbSql(div: String): String =
    graft.engine.ExactMath.ppbSql("alloc", "avail", div)

  /** Deterministic global training order: every document gets an
    * exact global rank in content-hash order — the RNG-free "shuffle"
    * a reproducible training run consumes (same device as
    * [[deterministicSplit]]: the hash IS the permutation, identical
    * on any engine, any run, any partitioning).
    *
    * Scale shape — the point of this operator: a global
    * `row_number() OVER (ORDER BY h)` would funnel the corpus through
    * ONE window partition. Instead this is the standard two-pass
    * distributed ranking: the hash's first `hexChars` characters
    * range-partition rows into 16^hexChars buckets (hash uniformity
    * makes them balanced), each bucket ranks internally (parallel
    * windows), and a buckets-row offset table — the only global
    * state — broadcasts back to shift per-bucket ranks into the exact
    * global permutation. Ordering by (bucket, h, doc_id) equals
    * ordering by (h, doc_id) because the bucket IS h's prefix — which
    * also makes the permutation INVARIANT in the bucket width (a
    * wider prefix just splits ranges more finely; CorpusSpec pins
    * this), so the width is purely a parallelism knob.
    *
    * The width scales with corpus size instead of being fixed: a
    * hardcoded 256 buckets would mean ~400 GB per window task at
    * 100 TB — the funnel widened, not removed (the same
    * proportionality lesson as Dedup.annCells, where fixed IVF cell
    * counts turned ANN quadratic). `trainingOrder` sizes the prefix
    * from a row count so each bucket holds ≤ `targetBucketRows`
    * (floor 2 hex chars = 256 buckets, cap 5 = 1M — the offset table
    * stays a broadcast-able few MB even at the cap, which at the 4M
    * default target covers 4×10¹² rows); the count is one cheap
    * aggregate job over `docs`, so callers whose input is an
    * expensive unmaterialized plan should pass `rowHint` to skip it.
    */
  def trainingOrder(docs: DataFrame, targetBucketRows: Long = 4L << 20,
      rowHint: Option[Long] = None): DataFrame = {
    require(targetBucketRows >= 1, s"targetBucketRows must be positive, got $targetBucketRows")
    val n = rowHint.getOrElse(docs.count())
    trainingOrderWithPrefix(docs, hexPrefixFor(n, targetBucketRows))
  }

  /** Smallest hex-prefix width (2..5) whose 16^width buckets hold at
    * most `targetBucketRows` rows each for an `n`-row corpus.
    */
  private[pipeline] def hexPrefixFor(n: Long, targetBucketRows: Long): Int = {
    var p = 2
    while (p < 5 && n / (1L << (4 * p)) > targetBucketRows) p += 1
    p
  }

  /** [[trainingOrder]] at an explicit bucket width — the permutation
    * is width-invariant, so this is exposed (package-private) only
    * for the invariance spec and width experiments.
    */
  private[pipeline] def trainingOrderWithPrefix(docs: DataFrame, hexChars: Int): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8, s"hex prefix must be 1..8, got $hexChars")
    val keyed = docs
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .withColumn("bucket", conv(substring(col("h"), 1, hexChars), 16, 10).cast("long"))
    val w = Window.partitionBy("bucket").orderBy(col("h").asc, col("doc_id").asc)
    keyed
      .withColumn("rk", row_number().over(w))
      .join(broadcast(bucketOffsets(keyed, Seq.empty, lit(1L))), "bucket")
      .select(col("doc_id"), (col("b_off") + col("rk")).cast("long").as("global_rank"))
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
    * Scale shape: like [[packSequences]], the running sum is the
    * two-pass bucketed form, not one stratum-wide window (a
    * stratum-width funnel at 100 TB): per-stratum approximate QUALITY
    * quantiles range-partition rows into order-consistent buckets
    * along the quality-DESC sort (bucket = #boundaries strictly above
    * the row's quality, so equal qualities always share a bucket and
    * cross-bucket rows differ strictly — the total order is
    * preserved), NULL qualities land in a dedicated trailing bucket
    * (matching NULLS LAST), each (stratum, bucket) runs its window in
    * parallel, and a broadcast offset table shifts local sums into
    * the exact stratum-wide running totals. Caveat: a stratum where
    * one quality value dominates collapses into one bucket — quality
    * scores are near-continuous, so in practice boundaries split the
    * mass; the worst case degrades to the old single-window shape,
    * never below it. The budget filter stays a per-row predicate.
    *
    * `docs` supplies (doc_id, lang, source); `quality` supplies
    * (doc_id, n_tokens, quality) — [[graft.pipeline.TextAnalysis
    * .qualityScores]] shape, joined on doc_id so tokenization is
    * computed (or reused) once.
    */
  /** Corpus snapshot diff — the CDC report between two crawl/corpus
    * versions: per doc_id, `added` (new in v2), `removed` (gone from
    * v2), `changed` (same id, different content hash), or
    * `unchanged`. The number a pipeline watches between snapshot
    * ingests: an unexpected `changed`/`removed` spike means the
    * upstream crawler or id assignment broke, and the `added` set is
    * exactly the increment the downstream passes (dedup, quality,
    * packing) need to process — diff-then-process is how a 100 TB
    * corpus absorbs a new snapshot without recomputing the world.
    *
    * Scale shape: each side reduces to (doc_id, content md5) where
    * its rows sit, then ONE full-outer equi-join on doc_id (linear
    * shuffle; co-partitioned layouts make it exchange-free). Text
    * never travels — only 32-char hashes shuffle.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), md5(col("text")).as("h_old"))
    val b = v2.select(col("doc_id"), md5(col("text")).as("h_new"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  def tokenBudgetSelect(docs: DataFrame, quality: DataFrame, budget: Long,
      nBuckets: Int = 64): DataFrame = {
    val strata = Seq("lang", "source")
    // the docs x quality join is consumed three times below — spool
    // the narrow joined frame once (same rationale as packSequences)
    val joined = graft.engine.Scratch.checkpoint(
      docs.select(col("doc_id"), col("lang"), col("source"))
        .join(quality.select(col("doc_id"), col("n_tokens"), col("quality")), Seq("doc_id")),
      "budget-join")
    val keyed = withRangeBucket(joined, strata, col("quality"), nBuckets, descending = true)
    val wIn = Window.partitionBy(col("lang"), col("source"), col("bucket"))
      .orderBy(col("quality").desc_nulls_last, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .withColumn("cum_in", sum(col("n_tokens")).over(wIn))
      .join(broadcast(bucketOffsets(keyed, strata, col("n_tokens"))), strata :+ "bucket")
      .withColumn("cum_tokens", col("b_off") + col("cum_in"))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"), col("quality"),
        col("cum_tokens"))
  }

  /** Split-distribution drift: total variation distance between the
    * TRAIN and VAL length distributions over train-decile bins — the
    * monitor that catches a split whose content-hash assignment has
    * (or develops) a length skew, the same exact-integer TVD device
    * as [[mixDrift]] applied to LEARNED bins. Bin bounds are the
    * train side's exact-disc deciles (sketch-bracket, broadcast as
    * one row); a value equal to a bound lands in the upper bin; the
    * overall TVD is Σ|n_t·N_v − n_v·N_t| · 10⁹ DIV (2·N_t·N_v) —
    * all DECIMAL-routed integers, no float anywhere in the metric.
    * Output: one row per bin with both counts, both floored-ppb
    * shares, and the (repeated) overall `tvd_ppb`.
    *
    * Scale: the deterministic split is a per-row projection, the
    * decile pass is bounded-memory, the bin assignment is a 9-term
    * broadcast expression, and every aggregate has ≤ 10 groups.
    */
  def splitDrift(docs: DataFrame, nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 100, s"nBins must be 2..100, got $nBins")
    // the narrow (split, v) frame feeds the quantile machinery's
    // three passes plus the bin count — spool it once instead of
    // re-hashing the corpus per consumer (the tokenBudgetSelect
    // rationale; measured 5.1 s → 1.9 s at sf0.1)
    val s = graft.engine.Scratch.checkpoint(
      deterministicSplit(docs)
        .select(col("split"), col("n_chars").cast("double").as("v"))
        .filter(col("split").isin("train", "val")),
      "split-drift-base")
    val qs = (1 until nBins).map(_.toDouble / nBins)
    val bCols = qs.map(q => max(when(col("q") === q, col("value"))).as(s"b${math.round(q * nBins)}"))
    val bounds = graft.operators.Quantiles.exactDisc(
        s.filter(col("split") === "train").withColumn("__g", lit(0)),
        Seq("__g"), "v", qs)
      .groupBy("__g")
      .agg(bCols.head, bCols.tail: _*)
      .drop("__g")
    val binExpr = qs.indices.map(i => s"(CASE WHEN v >= b${i + 1} THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val counts = s.crossJoin(broadcast(bounds))
      .withColumn("bin", expr(binExpr).cast("long"))
      .groupBy("bin")
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"))
    val tot = counts.agg(sum("n_train").as("nt"), sum("n_val").as("nv"))
    counts.crossJoin(broadcast(tot))
      .withColumn("p_train_ppb", expr("(n_train * CAST(1000000000 AS BIGINT)) DIV nullif(nt, 0)"))
      .withColumn("p_val_ppb", expr("(n_val * CAST(1000000000 AS BIGINT)) DIV nullif(nv, 0)"))
      .withColumn("__d",
        expr("""abs(CAST(n_train AS DECIMAL(38,0)) * nv - CAST(n_val AS DECIMAL(38,0)) * nt)"""))
      .withColumn("tvd_ppb",
        expr("""CAST((sum(__d) OVER () * 1000000000)
                DIV (2 * CAST(nt AS DECIMAL(38,0)) * CAST(nv AS DECIMAL(38,0))) AS BIGINT)"""))
      .select(col("bin"), col("n_train"), col("n_val"),
        col("p_train_ppb"), col("p_val_ppb"), col("tvd_ppb"))
  }

  /** Winsorization report: global exact-disc p01/p99 of `n_chars`
    * (the outlier clamp every length-feature pipeline applies before
    * normalization), then per-language clip counts and the
    * decimal-routed mean of the CLIPPED lengths. The quantile pass is
    * the bounded-memory sketch-bracket ([[graft.operators.Quantiles
    * .exactDisc]] over a constant stratum — one global group is the
    * degenerate case its brackets handle in O(n/accuracy) memory);
    * the two bound values broadcast into a single clipping scan.
    */
  def winsorizeReport(docs: DataFrame): DataFrame = {
    val g = docs.select(col("lang"), col("n_chars").cast("double").as("v"))
      .withColumn("__g", lit(0))
    val bounds = graft.operators.Quantiles.exactDisc(g, Seq("__g"), "v", Seq(0.01, 0.99))
      .groupBy("__g")
      .agg(max(when(col("q") === 0.01, col("value"))).as("p01"),
        max(when(col("q") === 0.99, col("value"))).as("p99"))
    val clip = greatest(col("p01"), least(col("p99"), col("v")))
    g.crossJoin(broadcast(bounds.drop("__g")))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("v") < col("p01"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("v") > col("p99"), 1L).otherwise(0L)).as("n_clip_hi"),
        first(col("p01")).as("p01"), first(col("p99")).as("p99"),
        graft.queries.Num.davg(clip).as("mean_clipped"))
  }

  /** Deterministic weighted sampling WITHOUT RNG — Efraimidis-
    * Spirakis A-ES keys on a content-addressed uniform: u =
    * (md5-derived 32-bit integer + 1) / 2³²⁺¹ ∈ (0, 1], key =
    * u^(1000/n_chars), take the global top-`n` keys. Longer
    * documents draw larger keys in expectation ∝ weight, every
    * engine and every re-run draws the SAME sample (the
    * deterministicSplit property, extended to weighted draws), and
    * the selection is a distributed TakeOrdered top-k — partial
    * heaps per partition, no global sort, no window.
    */
  def weightedSample(docs: DataFrame, n: Int = 50): DataFrame =
    docs
      .withColumn("__u",
        (expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
          + lit(1L)).cast("double") / lit(4294967297.0))
      .withColumn("skey", pow(col("__u"), lit(1000.0) / col("n_chars")))
      .orderBy(col("skey").desc, col("doc_id").asc)
      .limit(n)
      .select(col("doc_id"), col("lang"), col("n_chars"), round(col("skey"), 6).as("skey"))

  // ------------------------------------------------------------ DSIR

  /** DSIR — Data Selection via Importance Resampling (Xie et al.
    * 2023, arXiv:2302.03169): score every raw document by how much
    * more likely its hashed-n-gram features are under a TARGET
    * distribution than under the raw distribution, log w(x) =
    * Σ_b c_b(x)·(log p_b − log q_b) with add-1-smoothed bucket
    * unigram models — the method behind targeted pretraining-data
    * selection (e.g. "make CommonCrawl look like Wikipedia").
    *
    * Engine-exact by the BM25 device: the ONLY transcendental (the
    * per-bucket log-ratio) is computed once DRIVER-side over the
    * (≤ nBuckets)-row global distributions and rides into both
    * engines as integer micro-units; per-document scores are then
    * exact integer sums, and the keep decision (score > 0 ⇔ more
    * target-like than raw) is an integer comparison. The bucket hash
    * is the house cross-engine md5 device (`conv(substring(md5(w),
    * 1, 6), 16, 10) % nBuckets` ≡ DuckDB `CAST('0x' || substr(md5(w),
    * 1, 6) AS BIGINT) % nBuckets`).
    *
    * Scale shape: ONE global (bucket)-keyed aggregate builds both
    * distributions in the same pass (nBuckets rows — driver-safe at
    * any corpus size); scoring is a per-token broadcast join against
    * the nBuckets-row weight table followed by one doc-keyed sum with
    * map-side combine — a single shuffle on doc_id, nothing else.
    * Returns (scored frame, the bucket→micro-weight table) so the
    * oracle can replay the relational part from the exported weights.
    */
  def dsirScores(docs: DataFrame, targetLang: String = "en", nBuckets: Int = 256)
      : (DataFrame, Seq[(Long, Long)]) = {
    // one compact (doc, lang, bucket, c) aggregate feeds BOTH the
    // global distributions (collected) and the scoring join — the
    // tokenize+hash pass is recomputed once per ACTION (the
    // distribution collect now, the caller's materialization later),
    // deliberately: no persisted block to leak, the kCenter
    // statelessness argument
    val c = docs
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      .withColumn("bucket",
        expr(s"CAST(conv(substring(md5(w), 1, 6), 16, 10) AS BIGINT) % $nBuckets"))
      .groupBy(col("doc_id"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val dist = c.groupBy("bucket")
      .agg(sum(when(col("lang") === targetLang, col("c")).otherwise(0L)).as("t"),
        sum(col("c")).as("r"))
      .collect()
      .map(row => row.getLong(0) -> (row.getLong(1), row.getLong(2))).toMap
    val bigT = dist.valuesIterator.map(_._1).sum
    val bigR = dist.valuesIterator.map(_._2).sum
    val weights: Seq[(Long, Long)] = (0L until nBuckets.toLong).map { bk =>
      val (t, r) = dist.getOrElse(bk, (0L, 0L))
      val lr = math.log((t + 1).toDouble / (bigT + nBuckets)) -
        math.log((r + 1).toDouble / (bigR + nBuckets))
      bk -> math.round(lr * 1e6)
    }
    val wdf = docs.sparkSession.createDataFrame(weights).toDF("bucket", "lmicro")
    val out = c.join(broadcast(wdf), Seq("bucket"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c") * col("lmicro")).as("score_micro"))
      .select(col("doc_id"), col("lang"), col("score_micro"),
        when(col("score_micro") > 0L, 1L).otherwise(0L).as("keep"))
    (out, weights)
  }
}
