package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Funnel
import graft.pipeline.{Corpus, Dedup, TextAnalysis}
import Tables.t

/** Second batch of training-pipeline + event-analytics queries:
  * retrieval scoring (BM25), temperature mixture sampling,
  * quality-aware dedup survivor election, and sequence-funnel
  * conversion — each with a full DuckDB oracle.
  */
object Pipeline2 {

  private def docs(s: SparkSession, dir: String) = Tables.docs(s, dir)

  /** view → click → purchase conversion funnel over the events table
    * ([[Funnel]]): one keyed aggregation + per-user fold, no
    * self-joins — the oracle replays it as the cascaded min-ts
    * formulation, proving the fold ≡ the relational semantics.
    */
  def funnel(s: SparkSession, dir: String): DataFrame =
    Funnel.report(Relational.events(s, dir), Seq("view", "click", "purchase"))
      .orderBy("stage")

  /** α = 0.5 temperature-flattened language mix
    * ([[Corpus.temperatureSample]]) — the midpoint between
    * [[Pipeline.mixBalance]] (α = 0) and keeping everything (α = 1).
    */
  def mixTemperature(s: SparkSession, dir: String): DataFrame =
    Corpus.temperatureSample(docs(s, dir)).orderBy("doc_id")

  /** Max-min fair character-budget allocation across languages
    * ([[Corpus.waterfillBudget]]): half the corpus' characters,
    * waterfilled — small languages keep everything, big ones split
    * the rest evenly. Exact integers end to end.
    */
  def mixWaterfill(s: SparkSession, dir: String): DataFrame =
    Corpus.waterfillBudget(docs(s, dir))

  /** Rendezvous shard routing ([[Corpus.rendezvousShard]]) at n=8
    * beside n=9: `moved` marks documents the shard-add relocates and
    * `law_ok` asserts HRW's exact stability law — every mover lands
    * on the NEW shard — relationally in both engines.
    */
  def shardRendezvous(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"))
    Corpus.rendezvousShard(d, 8).withColumnRenamed("shard", "shard8")
      .join(Corpus.rendezvousShard(d, 9).withColumnRenamed("shard", "shard9"), "doc_id")
      .select(col("doc_id"), col("shard8"), col("shard9"),
        (col("shard8") =!= col("shard9")).as("moved"),
        (col("shard8") === col("shard9") || col("shard9") === 8L).as("law_ok"))
      .orderBy("doc_id")
  }

  private val ShardRendezvousOracleSql = {
    def assign(n: Int, alias: String) = {
      val vals = Corpus.rendezvousMultipliers(n).zipWithIndex
        .map { case (m, s) => s"($s, $m)" }.mkString(", ")
      s"""$alias AS (SELECT doc_id, s AS shard FROM (
           SELECT d.doc_id, t.s,
             row_number() OVER (PARTITION BY d.doc_id
               ORDER BY ${Corpus.rendezvousWeightSql("d.doc_id", "CAST(t.m AS BIGINT)")} DESC,
                 t.s ASC) AS rn
           FROM documents d CROSS JOIN (VALUES $vals) t(s, m)) WHERE rn = 1)"""
    }
    s"""WITH ${assign(8, "a8")}, ${assign(9, "a9")}
      SELECT a8.doc_id AS doc_id, CAST(a8.shard AS BIGINT) AS shard8,
        CAST(a9.shard AS BIGINT) AS shard9,
        a8.shard <> a9.shard AS moved,
        (a8.shard = a9.shard OR a9.shard = 8) AS law_ok
      FROM a8 JOIN a9 ON a9.doc_id = a8.doc_id
      ORDER BY doc_id"""
  }

  /** Token-budget-capped selection ([[Corpus.tokenBudgetSelect]]):
    * each (lang, source) stratum keeps its best-quality documents up
    * to a 400-token running total. Quality comes from the shared
    * definition ([[TextAnalysis.qualityScores]] ≡ the oracle's
    * [[Pipeline.QualityCtes]]), so the kept SET — not just its size
    * — hash-compares against DuckDB's replay of the same ranked
    * prefix.
    */
  def tokenBudget(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Corpus.tokenBudgetSelect(d, TextAnalysis.qualityScores(d), 400L)
      .orderBy("doc_id")
  }

  /** Quality-aware survivor election over near-dup clusters
    * ([[Dedup.keepBest]]): clusters from the graded LSH + verify +
    * connected-components path, survivor = highest
    * [[TextAnalysis.qualityScores]] (ties → min id).
    */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val (_, labels) = Pipeline.clusterArtifact(s, dir)
    Dedup.keepBest(labels, TextAnalysis.qualityScores(d))
      .orderBy("doc_id")
  }

  /** Cluster-capped selection ([[Dedup.clusterCap]]): at most
    * [[Dedup.ClusterCapK]] survivors per near-dup family by
    * (quality desc, id asc), singletons always kept — the middle
    * policy between keep-best and no dedup.
    */
  def dedupClusterCap(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val (_, labels) = Pipeline.clusterArtifact(s, dir)
    Dedup.clusterCap(d.select(col("doc_id")), labels, TextAnalysis.qualityScores(d))
      .orderBy("doc_id")
  }

  /** Leakage-safe cluster-aware split ([[Corpus.leakageSafeSplit]]):
    * train/val/test assignment hashed on the near-dup cluster
    * representative (same LSH + connected-components labels as
    * q_dedup_clusters), so near-duplicates never straddle train and
    * eval. Un-clustered docs hash their own id — identical to
    * q_split_stratified's assignment on the corpus majority.
    */
  def splitLeakageSafe(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val (_, labels) = Pipeline.clusterArtifact(s, dir)
    Corpus.leakageSafeSplit(d, labels)
      .select(col("doc_id"), col("rep_id"), col("split"))
      .orderBy("doc_id")
  }

  /** Split-contamination audit: over the verified near-dup pair set,
    * count pairs whose endpoints land in DIFFERENT splits under (a)
    * the plain per-doc hash split and (b) the cluster-aware
    * leakage-safe split. (b) is zero by construction — the audit is
    * the measurable proof, and the shape a pipeline would run
    * continuously as a data-quality gate.
    *
    * Scale shape: two broadcast-sized joins of the pair set against
    * the assignment projection (pairs are a tiny fraction of the
    * corpus) and a two-row aggregate — nothing scans the corpus
    * twice, and the pair set is the already-computed dedup artifact.
    */
  def splitContamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val (pairs, labels) = Pipeline.clusterArtifact(s, dir)
    def audit(assign: DataFrame, method: String): DataFrame = {
      val a = assign.select(col("doc_id").as("id_a"), col("split").as("split_a"))
      val b = assign.select(col("doc_id").as("id_b"), col("split").as("split_b"))
      pairs.join(a, "id_a").join(b, "id_b")
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L)), lit(0L))
            .as("cross_pairs"))
        .select(lit(method).as("method"), col("n_pairs"), col("cross_pairs"))
    }
    audit(Corpus.deterministicSplit(d), "doc_hash")
      .unionByName(audit(Corpus.leakageSafeSplit(d, labels), "cluster_hash"))
      .orderBy("method")
  }

  /** Source-mix drift monitor ([[Corpus.mixDrift]]): per-language TVD
    * against the corpus-wide source distribution, exact-integer
    * assembled (no libm) with one final IEEE division.
    */
  def mixDrift(s: SparkSession, dir: String): DataFrame =
    Corpus.mixDrift(docs(s, dir)).orderBy("lang")

  private val mixSpools = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Four-batch (doc_id, lang, source) replay spool for the streaming
    * mix monitor: batch i = docs with doc_id % 4 == i, each file
    * doc_id-sorted with ascending mtimes so the replay order is
    * deterministic. Every document appears exactly once across the
    * batches, so the cumulative stream state equals the batch table.
    */
  private def mixSpool(s: SparkSession, dir: String): String =
    mixSpools.computeIfAbsent(dir, { d =>
      val t = java.nio.file.Files.createTempDirectory("graft-mixstream")
      sys.addShutdownHook { def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); () }; rm(t.toFile) }
      val base = docs(s, d).select(col("doc_id"), col("lang"), col("source"))
      val t0 = System.currentTimeMillis() - 3600_000L
      (0 until 4).foreach { i =>
        val tdir = java.nio.file.Files.createTempDirectory("graft-mixpart")
        base.filter(col("doc_id") % 4 === i).coalesce(1).sortWithinPartitions("doc_id")
          .write.mode("overwrite").parquet(tdir.toString)
        val part = tdir.toFile.listFiles.find(_.getName.startsWith("part-")).get
        val dst = t.resolve(f"$i%d-docs.parquet").toFile
        java.nio.file.Files.move(part.toPath, dst.toPath)
        def rm(f: java.io.File): Unit = { Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); () }
        rm(tdir.toFile)
        dst.setLastModified(t0 + i * 10_000L)
      }
      t.toString
    })

  /** Streaming source-mix drift monitor: the continuous form of
    * [[Corpus.mixDrift]]. The documents table replays as four
    * micro-batches; the streaming state is the Complete-mode
    * (lang, source) count aggregate — dimension-sized however large
    * the corpus, the state a production monitor would checkpoint —
    * and the TVD alarm number derives from that state through the
    * SHARED [[Corpus.mixDriftFromCounts]] arithmetic. Because the
    * derivation is the same code and the cumulative counts provably
    * equal the batch counts (each doc arrives exactly once), the
    * streamed monitor shares q_mix_drift's oracle VERBATIM — the
    * graded proof the drift alarm survives the move from batch audit
    * to continuous ingestion.
    */
  def streamMixDrift(s: SparkSession, dir: String): DataFrame = {
    val tmp = mixSpool(s, dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType)))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp)
    val name = "graft_stream_mix"
    s.catalog.dropTempView(name)
    val q = Pipeline.startWithStateConfs(s, 2) {
      stream.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("cnt_ls"))
        .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
        .format("memory").queryName(name).start()
    }
    try q.processAllAvailable() finally q.stop()
    // spool the final state off the memory sink: the MemoryPlan view
    // keeps ONE set of attribute ids, so the derivation's self-joins
    // (lang totals × source totals × grid) would hit conflicting-
    // reference resolution; the parquet re-read is a clean scan of a
    // dimension-sized table (graft.engine.Scratch house pattern)
    val cnts = graft.engine.Scratch.checkpoint(s.table(name), "mix-state")
    val total = cnts.agg(sum(col("cnt_ls"))).head.getLong(0)
    Corpus.mixDriftFromCounts(cnts, total).orderBy("lang")
  }

  /** Winnowing fingerprints ([[TextAnalysis.winnowFingerprints]]):
    * per-document MOSS-scheme sparse fingerprint set, reported as
    * count + checksum so the SET (not just its size) hash-compares.
    */
  def textWinnow(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowFingerprints(docs(s, dir)).orderBy("doc_id")

  /** Normalized exact dedup ([[Dedup.normalizedDedup]]): the C4-style
    * case/punctuation/whitespace-insensitive exact pass.
    */
  def dedupNormalized(s: SparkSession, dir: String): DataFrame =
    Dedup.normalizedDedup(docs(s, dir)).orderBy("doc_id")

  /** Corpus snapshot diff in the graded path
    * ([[Corpus.snapshotDiff]]): v2 is derived deterministically from
    * the fixture — every 20th doc dropped (`removed`), every
    * (10k+5)th doc's text revised (`changed`), every 15th doc
    * re-added under a max+1-offset id (`added`, the echo-wave id
    * device) — so both engines build the identical pair of snapshots
    * and the diff statuses hash-compare row for row. The max-id
    * offset is a one-row driver scalar (the [[Pipeline]] echoWave
    * precedent); the oracle recomputes it as a scalar subquery.
    */
  def corpusDiff(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val mx = d.agg(max(col("doc_id"))).head
    val off = (if (mx.isNullAt(0)) 0L else mx.getLong(0)) + 1L
    val v2 = d.filter(col("doc_id") % 20 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 5, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .unionAll(d.filter(col("doc_id") % 15 === 0)
        .select((col("doc_id") + off).as("doc_id"), col("text")))
    Corpus.snapshotDiff(d, v2).orderBy("doc_id")
  }

  /** Gopher-style rule gate ([[TextAnalysis.gopherRules]]): per-rule
    * booleans + overall keep, the auditable form of the drop rules.
    */
  def textGopher(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRules(docs(s, dir)).orderBy("doc_id")

  /** CCNet-style per-language perplexity terciles
    * ([[TextAnalysis.perplexityBuckets]]): head / middle / tail by
    * exact rank over the unigram LM score, keep = not tail.
    */
  def textPplBuckets(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.perplexityBuckets(docs(s, dir)).orderBy("doc_id")

  /** Shared oracle fragment: the winnowing selection — k=3-gram
    * hashes (shared hex→int recipe), value-min over the w=4 window,
    * partial pos-0 window for sub-w docs → `f(doc_id, n_grams,
    * minh)`. The ONE definition used by q_text_winnow and
    * q_dedup_span, so the fingerprint recipe can never desynchronize
    * between the rollup and the match stage.
    */
  /** Shared relational replay of [[TextAnalysis.gopherRules]] —
    * consumed by the q_text_gopher oracle here and the
    * q_quality_calibration oracle ([[Pipeline3]]), so the rule-gate
    * recipe cannot drift between them. Exposes CTE `gk` with the
    * per-rule signals and the overall `gkeep` boolean (named to
    * avoid colliding with other oracles' `keep`).
    */
  private[queries] val GopherCtes: String = """
      gt AS (SELECT doc_id, lang, text, string_split(lower(text), ' ') AS tk FROM documents),
      gs AS (SELECT doc_id, lang,
              CAST(len(tk) AS BIGINT) AS n_words,
              round(length(replace(text, ' ', '')) / CAST(len(tk) AS DOUBLE), 4) AS mean_word_len,
              CASE WHEN len(tk) >= 3
                   THEN round(1.0 - len(list_distinct(list_transform(range(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])))
                        / CAST(len(tk) - 2 AS DOUBLE), 4)
                   ELSE 0.0 END AS dup3,
              CAST(len(list_intersect(tk, ['the','and','of','to','a','in','is','it'])) AS BIGINT)
                AS stop_hits
            FROM gt),
      gk AS (SELECT gs.*,
              ((n_words >= 30 AND n_words <= 1000)
                AND (mean_word_len >= 3.0 AND mean_word_len <= 5.0)
                AND dup3 <= 0.05 AND stop_hits >= 1) AS gkeep
            FROM gs)"""

  private[queries] val WinnowCtes: String = """
      t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            WHERE len(string_split(text, ' ')) >= 3),
      g AS (SELECT doc_id, toks, UNNEST(range(0, len(toks) - 2)) AS pos FROM t),
      h AS (SELECT doc_id, pos,
              CAST('0x' || substr(md5(array_to_string(toks[pos + 1 : pos + 3], ' ')), 1, 12)
                AS BIGINT) AS h
            FROM g),
      w AS (SELECT doc_id, pos, h,
              min(h) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS minh,
              count(*) OVER (PARTITION BY doc_id) AS n_grams
            FROM h),
      f AS (SELECT doc_id, n_grams, minh FROM w
            WHERE pos <= greatest(n_grams - 4, 0))"""

  /** The MOSS match stage ([[TextAnalysis.winnowMatches]]): span-level
    * near-dup candidate pairs from shared winnow fingerprints, with
    * the hot-fingerprint df cap.
    */
  def dedupSpan(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowMatches(docs(s, dir)).orderBy("id_a", "id_b")

  /** Compute-once artifact reuse, graded: every downstream product of
    * the near-dup cluster job — survivor election, leakage-safe
    * split, contamination audit — derived from the ONE stored
    * pairs+labels artifact ([[Pipeline.clusterArtifact]]), summarized
    * as (product, metric, value) rows and graded against the same
    * shared oracle fragments the self-contained queries use. This is
    * the production shape: the LSH + verify + CC job runs once, its
    * output is a table, and everything else is cheap derivation —
    * the query proves the derive-from-storage path is value-identical
    * to recomputing.
    */
  def dedupArtifactReuse(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val (pairs, labels) = Pipeline.clusterArtifact(s, dir)
    val kept = Dedup.keepBest(labels, TextAnalysis.qualityScores(d))
    val split = Corpus.leakageSafeSplit(d, labels)
    val keepRows = kept.agg(
      count(lit(1)).as("n_labeled"),
      coalesce(sum(when(col("is_kept"), 1L).otherwise(0L)), lit(0L)).as("n_kept"))
      .select(explode(map(
        lit("n_labeled"), col("n_labeled"),
        lit("n_kept"), col("n_kept"))).as(Seq("metric", "value")))
      .select(lit("keep_best").as("product"), col("metric"), col("value"))
    val splitRows = split.groupBy(col("split").as("metric"))
      .agg(count(lit(1)).as("value"))
      .select(lit("split").as("product"), col("metric"), col("value"))
    val a = split.select(col("doc_id").as("id_a"), col("split").as("split_a"))
    val b = split.select(col("doc_id").as("id_b"), col("split").as("split_b"))
    val contamRows = pairs.join(a, "id_a").join(b, "id_b")
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L)), lit(0L))
          .as("cross_pairs"))
      .select(explode(map(
        lit("n_pairs"), col("n_pairs"),
        lit("cross_pairs"), col("cross_pairs"))).as(Seq("metric", "value")))
      .select(lit("contamination").as("product"), col("metric"), col("value"))
    keepRows.unionByName(splitRows).unionByName(contamRows)
      .orderBy("product", "metric")
  }

  /** Global training order ([[Corpus.trainingOrder]]): exact global
    * content-hash ranks via two-pass distributed ranking (per-bucket
    * windows + broadcast offsets), never a single-partition window.
    * Oracle: DuckDB's direct global row_number — the two must agree
    * rank-for-rank.
    */
  def trainOrder(s: SparkSession, dir: String): DataFrame =
    Corpus.trainingOrder(docs(s, dir)).orderBy("doc_id")

  /** BM25 constants of the last [[textBm25]] run — (term, idf) pairs
    * and the corpus average document length — exported so [[oracle]]
    * can inline the SAME idf doubles into the DuckDB SQL instead of
    * trusting two libms to agree on `ln` (the
    * [[Pipeline]] "oracle side-channel contract" applies: impure by
    * contract, read after the query ran, single-threaded harness).
    */
  private val lastBm25 = new java.util.concurrent.atomic.AtomicReference[
    Option[(Seq[(String, Double)], Double)]](None)

  /** BM25 scoring against the corpus's top-3 document-frequency
    * terms ([[TextAnalysis.bm25Scores]]). Term selection and idf are
    * derived from two tiny aggregates (driver-side: a handful of
    * rows); scoring itself is a zero-shuffle per-row projection.
    */
  def textBm25(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val stats = d.agg(count(lit(1)).as("n"), sum(size(split(col("text"), " "))).as("tot")).head()
    val n = stats.getLong(0)
    if (n == 0) { // empty corpus: no terms, empty result, no NULL-sum NPE
      lastBm25.set(Some((Seq.empty, 1.0)))
      return TextAnalysis.bm25Scores(d, Seq.empty, 1.0)
    }
    val avgdl = stats.getLong(1).toDouble / n
    val termIdf = TextAnalysis.topDfTerms(d, 3).collect().toSeq.map { r =>
      val df = r.getLong(1)
      // Lucene-shaped idf, rounded to 6dp so the literal is compact;
      // BigDecimal keeps the rounding engine-independent
      val idf = BigDecimal(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r.getString(0), idf)
    }
    lastBm25.set(Some((termIdf, avgdl)))
    TextAnalysis.bm25Scores(d, termIdf, avgdl).orderBy("doc_id")
  }

  /** Day-grain cohort retention over events: cohort = day of a
    * user's first event; for each (cohort, day offset) the count of
    * distinct users active that day — the standard retention matrix.
    * Shuffle shape: a keyed min per user, a distinct projection, one
    * user-keyed join, one keyed count-distinct — all linear, no
    * windows, no self-join per offset column.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame =
    cohortRetentionOn(Relational.events(s, dir))

  /** The aggregation behind [[cohortRetention]], over any (`user_id`,
    * `ts`) frame — the spec drives it with crafted events.
    */
  def cohortRetentionOn(ev: DataFrame): DataFrame = {
    val cohorts = ev.groupBy(col("user_id"))
      .agg(to_date(date_trunc("DAY", min(col("ts")))).as("cohort_day"))
    val active = ev
      .select(col("user_id"), to_date(date_trunc("DAY", col("ts"))).as("d"))
      .distinct()
    // plain count, not countDistinct: `active` is distinct on
    // (user_id, day) and a user's (cohort_day, day_offset) determine
    // their day, so each group already holds one row per user — a
    // distinct aggregate would just add an expand pass
    active.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Overlapping token-window chunking ([[TextAnalysis.chunkTokens]])
    * — documents cut into 50-token windows every 40 tokens, chunk
    * content carried as an md5 hash.
    */
  def textChunks(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkTokens(docs(s, dir), 50, 40).orderBy("doc_id", "chunk_idx")

  /** Streaming funnel attribution ([[graft.streaming.FunnelStream]]):
    * per-user stage state updated over the ts-ordered event replay
    * (the sessionize spool; its far-future sentinel rows fall to the
    * step filter), final stages aggregated through the SAME report
    * code as the batch operator — and graded against the SAME oracle
    * SQL as q_funnel, the proof that funnel semantics survive the
    * move to continuous ingestion. Stage is monotone non-decreasing,
    * so max-per-user over the Update-mode emissions is the final
    * state.
    */
  def streamFunnel(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{EventStream, FunnelStream}
    val steps = Seq("view", "click", "purchase")
    val tmp = Pipeline.sessionSpool(s, dir, 30)
    val stream = s.readStream
      .schema(EventStream.EventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(tmp)
    val name = "graft_stream_funnel"
    s.catalog.dropTempView(name)
    val q = Pipeline.startWithStateConfs(s, 2) {
      FunnelStream.userStageUpdates(s, stream, steps)
        .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
        .format("memory").queryName(name).start()
    }
    try { q.processAllAvailable() } finally { q.stop() }
    graft.operators.Funnel.reportFromStages(
      s.table(name).groupBy(col("user_id")).agg(max(col("stage")).as("stage")), steps)
      .orderBy("stage")
  }

  /** Batch gap-sessionization ([[graft.operators.Sessionize]]) —
    * shares q_stream_sessionize's oracle: the relational window
    * composition and the streaming state machine are two execution
    * forms of one definition.
    */
  def sessionizeBatch(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize.sessions(Relational.events(s, dir), 30)
      .orderBy("user_id", "start_us")

  /** Deterministic contrastive negatives
    * ([[Corpus.negativeSamples]]): 3 hash-drawn negatives per anchor.
    */
  def negativeSamples(s: SparkSession, dir: String): DataFrame =
    Corpus.negativeSamples(docs(s, dir), 3).orderBy("doc_id", "j")

  /** Multimodal resize tier ([[graft.pipeline.Multimodal.resizePayload]]):
    * stubbed nearest-neighbor byte downsampling over the binary
    * payload, graded via size + byte-sum checksum. The oracle can
    * only replay bytes as character codes for single-byte text, so
    * BOTH sides restrict to ASCII docs with the same
    * byte-length-equals-char-length predicate — on today's all-ASCII
    * fixture that keeps every row, and a future non-ASCII doc is
    * excluded consistently instead of silently diverging the hash.
    */
  def mmResize(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Multimodal
    val ascii = docs(s, dir).filter(octet_length(col("text")) === length(col("text")))
    Multimodal.resizePayload(s, Multimodal.withBinaryPayload(ascii), 4)
      .orderBy("doc_id")
  }

  /** Asymmetric containment dedup ([[Dedup.containmentPairs]]): the
    * doc-inside-doc detector symmetric Jaccard misses.
    */
  def dedupContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(docs(s, dir), 4, 0.5).orderBy("id_small", "id_big")

  /** Paragraph/segment keep-first dedup ([[Dedup.paragraphDedup]]) —
    * the C4-style boilerplate pass at 20-word segment grain. The
    * fixture corpus has no planted cross-doc duplicates, so the
    * query unions in the standard echo wave (every 20th doc
    * re-submitted under max(doc_id)+1+id, the q_stream_dedup rule):
    * echoed docs dedup to nothing, and the corpus's own repeated
    * short TAIL segments (57 docs at sf0.01) exercise the partial
    * drops. The oracle derives the identical union and replays the
    * keep-first rule as a window rank.
    */
  def dedupParagraph(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"))
    val mx = base.agg(max(col("doc_id"))).head
    val off = (if (mx.isNullAt(0)) 0L else mx.getLong(0)) + 1L
    val withEcho = base.unionAll(
      base.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + off).as("doc_id"), col("text")))
    Dedup.paragraphDedup(withEcho, 20).orderBy("doc_id")
  }

  private val DedupParagraphOracleSql = """
      WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id, text
        FROM documents WHERE doc_id % 20 = 0),
      words AS (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs),
      segs AS (
        SELECT doc_id, unnest(range(0, (len(w) + 19) // 20)) AS seg_idx, w
        FROM words),
      seg2 AS (
        SELECT doc_id, seg_idx,
               array_to_string(w[(seg_idx * 20 + 1):(seg_idx * 20 + 20)], ' ') AS seg
        FROM segs),
      ranked AS (
        SELECT doc_id, seg_idx, seg,
               row_number() OVER (PARTITION BY md5(seg) ORDER BY doc_id, seg_idx) AS rn
        FROM seg2)
      SELECT doc_id, count(*) AS n_segs,
             count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
             md5(coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_idx), '')) AS kept_hash
      FROM ranked GROUP BY doc_id ORDER BY doc_id"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_paragraph" -> (dedupParagraph _),
    "q_dedup_containment" -> (dedupContainment _),
    "q_mm_resize" -> (mmResize _),
    "q_negative_samples" -> (negativeSamples _),
    "q_sessionize_batch" -> (sessionizeBatch _),
    "q_funnel" -> (funnel _),
    "q_mix_temperature" -> (mixTemperature _),
    "q_mix_waterfill" -> (mixWaterfill _),
    "q_shard_rendezvous" -> (shardRendezvous _),
    "q_token_budget" -> (tokenBudget _),
    "q_dedup_keep_best" -> (dedupKeepBest _),
    "q_select_cluster_cap" -> (dedupClusterCap _),
    "q_split_leakage_safe" -> (splitLeakageSafe _),
    "q_split_contamination" -> (splitContamination _),
    "q_mix_drift" -> (mixDrift _),
    "q_stream_mix_drift" -> (streamMixDrift _),
    "q_text_winnow" -> (textWinnow _),
    "q_dedup_normalized" -> (dedupNormalized _),
    "q_corpus_diff" -> (corpusDiff _),
    "q_text_gopher" -> (textGopher _),
    "q_text_ppl_buckets" -> (textPplBuckets _),
    "q_dedup_span" -> (dedupSpan _),
    "q_train_order" -> (trainOrder _),
    "q_dedup_artifact_reuse" -> (dedupArtifactReuse _),
    "q_text_bm25" -> (textBm25 _),
    "q_cohort_retention" -> (cohortRetention _),
    "q_text_chunks" -> (textChunks _),
    "q_stream_funnel" -> (streamFunnel _))

  /** One oracle for both mix-drift forms: the batch audit
    * (q_mix_drift) and the streaming monitor (q_stream_mix_drift)
    * must both equal this exact-integer TVD formulation.
    */
  private val MixDriftOracleSql = """
      WITH ls AS (SELECT lang, source, count(*) AS cnt_ls FROM documents GROUP BY lang, source),
      s AS (SELECT source, count(*) AS cnt_s FROM documents GROUP BY source),
      lt AS (SELECT lang, sum(cnt_ls) AS lang_tot FROM ls GROUP BY lang),
      tot AS (SELECT count(*) AS total FROM documents),
      grid AS (SELECT lt.lang, lt.lang_tot, s.source, s.cnt_s,
                      COALESCE(ls.cnt_ls, 0) AS cnt_ls
               FROM lt CROSS JOIN s
               LEFT JOIN ls ON ls.lang = lt.lang AND ls.source = s.source),
      n AS (SELECT g.lang, g.lang_tot,
              sum(abs(CAST(g.cnt_ls AS DECIMAL(38,0)) * t.total
                    - CAST(g.cnt_s AS DECIMAL(38,0)) * g.lang_tot)) AS num
            FROM grid g CROSS JOIN tot t GROUP BY g.lang, g.lang_tot)
      SELECT n.lang, CAST(n.lang_tot AS BIGINT) AS n_docs,
             round(CAST(n.num AS DOUBLE)
               / (2.0 * CAST(n.lang_tot AS DOUBLE) * CAST(t.total AS DOUBLE)), 6) AS tvd
      FROM n CROSS JOIN tot t ORDER BY n.lang"""

  /** One oracle for both funnel forms: the batch fold (q_funnel) and
    * the streaming keyed-state fold (q_stream_funnel) must both equal
    * this cascaded earliest-match relational formulation.
    */
  private val funnelOracleSql = """
      WITH fv AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
      fc AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
             JOIN fv ON e.user_id = fv.user_id
             WHERE e.event_type = 'click' AND e.ts >= fv.t1 GROUP BY e.user_id),
      fp AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
             JOIN fc ON e.user_id = fc.user_id
             WHERE e.event_type = 'purchase' AND e.ts >= fc.t2 GROUP BY e.user_id)
      SELECT stage, step, n_users FROM (
        SELECT 1 AS stage, 'view' AS step, count(*) AS n_users FROM fv
        UNION ALL SELECT 2, 'click', count(*) FROM fc
        UNION ALL SELECT 3, 'purchase', count(*) FROM fp)
      ORDER BY stage"""

  /** BM25 oracle, assembled from the side-channel constants: tf/dl
    * replay in DuckDB SQL; idf and avgdl are the query's own literals
    * (see [[lastBm25]]), written in the exact operation order of
    * [[TextAnalysis.bm25Scores]] so every IEEE double matches bitwise.
    */
  private def bm25Oracle: Map[String, String] = lastBm25.get() match {
    case None => Map.empty
    case Some((termIdf, _)) if termIdf.isEmpty =>
      // term-free run (empty corpus): the mkStrings below would emit
      // syntactically invalid SQL; grade empty-vs-empty instead
      Map("q_text_bm25" -> """
        SELECT doc_id, CAST(0 AS BIGINT) AS n_hits, CAST(0.0 AS DOUBLE) AS bm25
        FROM documents WHERE FALSE ORDER BY doc_id""")
    case Some((termIdf, avgdl)) =>
      val tfs = termIdf.zipWithIndex.map { case ((t, _), i) =>
        s"CAST(len(list_filter(w, x -> x = '${t.replace("'", "''")}')) AS DOUBLE) AS tf${i + 1}"
      }.mkString(",\n          ")
      // avgdl prints with up to 17 significant digits; DuckDB would
      // parse a bare numeric literal of that width as DECIMAL and
      // convert with two roundings (int128 → double, then scale) — a
      // last-ulp risk vs Spark's correctly-rounded Scala parse. A
      // string → DOUBLE cast is a single correctly-rounded strtod,
      // bit-identical to lit(avgdl). The 6dp idf literals are exact
      // through one division and stay plain.
      val avgdlSql = s"CAST('$avgdl' AS DOUBLE)"
      val contribs = termIdf.zipWithIndex.map { case ((_, idf), i) =>
        s"$idf * ((tf${i + 1} * 2.2) / (tf${i + 1} + 1.2 * (0.25 + 0.75 * (dl / $avgdlSql))))"
      }.mkString(" + ")
      val hits = termIdf.indices.map(i => s"CAST(tf${i + 1} > 0 AS BIGINT)").mkString(" + ")
      val any = termIdf.indices.map(i => s"tf${i + 1} > 0").mkString(" OR ")
      Map("q_text_bm25" -> s"""
        WITH b AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        s AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
          $tfs
          FROM b)
        SELECT doc_id, $hits AS n_hits, round($contribs, 4) AS bm25
        FROM s WHERE $any ORDER BY doc_id""")
  }

  def oracle: Map[String, String] = bm25Oracle ++
    // shared-oracle pairs: each streaming/batch twin must equal the
    // one relational definition
    Map("q_stream_funnel" -> funnelOracleSql,
        "q_sessionize_batch" -> Pipeline.SessionizeOracleSql) ++ Map(
    "q_dedup_paragraph" -> DedupParagraphOracleSql,
    // cascaded earliest-match formulation — equivalent to the Spark
    // fold's greedy state machine under >= timestamp semantics
    "q_funnel" -> funnelOracleSql,

    // ceil(sqrt(cnt * mn)) — geometric mean of own size and the
    // smallest language's; sqrt is IEEE-exact on both engines
    "q_mix_temperature" -> """
      WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
      m AS (SELECT min(cnt) AS mn FROM c),
      tg AS (SELECT lang, CAST(ceil(sqrt(CAST(cnt AS DOUBLE) * mn)) AS BIGINT) AS tgt
             FROM c CROSS JOIN m),
      r AS (SELECT doc_id, lang,
              row_number() OVER (PARTITION BY lang
                ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
            FROM documents)
      SELECT doc_id, lang FROM r JOIN tg USING (lang) WHERE rn <= tgt
      ORDER BY doc_id""",

    // the waterfilling closed form replayed verbatim: sorted prefix
    // sums find the capped prefix, integer base + remainder spread
    "q_shard_rendezvous" -> ShardRendezvousOracleSql,

    "q_mix_waterfill" -> s"""
      WITH c AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS avail
                 FROM documents GROUP BY lang),
      g AS (SELECT lang, avail,
              CAST(row_number() OVER (ORDER BY avail ASC, lang ASC) AS BIGINT) AS rn,
              CAST(sum(avail) OVER (ORDER BY avail ASC, lang ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM c),
      t AS (SELECT CAST(sum(avail) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS nl FROM c),
      j AS (SELECT g.lang, g.avail, g.rn, g.cum, t.nl,
              (t.total * 1) // 2 AS budget,
              g.cum + g.avail * (t.nl - g.rn) <= (t.total * 1) // 2 AS capped
            FROM g CROSS JOIN t),
      p AS (SELECT CAST(coalesce(sum(CASE WHEN capped THEN 1 END), 0) AS BIGINT) AS k,
                   CAST(coalesce(max(CASE WHEN capped THEN cum END), 0) AS BIGINT) AS pstar
            FROM j),
      a AS (SELECT j.lang, j.avail, j.capped,
              CASE WHEN j.capped THEN j.avail
                   ELSE (j.budget - p.pstar) // (j.nl - p.k)
                        + (CASE WHEN j.rn - p.k <= (j.budget - p.pstar) % (j.nl - p.k)
                           THEN 1 ELSE 0 END)
              END AS alloc
            FROM j CROSS JOIN p)
      SELECT lang, avail, CAST(alloc AS BIGINT) AS alloc, capped,
        CAST(CASE WHEN avail > 0 THEN ${graft.pipeline.Corpus.utilPpbSql("//")}
             ELSE 1000000000 END AS BIGINT) AS util_ppb
      FROM a ORDER BY lang""",

    // ranked-prefix replay over the SHARED quality definition
    // ([[Pipeline.QualityCtes]]); cum sum cast to BIGINT (DuckDB's
    // BIGINT sum widens to HUGEINT)
    "q_token_budget" -> s"""
      WITH ${Pipeline.QualityCtes},
      j AS (SELECT d.doc_id, d.lang, d.source, qual.n_tokens, qual.quality
            FROM documents d JOIN qual USING (doc_id)),
      c AS (SELECT doc_id, lang, source, n_tokens, quality,
              CAST(sum(n_tokens) OVER (PARTITION BY lang, source
                ORDER BY quality DESC NULLS LAST, doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
            FROM j)
      SELECT doc_id, lang, source, n_tokens, quality, cum_tokens FROM c
      WHERE cum_tokens <= 400 ORDER BY doc_id""",

    // clusters and quality come from the SHARED fragments
    // ([[Pipeline.ClusterClosureCtes]] / [[Pipeline.QualityCtes]]) —
    // byte-identical to q_dedup_clusters' and q_text_quality's
    // definitions by construction; survivor = first by (quality DESC, id)
    "q_dedup_keep_best" -> s"""
      WITH RECURSIVE ${Pipeline.ClusterClosureCtes},
      ${Pipeline.QualityCtes},
      k AS (SELECT l.doc_id, l.cluster_id, qual.quality FROM lab l JOIN qual USING (doc_id)),
      r AS (SELECT doc_id, cluster_id,
              first_value(doc_id) OVER (PARTITION BY cluster_id
                ORDER BY quality DESC, doc_id ASC) AS keep_id
            FROM k)
      SELECT doc_id, cluster_id, keep_id, doc_id = keep_id AS is_kept
      FROM r ORDER BY doc_id""",

    // the keep-best shape widened to a per-family budget k; singleton
    // representative = the leakage-safe COALESCE convention
    "q_select_cluster_cap" -> s"""
      WITH RECURSIVE ${Pipeline.ClusterClosureCtes},
      ${Pipeline.QualityCtes},
      rep AS (SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS rep_id
              FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id),
      r AS (SELECT rep.doc_id, rep.rep_id,
              CAST(row_number() OVER (PARTITION BY rep.rep_id
                ORDER BY qual.quality DESC, rep.doc_id ASC) AS BIGINT) AS cluster_rank
            FROM rep JOIN qual ON qual.doc_id = rep.doc_id)
      SELECT doc_id, rep_id, cluster_rank,
             cluster_rank <= ${graft.pipeline.Dedup.ClusterCapK} AS kept
      FROM r ORDER BY doc_id""",

    // cluster labels from the SHARED closure fragment; representative
    // hash uses the same hex->int recipe as q_split_stratified, so the
    // two splits provably agree on every un-clustered document
    "q_split_leakage_safe" -> s"""
      WITH RECURSIVE ${Pipeline.ClusterClosureCtes},
      rep AS (SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS rep_id
              FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id),
      b AS (SELECT doc_id, rep_id,
              CAST('0x' || substr(md5(CAST(rep_id AS VARCHAR)), 1, 6) AS INT) % 100 AS bucket
            FROM rep)
      SELECT doc_id, rep_id,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM b ORDER BY doc_id""",

    // every derived product replayed from the SAME shared fragments
    // the self-contained oracles use — the stored-artifact derivation
    // must agree with full recomputation on every metric
    "q_dedup_artifact_reuse" -> s"""
      WITH RECURSIVE ${Pipeline.ClusterClosureCtes},
      ${Pipeline.QualityCtes},
      k AS (SELECT l.doc_id, l.cluster_id, qual.quality FROM lab l JOIN qual USING (doc_id)),
      r AS (SELECT doc_id, first_value(doc_id) OVER (PARTITION BY cluster_id
              ORDER BY quality DESC, doc_id ASC) AS keep_id
            FROM k),
      rep AS (SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS rep_id
              FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id),
      sp AS (SELECT doc_id,
          CASE WHEN CAST('0x' || substr(md5(CAST(rep_id AS VARCHAR)), 1, 6) AS INT) % 100 < 80
               THEN 'train'
               WHEN CAST('0x' || substr(md5(CAST(rep_id AS VARCHAR)), 1, 6) AS INT) % 100 < 90
               THEN 'val' ELSE 'test' END AS split
        FROM rep),
      out AS (
        SELECT 'keep_best' AS product, 'n_labeled' AS metric,
               CAST(count(*) AS BIGINT) AS value FROM k
        UNION ALL
        SELECT 'keep_best', 'n_kept', CAST(count(*) AS BIGINT) FROM r WHERE doc_id = keep_id
        UNION ALL
        SELECT 'split', split, CAST(count(*) AS BIGINT) FROM sp GROUP BY split
        UNION ALL
        SELECT 'contamination', 'n_pairs', CAST(count(*) AS BIGINT)
        FROM pairs p JOIN sp a ON p.id_a = a.doc_id JOIN sp b ON p.id_b = b.doc_id
        UNION ALL
        SELECT 'contamination', 'cross_pairs',
               CAST(COALESCE(sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM pairs p JOIN sp a ON p.id_a = a.doc_id JOIN sp b ON p.id_b = b.doc_id)
      SELECT product, metric, value FROM out ORDER BY product, metric""",

    // the oracle computes the global rank DIRECTLY (one window) — the
    // distributed two-pass form must reproduce it exactly
    "q_train_order" -> """
      SELECT doc_id,
             row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
               AS global_rank
      FROM documents ORDER BY doc_id""",

    // same normalization chain, same min-id survivor
    "q_dedup_normalized" -> """
      WITH k AS (SELECT doc_id,
          md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                  ' +', ' ', 'g'))) AS h
        FROM documents),
      g AS (SELECT h, CAST(count(*) AS BIGINT) AS group_size,
                   min(doc_id) AS keep_id
            FROM k GROUP BY h)
      SELECT k.doc_id, g.group_size, g.keep_id, k.doc_id = g.keep_id AS is_kept
      FROM k JOIN g USING (h) ORDER BY k.doc_id""",

    // both snapshots rebuilt from the fixture by the same rules; the
    // diff replays as one FULL OUTER hash-compare join
    "q_corpus_diff" -> """
      WITH v1 AS (SELECT doc_id, text FROM documents),
      v2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 5 THEN text || ' rev2' ELSE text END AS text
        FROM documents WHERE doc_id % 20 <> 0
        UNION ALL
        SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id, text
        FROM documents WHERE doc_id % 15 = 0),
      j AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
              md5(a.text) AS h_old, md5(b.text) AS h_new
            FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
      SELECT doc_id,
             CASE WHEN h_old IS NULL THEN 'added'
                  WHEN h_new IS NULL THEN 'removed'
                  WHEN h_old = h_new THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM j ORDER BY doc_id""",

    // rule-for-rule replay: same tokenization (lower + split), same
    // 4dp roundings of single IEEE divisions, same sub-3-token
    // vacuous-pass rule, same shared "en" stopword lexicon
    "q_text_gopher" -> s"""
      WITH $GopherCtes
      SELECT doc_id, lang, n_words, mean_word_len, dup3, stop_hits,
             (n_words >= 30 AND n_words <= 1000) AS pass_words,
             (mean_word_len >= 3.0 AND mean_word_len <= 5.0) AS pass_word_len,
             (dup3 <= 0.05) AS pass_repetition,
             (stop_hits >= 1) AS pass_stopwords,
             gkeep AS keep
      FROM gk ORDER BY doc_id""",

    // the oracle ranks each language DIRECTLY (one window over the
    // shared q_text_lm_score recipe) — the two-pass bucketed form
    // must reproduce every rank, bucket, and keep flag exactly
    "q_text_ppl_buckets" -> """
      WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents),
      freq AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
      tot AS (SELECT count(*) AS total FROM tok),
      d AS (SELECT t.doc_id, count(*) AS n_tok, CAST(sum(f.cnt) AS BIGINT) AS sum_cnt
            FROM tok t JOIN freq f USING (w) GROUP BY t.doc_id),
      s AS (SELECT doc_id,
              CAST((sum_cnt * 1000000000) // (n_tok * (SELECT total FROM tot)) AS BIGINT)
                AS score_ppb
            FROM d),
      r AS (SELECT s.doc_id, dd.lang, s.score_ppb,
              row_number() OVER (PARTITION BY dd.lang
                ORDER BY s.score_ppb DESC, s.doc_id ASC) AS rn,
              count(*) OVER (PARTITION BY dd.lang) AS lang_cnt
            FROM s JOIN documents dd ON s.doc_id = dd.doc_id)
      SELECT doc_id, lang, score_ppb, CAST(rn AS BIGINT) AS lang_rank,
             CASE WHEN rn * 3 <= lang_cnt THEN 'head'
                  WHEN rn * 3 <= lang_cnt * 2 THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket,
             (rn * 3 <= lang_cnt * 2) AS keep
      FROM r ORDER BY doc_id""",

    // winnowing replayed relationally: same k-gram hash recipe, same
    // value-min window, same partial-window predicate for short docs
    "q_text_winnow" -> s"""
      WITH $WinnowCtes
      SELECT doc_id, CAST(max(n_grams) AS BIGINT) AS n_grams,
             CAST(count(DISTINCT minh) AS BIGINT) AS n_fp,
             CAST(sum(DISTINCT minh) AS BIGINT) AS fp_sum
      FROM f GROUP BY doc_id ORDER BY doc_id""",

    // the MOSS match stage over the SAME winnow fragment: distinct
    // (doc, fingerprint) postings, df-capped, self-joined, >= 2 shared
    "q_dedup_span" -> s"""
      WITH $WinnowCtes,
      fp AS (SELECT DISTINCT doc_id, minh FROM f),
      rare AS (SELECT minh FROM fp GROUP BY minh HAVING count(*) <= 100),
      p AS (SELECT fp.doc_id, fp.minh FROM fp JOIN rare USING (minh))
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM p a JOIN p b ON a.minh = b.minh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
      ORDER BY id_a, id_b""",

    // exact-integer TVD: numerator summed as DECIMAL(38,0), one final
    // double division with the SAME association order as the Spark side
    "q_mix_drift" -> MixDriftOracleSql,
    // the streaming monitor's cumulative state equals the batch count
    // table and derives the alarm through the SHARED arithmetic — one
    // oracle for both forms, like the funnel/sessionize twins
    "q_stream_mix_drift" -> MixDriftOracleSql,

    // the same pair set + both split assignments, audited relationally
    "q_split_contamination" -> s"""
      WITH RECURSIVE ${Pipeline.ClusterClosureCtes},
      plain AS (SELECT doc_id,
          CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS INT) % 100 < 80
               THEN 'train'
               WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS INT) % 100 < 90
               THEN 'val' ELSE 'test' END AS split
        FROM documents),
      rep AS (SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS rep_id
              FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id),
      safe AS (SELECT doc_id,
          CASE WHEN CAST('0x' || substr(md5(CAST(rep_id AS VARCHAR)), 1, 6) AS INT) % 100 < 80
               THEN 'train'
               WHEN CAST('0x' || substr(md5(CAST(rep_id AS VARCHAR)), 1, 6) AS INT) % 100 < 90
               THEN 'val' ELSE 'test' END AS split
        FROM rep),
      audit AS (
        SELECT 'doc_hash' AS method,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(COALESCE(sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END), 0) AS BIGINT) AS cross_pairs
        FROM pairs p JOIN plain a ON p.id_a = a.doc_id JOIN plain b ON p.id_b = b.doc_id
        UNION ALL
        SELECT 'cluster_hash' AS method,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(COALESCE(sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END), 0) AS BIGINT) AS cross_pairs
        FROM pairs p JOIN safe a ON p.id_a = a.doc_id JOIN safe b ON p.id_b = b.doc_id)
      SELECT method, n_pairs, cross_pairs FROM audit ORDER BY method""",

    // brute-force replay of the blocked containment operator: same
    // word-4-shingle sets, same provenance + log2-band (integer
    // bit-length, engine-exact) blocking, |∩|/|small| measure
    "q_dedup_containment" -> """
      WITH tok AS (SELECT doc_id, lang, source, n_chars, string_split(text, ' ') AS w
                   FROM documents),
      g AS (SELECT doc_id, lang, source, n_chars,
          length(format('{:b}', n_chars)) - 1 AS band,
          list_distinct(list_transform(range(1, len(w) - 2),
            i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3])) AS g
        FROM tok WHERE len(w) >= 4),
      pairs AS (SELECT a.doc_id AS id_small, b.doc_id AS id_big,
          CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(a.g) AS cont0
        FROM g a JOIN g b
          ON a.lang = b.lang AND a.source = b.source
         AND b.band BETWEEN a.band AND a.band + 2
         AND a.doc_id <> b.doc_id AND a.n_chars <= b.n_chars)
      SELECT id_small, id_big, round(cont0, 4) AS containment
      FROM pairs WHERE cont0 >= 0.5 ORDER BY id_small, id_big""",

    // every-4th-byte downsample replayed over character codes; the
    // ASCII restriction (byte length = char length) is applied
    // IDENTICALLY on the Spark side, so a non-ASCII doc is excluded
    // consistently rather than silently diverging the byte/char replay
    "q_mm_resize" -> """
      WITH r AS (SELECT doc_id,
          CAST(length(text) AS BIGINT) AS orig_bytes,
          list_transform(range(1, length(text) + 1, 4), i -> ascii(substr(text, i, 1))) AS codes
        FROM documents
        WHERE octet_length(encode(text)) = length(text))
      SELECT doc_id, orig_bytes,
             CAST(len(codes) AS BIGINT) AS resized_bytes,
             CAST(COALESCE(list_sum(codes), 0) AS BIGINT) AS checksum
      FROM r ORDER BY doc_id""",

    // ring-offset draw replayed with the shared hex→int recipe (same
    // as q_split_stratified); the join keeps "existing docs only"
    "q_negative_samples" -> """
      WITH p AS (SELECT count(*) AS n FROM documents),
      a AS (SELECT doc_id, UNNEST(range(1, 4)) AS j FROM documents),
      d AS (SELECT a.doc_id, CAST(a.j AS INT) AS j,
              (a.doc_id + 1 + CAST('0x' || substr(md5(a.doc_id || ':' || a.j), 1, 6) AS BIGINT)
                % (p.n - 1)) % p.n AS neg_id
            FROM a CROSS JOIN p)
      SELECT d.doc_id, d.j, d.neg_id
      FROM d JOIN documents b ON b.doc_id = d.neg_id
      ORDER BY d.doc_id, d.j""",

    "q_cohort_retention" -> """
      WITH f AS (SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
                 FROM events GROUP BY user_id),
      a AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events)
      SELECT cohort_day, CAST(date_diff('day', cohort_day, d) AS BIGINT) AS day_offset,
             count(DISTINCT a.user_id) AS n_active
      FROM a JOIN f USING (user_id)
      GROUP BY cohort_day, day_offset
      ORDER BY cohort_day, day_offset""",

    // slice bounds are 1-based inclusive in DuckDB, (start, length) in
    // Spark — both clamp at the end; the window set is identical
    "q_text_chunks" -> """
      WITH b AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      c AS (SELECT doc_id, w, UNNEST(range(0, (len(w) - 1) // 40 + 1)) AS ci FROM b)
      SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
             CAST(len(w[ci * 40 + 1 : ci * 40 + 50]) AS BIGINT) AS n_tok,
             md5(array_to_string(w[ci * 40 + 1 : ci * 40 + 50], ' ')) AS chunk_hash
      FROM c ORDER BY doc_id, chunk_idx""")
}
