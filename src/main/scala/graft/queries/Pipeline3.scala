package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Corpus, Dedup, TextAnalysis}

/** Third batch of training-pipeline queries: frequency-threshold
  * boilerplate removal, vocabulary Zipf/coverage reporting, BPE
  * merge-pair induction, and length-bucketed batching efficiency —
  * each with a full DuckDB oracle.
  */
object Pipeline3 {

  private def docs(s: SparkSession, dir: String) = Tables.docs(s, dir)

  /** Exactly-20-word navigation chrome prepended to every document so
    * the fixture (word salad, no natural cross-doc segments) carries a
    * true universal boilerplate segment at position 0 — reproduced
    * verbatim in the oracle SQL.
    */
  private val BoilerHeader =
    "home nav menu search login help about contact terms privacy sitemap " +
      "news blog shop cart account settings faq support feedback"

  /** Frequency-threshold boilerplate removal
    * ([[Dedup.boilerplateRemoval]]): segments in ≥2 distinct docs are
    * dropped from EVERY document. Planted signal: the 20-word header
    * (df = corpus size) plus echoed copies of every 20th document
    * (body segments at df = 2) — so both the universal-chrome case and
    * the minimal-threshold case are exercised, and the per-doc
    * kept_hash pins every retained byte.
    */
  def dedupBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"),
      concat(lit(BoilerHeader + " "), col("text")).as("text"))
    val mx = docs(s, dir).agg(max(col("doc_id"))).head
    val off = (if (mx.isNullAt(0)) 0L else mx.getLong(0)) + 1L
    val withEcho = base.unionAll(
      base.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + off).as("doc_id"), col("text")))
    Dedup.boilerplateRemoval(withEcho, 20, 2).orderBy("doc_id")
  }

  /** Zipf / vocabulary-coverage checkpoints
    * ([[TextAnalysis.vocabCoverage]]): exact frequency-rank prefix
    * sums over the vocabulary via the shared two-pass bucketed
    * ranking, integer ppb coverage.
    */
  def textVocabCoverage(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(docs(s, dir)).orderBy("vocab_rank")

  /** Frequency-of-frequencies spectrum ([[TextAnalysis
    * .vocabSpectrum]]): banded type counts — hapax share and tail
    * shape, the Zipf diagnostic beside [[textVocabCoverage]]'s rank
    * prefix sums.
    */
  def textVocabSpectrum(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabSpectrum(docs(s, dir))

  /** Tokenizer-fertility report ([[TextAnalysis.fertility]]):
    * chars-per-token and doc sizing per language — the inputs of a
    * per-language token-budget correction.
    */
  def textFertility(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fertility(docs(s, dir))

  private val TextFertilityOracleSql = s"""
      WITH d AS (SELECT lang, n_chars,
               CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS BIGINT)
                 AS n_tokens
             FROM documents),
      g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
              CAST(sum(n_chars) AS BIGINT) AS n_chars
            FROM d GROUP BY lang)
      SELECT lang, n_docs, n_tokens, n_chars,
        CAST(${Num.ppbSql("n_tokens", "n_chars", "//")} AS BIGINT) AS tokens_per_char_ppb,
        CAST((n_tokens * 1000) // n_docs AS BIGINT) AS tokens_per_doc_x1000
      FROM g ORDER BY lang"""

  /** Per-stratum lexical diversity ([[TextAnalysis
    * .lexicalDiversity]]): distinct-shingle share of shingle volume
    * on the dedup tier's own shingle universe — templating shows up
    * as a diversity collapse before pair-level dedup runs.
    */
  def textLexicalDiversity(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lexicalDiversity(docs(s, dir))

  private val TextLexicalDiversityOracleSql = s"""
      WITH tok AS (SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents),
      sh AS (SELECT doc_id, lang, source,
               list_distinct(list_transform(range(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS s
             FROM tok WHERE len(w) >= 3),
      ds AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(s)) AS BIGINT) AS n_shingles
             FROM sh GROUP BY lang, source),
      dd AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_distinct FROM
               (SELECT DISTINCT lang, source, g FROM
                 (SELECT lang, source, unnest(s) AS g FROM sh))
             GROUP BY lang, source)
      SELECT ds.lang AS lang, ds.source AS source, ds.n_docs, ds.n_shingles, dd.n_distinct,
        CAST(${Num.ppbSql("dd.n_distinct", "ds.n_shingles", "//")} AS BIGINT) AS diversity_ppb
      FROM ds JOIN dd ON dd.lang = ds.lang AND dd.source = ds.source
      ORDER BY lang, source"""

  private val TextVocabSpectrumOracleSql = s"""
      WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      tf0 AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM toks
              WHERE length(tok) > 0 GROUP BY tok),
      b AS (SELECT ${TextAnalysis.VocabBandSql} AS band_id, tf FROM tf0),
      g AS (SELECT band_id, CAST(count(*) AS BIGINT) AS n_types,
              CAST(sum(tf) AS BIGINT) AS n_tokens FROM b GROUP BY band_id)
      SELECT band_id, n_types, n_tokens,
        CAST(${Num.ppbSql("n_types", "sum(n_types) OVER ()", "//")} AS BIGINT) AS type_share_ppb
      FROM g ORDER BY band_id"""

  /** One BPE induction round ([[TextAnalysis.bpePairStats]]): top-20
    * adjacent character pairs weighted by word frequency — the next-
    * merge statistic of byte-pair tokenizer training.
    */
  def textBpePairs(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpePairStats(docs(s, dir), 20)
      .orderBy(col("freq").desc, col("pair").asc)

  /** Merge count shared by the apply query and its oracle generator
    * (the kCenter one-constant device).
    */
  private val BpeMergeCount = 12

  /** The merge table from the last [[textBpeApply]] run — the
    * trained-similarity side-channel ([[Pipeline]]'s
    * `lastTrainedCentroids` contract): induction is a Spark loop the
    * oracle can't replay, so the query stashes the learned merges
    * and the generated oracle inlines them as `replace`-chain
    * literals and re-derives the ENCODING independently.
    */
  private val lastBpeMerges =
    new java.util.concurrent.atomic.AtomicReference[Option[Seq[(String, String)]]](None)

  /** BPE application ([[TextAnalysis.bpeMerges]] +
    * [[TextAnalysis.bpeEncode]]): induce [[BpeMergeCount]] merges
    * from the corpus type vocabulary, then encode every type and
    * roll up per-language tokenizer fertility under the learned
    * vocabulary — the operator a pipeline actually runs per
    * document, and the consumer of q_text_fertility's
    * chars-per-token question.
    */
  def textBpeApply(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val merges = TextAnalysis.bpeMerges(d, BpeMergeCount)
    lastBpeMerges.set(Some(merges))
    TextAnalysis.bpeEncode(d, merges)
  }

  /** The batched table's side-channel — same contract as
    * [[lastBpeMerges]], separate slot because the two tables may
    * legitimately differ past the first batch boundary.
    */
  private val lastBpeBatchedMerges =
    new java.util.concurrent.atomic.AtomicReference[Option[Seq[(String, String)]]](None)

  /** Batch size for [[textBpeBatched]] — with [[BpeMergeCount]] = 12
    * this is 3 counting rounds instead of 12 (the nMerges/B job-count
    * contract of [[TextAnalysis.bpeMergesBatched]]).
    */
  private val BpeBatchSize = 4

  /** Batched BPE induction + application
    * ([[TextAnalysis.bpeMergesBatched]] — r16 verdict #2, the
    * 50k-merge production path): induce [[BpeMergeCount]] merges in
    * batches of [[BpeBatchSize]], then encode and roll up fertility
    * per language exactly like [[textBpeApply]]. The oracle replays
    * the ENCODING under the learned (side-channeled) table with the
    * same generated replace-chain device — proving the batch-applied
    * table segments exactly — while batch=1 ≡ sequential is the
    * scalacheck law in LawsSpec.
    */
  def textBpeBatched(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val merges = TextAnalysis.bpeMergesBatched(d, BpeMergeCount, BpeBatchSize)
    lastBpeBatchedMerges.set(Some(merges))
    TextAnalysis.bpeEncode(d, merges)
  }

  /** The trained unigram piece table's side-channel — the
    * [[lastBpeMerges]] contract for the other tokenizer family.
    */
  private val lastUnigramPieces =
    new java.util.concurrent.atomic.AtomicReference[Option[Seq[(String, Long)]]](None)

  /** Unigram-LM tokenizer, trained and applied
    * ([[TextAnalysis.unigramTrain]] + [[TextAnalysis.unigramEncode]]
    * — r16 verdict #6, the SentencePiece counterpart that completes
    * the tokenizer story next to BPE): 2 hard-EM rounds over the
    * type table, then per-language Viterbi-exact piece counts and
    * total path cost under the learned table. The oracle re-runs the
    * DP itself (a `list_reduce` fold over positions with the
    * side-channeled integer cost map) — induction stays Spark-side
    * by the BPE contract, the ENCODING is proven exact.
    */
  def textUnigramLm(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pieces = TextAnalysis.unigramTrain(d, rounds = 2, topK = 48)
    lastUnigramPieces.set(Some(pieces))
    TextAnalysis.unigramEncode(d, pieces)
  }

  /** Side-channel for [[textWordpiece]]'s trained table — its own
    * slot by the [[lastUnigramAmbPieces]] rationale (never
    * order-coupled to another query's run).
    */
  private val lastWordpiecePieces =
    new java.util.concurrent.atomic.AtomicReference[Option[Seq[(String, Long)]]](None)

  /** Greedy-vs-optimal tokenizer contrast
    * ([[TextAnalysis.wordpieceEncode]]): train the 2-round unigram
    * piece table, then encode every type under BOTH rules — the
    * WordPiece/BERT greedy longest-match-first walk and the
    * unigram-LM Viterbi optimum — and grade the per-language piece
    * inflation, greedy cost, and suboptimal-token counts. The third
    * member of the tokenizer family: BPE (merge-driven), unigram
    * (optimal DP), WordPiece (greedy) — this query measures exactly
    * what separates the last two under one inventory.
    */
  def textWordpiece(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // topK = 16, NOT the other queries' 48: under the 48-piece table
    // greedy segments every fixture type optimally (measured — an
    // all-zero contrast is the r16 "correct but uninformative"
    // smell); the tighter inventory leaves real suboptimal mass
    // (~9% of tokens) on the graded path while most types stay
    // optimal, so BOTH regimes appear in the artifact.
    val pieces = TextAnalysis.unigramTrain(d, rounds = 2, topK = 16)
    lastWordpiecePieces.set(Some(pieces))
    TextAnalysis.wordpieceEncode(d, pieces)
  }

  /** The DuckDB replay of [[textWordpiece]]: BOTH encoders re-run
    * from the side-channeled map — the Viterbi fold verbatim from
    * [[TextUnigramOracleSql]] (once per DISTINCT word), and the
    * greedy walk as a RECURSIVE CTE stepping (word, position,
    * encoded) rows independently. A `list_reduce` greedy fold is
    * deliberately avoided: DuckDB 1.0 mis-evaluates iterative
    * lambdas whose body branches on the accumulator (a CASE early
    * exit) when the same vector carries words of different lengths —
    * measured: a 4-word VALUES vector returns a different encoding
    * for 'customer' than the identical 1-word query. Recursion
    * evaluates each step as its own operator pass, and the step
    * subquery gives the longest-match length a real let-binding.
    */
  private def TextWordpieceOracleSql: String = {
    val pieces = lastWordpiecePieces.get().getOrElse(Seq.empty)
    val keys = pieces.map(p => sqlQuote(p._1)).mkString("[", ", ", "]")
    val vals = pieces.map(p => s"CAST(${p._2} AS BIGINT)").mkString("[", ", ", "]")
    s"""
      WITH RECURSIVE tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
      tw AS MATERIALIZED (SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt
            FROM tok WHERE length(w) BETWEEN 1 AND 32 GROUP BY lang, w),
      mp AS (SELECT map($keys, $vals) AS m),
      dw AS MATERIALIZED (SELECT DISTINCT w FROM tw),
      enc AS (SELECT w,
          list_reduce(
            list_prepend([CAST(0 AS BIGINT)],
              list_transform(range(1, length(w) + 1), j -> [j])),
            (acc, x) -> acc || [list_min(list_transform(
              range(greatest(0, x[1] - 4), x[1]),
              i -> acc[CAST(i + 1 AS INT)] +
                (coalesce(map_extract(m, substr(w, CAST(i + 1 AS INT), CAST(x[1] - i AS INT)))[1],
                          CAST(1099511627776 AS BIGINT)) * 64 + 1)))]) AS sc
        FROM dw, mp),
      vit AS (SELECT w, sc[CAST(length(w) + 1 AS INT)] AS vval FROM enc),
      walk(w, p, genc) AS (
        SELECT w, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM dw
        UNION ALL
        SELECT w, p + bl,
               genc + coalesce(map_extract(m,
                   substr(w, CAST(p + 1 AS INT), CAST(bl AS INT)))[1],
                 CAST(1099511627776 AS BIGINT)) * 64 + 1
        FROM (SELECT w, p, genc, m,
                coalesce(list_max(list_filter(range(1, least(4, length(w) - p) + 1),
                    l -> map_extract(m, substr(w, CAST(p + 1 AS INT), CAST(l AS INT)))[1] IS NOT NULL)),
                  CAST(1 AS BIGINT)) AS bl
              FROM walk, mp WHERE p < length(w)) s
      ),
      g AS (SELECT w, genc FROM walk WHERE p = length(w)),
      v AS (SELECT tw.lang, tw.cnt, vit.vval, g.genc
            FROM tw JOIN vit USING (w) JOIN g USING (w))
      SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(sum(cnt * (vval % 64)) AS BIGINT) AS viterbi_pieces,
             CAST(sum(cnt * (genc % 64)) AS BIGINT) AS greedy_pieces,
             CAST(sum(cnt * (genc // 64)) AS BIGINT) AS greedy_cost_micro,
             CAST(sum(cnt * (genc // 64 - vval // 64)) AS BIGINT) AS excess_cost_micro,
             CAST(coalesce(sum(CASE WHEN genc > vval THEN cnt END), 0) AS BIGINT)
               AS n_suboptimal_tokens,
             CAST(${Num.ppbSql("sum(cnt * (genc % 64))", "sum(cnt * (vval % 64))", "//")} AS BIGINT)
               AS inflation_ppb
      FROM v GROUP BY lang ORDER BY lang"""
  }

  /** Side-channel for [[textTokenizeBudget]]'s trained table — its
    * own slot by the [[lastUnigramAmbPieces]] rationale (never
    * order-coupled to another query's run).
    */
  private val lastTokBudgetPieces =
    new java.util.concurrent.atomic.AtomicReference[Option[Seq[(String, Long)]]](None)

  /** Tokenizer-family capstone (r17 verdict #7,
    * [[TextAnalysis.tokenizeBudget]]): train the 2-round unigram
    * table, then answer the context-window planning question — how
    * many whole documents fit per language inside a waterfilled
    * two-thirds-of-total piece budget under THIS tokenizer (2/3
    * rather than 1/2 so the fixture exercises BOTH waterfill
    * branches: the smallest language caps, the rest split the
    * remainder with the +1 spread). The oracle
    * replays the whole chain: the Viterbi DP per distinct word (the
    * [[TextUnigramOracleSql]] fold), per-document piece sums, the
    * waterfill closed form (the q_mix_waterfill fragment), and the
    * greedy doc_id-ordered fill — every stage exact integers.
    */
  def textTokenizeBudget(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pieces = TextAnalysis.unigramTrain(d, rounds = 2, topK = 48)
    lastTokBudgetPieces.set(Some(pieces))
    TextAnalysis.tokenizeBudget(d, pieces, budgetNum = 2, budgetDen = 3)
  }

  /** The DuckDB replay of [[textTokenizeBudget]]: piece-count DP per
    * distinct word (verbatim [[TextUnigramOracleSql]] fold over the
    * side-channeled map literal), doc-keyed piece sums, the
    * waterfill closed form on the per-language totals, and the
    * cumulative-fill window — docs whose every token is outside the
    * model's 1..32-char band never enter (both engines apply the
    * same filter before the doc aggregate).
    */
  private def TextTokenizeBudgetOracleSql: String = {
    val pieces = lastTokBudgetPieces.get().getOrElse(Seq.empty)
    val keys = pieces.map(p => sqlQuote(p._1)).mkString("[", ", ", "]")
    val vals = pieces.map(p => s"CAST(${p._2} AS BIGINT)").mkString("[", ", ", "]")
    s"""
      WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
      tf AS MATERIALIZED (SELECT doc_id, lang, w FROM tok WHERE length(w) BETWEEN 1 AND 32),
      tw AS MATERIALIZED (SELECT DISTINCT w FROM tf),
      mp AS (SELECT map($keys, $vals) AS m),
      dp AS (SELECT w,
          list_reduce(
            list_prepend([CAST(0 AS BIGINT)],
              list_transform(range(1, length(w) + 1), j -> [j])),
            (acc, x) -> acc || [list_min(list_transform(
              range(greatest(0, x[1] - 4), x[1]),
              i -> acc[CAST(i + 1 AS INT)] +
                (coalesce(map_extract(m, substr(w, CAST(i + 1 AS INT), CAST(x[1] - i AS INT)))[1],
                          CAST(1099511627776 AS BIGINT)) * 64 + 1)))]) AS sc
        FROM tw, mp),
      np AS (SELECT w, CAST(sc[CAST(length(w) + 1 AS INT)] % 64 AS BIGINT) AS np FROM dp),
      docp AS MATERIALIZED (
        SELECT doc_id, lang, CAST(sum(np) AS BIGINT) AS doc_pieces
        FROM tf JOIN np USING (w) GROUP BY doc_id, lang),
      c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(doc_pieces) AS BIGINT) AS avail
            FROM docp GROUP BY lang),
      g AS (SELECT lang, n_docs, avail,
              CAST(row_number() OVER (ORDER BY avail ASC, lang ASC) AS BIGINT) AS rn,
              CAST(sum(avail) OVER (ORDER BY avail ASC, lang ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM c),
      t AS (SELECT CAST(sum(avail) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS nl FROM c),
      j AS (SELECT g.lang, g.n_docs, g.avail, g.rn, g.cum, t.nl,
              (t.total * 2) // 3 AS budget,
              g.cum + g.avail * (t.nl - g.rn) <= (t.total * 2) // 3 AS capped
            FROM g CROSS JOIN t),
      p AS (SELECT CAST(coalesce(sum(CASE WHEN capped THEN 1 END), 0) AS BIGINT) AS k,
                   CAST(coalesce(max(CASE WHEN capped THEN cum END), 0) AS BIGINT) AS pstar
            FROM j),
      a AS (SELECT j.lang, j.n_docs, j.avail, j.capped,
              CASE WHEN j.capped THEN j.avail
                   ELSE (j.budget - p.pstar) // (j.nl - p.k)
                        + (CASE WHEN j.rn - p.k <= (j.budget - p.pstar) % (j.nl - p.k)
                           THEN 1 ELSE 0 END)
              END AS alloc
            FROM j CROSS JOIN p),
      f AS (SELECT lang, doc_id, doc_pieces,
              CAST(sum(doc_pieces) OVER (PARTITION BY lang ORDER BY doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM docp),
      fit AS (SELECT f.lang, CAST(count(*) AS BIGINT) AS n_docs_fit,
                CAST(max(f.cum) AS BIGINT) AS pieces_used
              FROM f JOIN a USING (lang) WHERE f.cum <= a.alloc GROUP BY f.lang)
      SELECT a.lang, a.n_docs, a.avail AS avail_pieces,
             CAST(a.alloc AS BIGINT) AS alloc_pieces, a.capped,
             CAST(coalesce(fit.n_docs_fit, 0) AS BIGINT) AS n_docs_fit,
             CAST(coalesce(fit.pieces_used, 0) AS BIGINT) AS pieces_used
      FROM a LEFT JOIN fit USING (lang) ORDER BY a.lang"""
  }

  /** Side-channel for [[textUnigramAmbiguity]]'s staged tables
    * (seed + trained) — a separate slot so the query stays
    * self-contained regardless of map iteration order (same corpus ⇒
    * same trained table as [[textUnigramLm]]'s, but never
    * order-coupled to it).
    */
  private val lastUnigramAmbPieces =
    new java.util.concurrent.atomic.AtomicReference[Option[Seq[(String, Seq[(String, Long)])]]](None)

  /** Tokenizer lattice ambiguity ([[TextAnalysis.unigramAmbiguity]]):
    * train the same 2-round unigram table, then count — exactly —
    * how many types and what token share have MORE THAN ONE
    * cost-optimal segmentation, per language. The statistic behind
    * subword-regularization temperature: a mostly-unique-optimum
    * corpus gains nothing from lattice sampling. The oracle replays
    * BOTH DPs (scores, then optimal-path counts) from the
    * side-channeled piece table.
    */
  def textUnigramAmbiguity(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val seed = TextAnalysis.unigramSeedTable(d, topK = 48)
    // continue training FROM the seed just graded — the substring
    // sweep is computed once per run, not once per stage (r21)
    val trained = TextAnalysis.unigramTrainFrom(d, seed, rounds = 2, topK = 48)
    lastUnigramAmbPieces.set(Some(Seq("seed" -> seed, "trained" -> trained)))
    // half-nat quantized costs: exact micro-nat totals never tie, so
    // the informative measurement is ε-optimal ambiguity (see
    // TextAnalysis.quantizeHalfNat — the oracle quantizes the SAME
    // side-channeled tables with the SAME function). The seed stage
    // (overlapping substring candidates at near-equal costs) carries
    // real lattice ambiguity; the trained stage has collapsed it —
    // the CONTRAST is the graded signal.
    Seq("seed" -> seed, "trained" -> trained).map { case (stage, tbl) =>
      TextAnalysis.unigramAmbiguity(d, TextAnalysis.quantizeHalfNat(tbl))
        .withColumn("stage", lit(stage))
        .select(col("stage"), col("lang"), col("n_types"), col("n_ambig_types"),
          col("ambig_type_share_ppb"), col("n_tokens"), col("n_ambig_tokens"),
          col("ambig_token_share_ppb"), col("max_ways"))
    }.reduce(_.unionByName(_)).orderBy("stage", "lang")
  }

  /** The DuckDB replay of [[textUnigramAmbiguity]]: per stage (seed,
    * trained), the score-DP fold (verbatim from
    * [[TextUnigramOracleSql]]) plus the counting fold —
    * `ways[j] = Σ ways[i]` over window predecessors whose edge
    * reproduces `sc[j]` exactly — then the per-language rollup, the
    * stages UNION ALL'd. Both map literals come from the SAME
    * side-channeled tables through the SAME half-nat quantization.
    */
  private def TextUnigramAmbiguityOracleSql: String = {
    // before the producing query has run there are no stages; emit a
    // valid empty-result text rather than an unparseable empty UNION
    val stages = lastUnigramAmbPieces.get().getOrElse(
      Seq("seed" -> Seq.empty, "trained" -> Seq.empty))
    val blocks = stages.map { case (stage, raw) =>
      val pieces = TextAnalysis.quantizeHalfNat(raw)
      val keys = pieces.map(p => sqlQuote(p._1)).mkString("[", ", ", "]")
      val vals = pieces.map(p => s"CAST(${p._2} AS BIGINT)").mkString("[", ", ", "]")
      s"""
      SELECT '$stage' AS stage, lang, n_types, n_ambig_types, ambig_type_share_ppb,
             n_tokens, n_ambig_tokens, ambig_token_share_ppb, max_ways
      FROM (
        WITH mp AS (SELECT map($keys, $vals) AS m),
        dp AS (SELECT lang, w, cnt,
            list_reduce(
              list_prepend([CAST(0 AS BIGINT)],
                list_transform(range(1, length(w) + 1), j -> [j])),
              (acc, x) -> acc || [list_min(list_transform(
                range(greatest(0, x[1] - 4), x[1]),
                i -> acc[CAST(i + 1 AS INT)] +
                  (coalesce(map_extract(m, substr(w, CAST(i + 1 AS INT), CAST(x[1] - i AS INT)))[1],
                            CAST(1099511627776 AS BIGINT)) * 64 + 1)))]) AS sc
          FROM tw, mp),
        wy AS (SELECT lang, cnt, sc,
            list_reduce(
              list_prepend([CAST(1 AS BIGINT)],
                list_transform(range(1, length(w) + 1), j -> [j])),
              (acc, x) -> acc || [list_aggregate(list_transform(
                range(greatest(0, x[1] - 4), x[1]),
                i -> CASE WHEN sc[CAST(i + 1 AS INT)] +
                  (coalesce(map_extract(m, substr(w, CAST(i + 1 AS INT), CAST(x[1] - i AS INT)))[1],
                            CAST(1099511627776 AS BIGINT)) * 64 + 1)
                  = sc[CAST(x[1] + 1 AS INT)]
                  THEN acc[CAST(i + 1 AS INT)] ELSE CAST(0 AS BIGINT) END), 'sum')]) AS wys,
            w
          FROM dp, mp),
        v AS (SELECT lang, cnt, wys[CAST(length(w) + 1 AS INT)] AS ways FROM wy)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(CASE WHEN ways > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ambig_types,
               CAST(${Num.ppbSql("sum(CASE WHEN ways > 1 THEN 1 ELSE 0 END)", "count(*)", "//")} AS BIGINT)
                 AS ambig_type_share_ppb,
               CAST(sum(cnt) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN ways > 1 THEN cnt ELSE 0 END) AS BIGINT) AS n_ambig_tokens,
               CAST(${Num.ppbSql("sum(CASE WHEN ways > 1 THEN cnt ELSE 0 END)", "sum(cnt)", "//")} AS BIGINT)
                 AS ambig_token_share_ppb,
               CAST(max(ways) AS BIGINT) AS max_ways
        FROM v GROUP BY lang)"""
    }
    s"""
      WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
      tw AS MATERIALIZED (SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt
            FROM tok WHERE length(w) BETWEEN 1 AND 32 GROUP BY lang, w)
      SELECT * FROM (${blocks.mkString(" UNION ALL ")})
      ORDER BY stage, lang"""
  }

  /** The DuckDB replay of [[textUnigramLm]]'s ENCODING: the same
    * type-table filter, the same encoded-value Viterbi DP
    * (`64·cost + nPieces`, window = max piece length 4) as a
    * `list_reduce(list_prepend([0], positions))` fold with the
    * learned costs inlined as a map literal, the same per-language
    * rollup. Every integer in the DP is identical by construction.
    */
  private def TextUnigramOracleSql: String = {
    val pieces = lastUnigramPieces.get().getOrElse(Seq.empty)
    val keys = pieces.map(p => sqlQuote(p._1)).mkString("[", ", ", "]")
    val vals = pieces.map(p => s"CAST(${p._2} AS BIGINT)").mkString("[", ", ", "]")
    s"""
      WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
      tw AS MATERIALIZED (SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt
            FROM tok WHERE length(w) BETWEEN 1 AND 32 GROUP BY lang, w),
      mp AS (SELECT map($keys, $vals) AS m),
      dp AS (SELECT lang, w, cnt,
          list_reduce(
            list_prepend([CAST(0 AS BIGINT)],
              list_transform(range(1, length(w) + 1), j -> [j])),
            (acc, x) -> acc || [list_min(list_transform(
              range(greatest(0, x[1] - 4), x[1]),
              i -> acc[CAST(i + 1 AS INT)] +
                (coalesce(map_extract(m, substr(w, CAST(i + 1 AS INT), CAST(x[1] - i AS INT)))[1],
                          CAST(1099511627776 AS BIGINT)) * 64 + 1)))]) AS sc
        FROM tw, mp),
      v AS (SELECT lang, cnt, sc[CAST(length(w) + 1 AS INT)] AS val FROM dp)
      SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(cnt * (val % 64)) AS BIGINT) AS n_pieces,
             CAST(sum(cnt * (val // 64)) AS BIGINT) AS cost_micro,
             CAST(${Num.ppbSql("sum(cnt * (val % 64))", "sum(cnt)", "//")} AS BIGINT)
               AS pieces_per_token_ppb
      FROM v GROUP BY lang ORDER BY lang"""
  }

  /** The deterministic PII-planting expression [[textPii]] grades
    * against — the fixture corpus contains no PII at all (an
    * all-zero scrub report is the r16 "correct but uninformative"
    * smell), so both engines append the SAME synthetic email / IPv4 /
    * phone occurrences keyed on doc_id before scrubbing. `cast` is
    * the only dialect difference (STRING vs VARCHAR).
    */
  private def piiPlantSql(cast: String): String = s"""
    text || CASE WHEN doc_id % 7 = 0
                 THEN ' contact' || CAST(doc_id AS $cast) || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' 10.' || CAST(doc_id % 256 AS $cast) || '.0.' ||
                      CAST(doc_id % 100 AS $cast) ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' 555-' || lpad(CAST(doc_id % 1000 AS $cast), 3, '0') || '-' ||
                      lpad(CAST(doc_id % 10000 AS $cast), 4, '0') ELSE '' END"""

  /** PII scrub report ([[TextAnalysis.piiScrub]] — the C4/RefinedWeb
    * redaction pass): per language, exact email / IPv4 / phone match
    * counts, documents touched, and the redacted-length delta, over
    * the deterministically planted corpus. The oracle recomputes the
    * planting, the counts, and the triple redaction with the SAME
    * shared regex constants — RE2 and Java agree on the restricted
    * subset the patterns use (pinned in TextAnalysisSpec).
    */
  def textPii(s: SparkSession, dir: String): DataFrame = {
    val aug = docs(s, dir).withColumn("text", expr(piiPlantSql("STRING")))
    TextAnalysis.piiScrub(aug)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_emails") + col("n_ips") + col("n_phones") > 0, 1L)
          .otherwise(0L)).as("n_pii_docs"),
        sum("n_emails").as("n_emails"),
        sum("n_ips").as("n_ips"),
        sum("n_phones").as("n_phones"),
        sum(length(col("text")) - length(col("redacted"))).as("chars_redacted"))
      .orderBy("lang")
  }

  private def TextPiiOracleSql: String = s"""
      WITH aug AS (SELECT lang, ${piiPlantSql("VARCHAR")} AS t FROM documents),
      p AS (SELECT lang, t,
          len(regexp_extract_all(t, '${TextAnalysis.PiiEmailRe}')) AS ne,
          len(regexp_extract_all(t, '${TextAnalysis.PiiIpv4Re}')) AS ni,
          len(regexp_extract_all(t, '${TextAnalysis.PiiPhoneRe}')) AS np,
          regexp_replace(regexp_replace(regexp_replace(t,
            '${TextAnalysis.PiiEmailRe}', '[EMAIL]', 'g'),
            '${TextAnalysis.PiiIpv4Re}', '[IP]', 'g'),
            '${TextAnalysis.PiiPhoneRe}', '[PHONE]', 'g') AS red
        FROM aug)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs,
             CAST(sum(ne) AS BIGINT) AS n_emails,
             CAST(sum(ni) AS BIGINT) AS n_ips,
             CAST(sum(np) AS BIGINT) AS n_phones,
             CAST(sum(length(t) - length(red)) AS BIGINT) AS chars_redacted
      FROM p GROUP BY lang ORDER BY lang"""

  /** Side-channel for [[textNbLangid]]'s trained model — the
    * [[lastBpeMerges]] contract: training is a Spark aggregate the
    * oracle can't replay, so the query stashes the learned
    * integer-micro-nat cost tables and the generated oracle inlines
    * them as VALUES literals and re-derives the SCORING
    * independently.
    */
  private val lastNbModel =
    new java.util.concurrent.atomic.AtomicReference[Option[TextAnalysis.NbModel]](None)

  /** The deterministic class-marker planting expression
    * [[textNbLangid]] grades against — the fixture's languages share
    * ONE 31-word vocabulary with per-language rates inside sampling
    * noise (measured: raw-fixture NB accuracy 42% ≈ the 43% majority
    * prior — the r16 "correct but uninformative" smell), so both
    * engines append the SAME doc_id-keyed language-marker tokens to
    * 60% of documents before the split (the [[piiPlantSql]] device).
    * The graded confusion matrix then shows BOTH regimes: planted
    * rows sit on the diagonal (the trainer found the
    * class-conditional signal), unplanted rows collapse to the prior
    * class (the honest no-signal residual). `xm` prefixes collide
    * with no corpus token at any SF (measured). Identical text on
    * both dialects — no cast needed.
    */
  private val NbPlantSql =
    "CASE WHEN doc_id % 10 < 6 THEN text || ' xm' || lang || ' xm' || lang ELSE text END"

  /** Trained-classifier language ID ([[TextAnalysis.nbTrain]] +
    * [[TextAnalysis.nbScore]] — model-based filtering, the
    * CCNet/fastText pattern next to the heuristic
    * [[TextAnalysis.languageId]] / gopherRules gates): train a
    * multinomial NB on the md5-split train half of the
    * marker-planted corpus, score the held-out half, and roll up the
    * (planted × lang × predicted) confusion matrix with exact
    * integer margin bounds. Train/test assignment is the
    * [[Corpus.deterministicSplit]] content-hash device at 50/50 —
    * independent of the mod-10 plant keying, so both regimes appear
    * on both sides.
    */
  /** Shared plant → content-hash split → train device for the NB
    * queries — ONE definition ([[Corpus.deterministicSplit]] at
    * 50/0, the canonical md5 split both generated oracles' `>= 50`
    * literals replay), so the Spark split and the oracles can never
    * drift apart. The planted train half is materialized once
    * (Scratch): [[TextAnalysis.nbTrain]]'s three aggregate passes
    * would otherwise each recompute the plant + md5 filter over the
    * corpus. Returns (trained model, held-out half).
    */
  private def nbTrainedOnPlanted(s: SparkSession, dir: String)
      : (TextAnalysis.NbModel, DataFrame) = {
    val planted = Corpus.deterministicSplit(
      docs(s, dir).withColumn("text", expr(NbPlantSql)), trainPct = 50, valPct = 0)
    val trainHalf = graft.engine.Scratch.checkpoint(
      planted.filter(col("split") === "train").select(col("lang"), col("text")),
      "nb-train")
    (TextAnalysis.nbTrain(trainHalf, "lang", topV = 64),
      planted.filter(col("split") === "test").drop("split"))
  }

  def textNbLangid(s: SparkSession, dir: String): DataFrame = {
    val (model, testHalf) = nbTrainedOnPlanted(s, dir)
    lastNbModel.set(Some(model))
    TextAnalysis.nbScore(testHalf, model)
      .withColumn("planted", col("doc_id") % 10 < 6)
      .groupBy("planted", "lang", "predicted")
      .agg(count(lit(1)).as("n_docs"),
        min("margin_unats").as("min_margin_unats"),
        max("margin_unats").as("max_margin_unats"))
      .orderBy("planted", "lang", "predicted")
  }

  /** Shared NB scoring replay ending in
    * `pred(doc_id, lang, predicted, margin)` — the plant, the md5
    * test-half selection, tokens joined to the side-channeled
    * (word, class, cost) table with per-class OOV fallback, argmin
    * by (total, class), margin = runner-up − winner. Consumed by the
    * confusion-matrix AND calibration oracles (the QualityCtes
    * shared-fragment contract), each passing its own query's
    * side-channeled model.
    */
  private def nbScoreCtes(m: TextAnalysis.NbModel): String = {
    val costRows = m.vocabCosts.toSeq.sortBy(_._1).flatMap { case (w, cs) =>
      m.classes.zip(cs).map { case (c, k) =>
        s"(${sqlQuote(w)}, ${sqlQuote(c)}, CAST($k AS BIGINT))" }
    }.mkString(", ")
    val clsRows = m.classes.indices.map { i =>
      s"(${sqlQuote(m.classes(i))}, CAST(${m.priors(i)} AS BIGINT), CAST(${m.oovCosts(i)} AS BIGINT))"
    }.mkString(", ")
    s"""aug AS (SELECT doc_id, lang, $NbPlantSql AS text FROM documents),
      test AS (SELECT * FROM aug
               WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100 >= 50),
      tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM test),
      tf AS (SELECT * FROM tok WHERE w <> ''),
      wcost(w, cls, cost) AS (VALUES $costRows),
      cls(cls, prior, oov) AS (VALUES $clsRows),
      tot AS (SELECT t.doc_id, t.lang, c.cls,
                     c.prior + sum(coalesce(k.cost, c.oov)) AS total
              FROM tf t CROSS JOIN cls c
              LEFT JOIN wcost k ON k.w = t.w AND k.cls = c.cls
              GROUP BY t.doc_id, t.lang, c.cls, c.prior),
      rnk AS (SELECT doc_id, lang, cls, total,
                     row_number() OVER (PARTITION BY doc_id ORDER BY total, cls) AS rn
              FROM tot),
      pred AS (SELECT r1.doc_id, r1.lang, r1.cls AS predicted,
                      CAST(r2.total - r1.total AS BIGINT) AS margin
               FROM rnk r1 JOIN rnk r2 ON r1.doc_id = r2.doc_id AND r2.rn = 2
               WHERE r1.rn = 1)"""
  }

  private def TextNbLangidOracleSql: String = {
    val m = lastNbModel.get().getOrElse(
      TextAnalysis.NbModel(Vector("x"), Vector(0L), Map("x" -> Vector(0L)), Vector(0L)))
    s"""
      WITH ${nbScoreCtes(m)}
      SELECT (doc_id % 10 < 6) AS planted, lang, predicted,
             CAST(count(*) AS BIGINT) AS n_docs,
             min(margin) AS min_margin_unats,
             max(margin) AS max_margin_unats
      FROM pred GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
  }

  /** Side-channel for [[textNbCalibration]]'s model — its own slot
    * (never order-coupled to [[textNbLangid]]'s run).
    */
  private val lastNbCalModel =
    new java.util.concurrent.atomic.AtomicReference[Option[TextAnalysis.NbModel]](None)

  /** Margin calibration for the trained classifier
    * ([[TextAnalysis.scoreCalibration]] REUSED verbatim with
    * score = `margin_unats`, flag = prediction correct): per exact
    * margin decile of the held-out half, the accuracy in floored ppb
    * — whether the classifier's confidence is a usable filter
    * threshold, the q_quality_calibration question asked of the
    * model-based tier. On the planted fixture the curve is the
    * designed contrast: top deciles are planted-marker docs (huge
    * margins, ~100% accurate), bottom deciles are unplanted docs
    * collapsing to the prior — monotone by construction, measured by
    * the gate.
    */
  def textNbCalibration(s: SparkSession, dir: String): DataFrame = {
    val (model, testHalf) = nbTrainedOnPlanted(s, dir)
    lastNbCalModel.set(Some(model))
    val scored = graft.engine.Scratch.checkpoint(
      TextAnalysis.nbScore(testHalf, model)
        .select(col("doc_id"), col("lang"), col("predicted"), col("margin_unats")),
      "nbcal-scored") // consumed twice: the score side and the flag side
    TextAnalysis.scoreCalibration(
      scored.select(col("doc_id"), col("margin_unats").as("score")),
      scored.select(col("doc_id"), (col("predicted") === col("lang")).as("flag")),
      bins = 10)
  }

  /** The DuckDB replay of [[textNbCalibration]]: the shared
    * [[nbScoreCtes]] scoring (this query's own side-channeled model)
    * then the exact decile binning verbatim from
    * [[QualityCalibrationOracleSql]] on (margin DESC, doc_id ASC).
    */
  private def TextNbCalibrationOracleSql: String = {
    val m = lastNbCalModel.get().getOrElse(
      TextAnalysis.NbModel(Vector("x"), Vector(0L), Map("x" -> Vector(0L)), Vector(0L)))
    s"""
      WITH ${nbScoreCtes(m)},
      r AS (SELECT doc_id, margin AS score, (predicted = lang) AS flag,
              row_number() OVER (ORDER BY margin DESC, doc_id ASC) AS rn,
              count(*) OVER () AS n
            FROM pred)
      SELECT (((rn - 1) * 10) // n)::BIGINT AS bin,
             count(*)::BIGINT AS n_docs,
             (count(*) FILTER (flag))::BIGINT AS n_flagged,
             (((count(*) FILTER (flag)) * 1000000000) // count(*))::BIGINT AS flag_ppb,
             min(score) AS min_score,
             max(score) AS max_score
      FROM r GROUP BY 1 ORDER BY bin"""
  }

  /** The graded tag dictionary — chosen so the automaton's two
    * non-trivial behaviors are ON the graded path, not just in the
    * spec: substring pairs ("slow"⊃"low", "scan"⊃"an", "data"⊃"at")
    * exercise the output-link chain (every "slow" must also count a
    * "low"), and cross-word hits ("an" inside "scan"/"nation",
    * "at" inside "data") exercise overlap counting.
    */
  private val TagTerms = Seq("an", "at", "data", "low", "merge", "scan", "slow", "table")

  /** Dictionary tagging ([[TextAnalysis.dictTags]] — one
    * Aho-Corasick pass per document vs |dictionary| regexp scans):
    * per (lang, term), total occurrences (overlaps included) and
    * documents touched. The oracle recomputes each term's positional
    * brute-force count — `substr(text, p, len) = term` over every
    * start position — so the automaton's output-link accounting is
    * proven against the definition itself.
    */
  def textDictTags(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dictTags(docs(s, dir), TagTerms)

  private val TextDictTagsOracleSql: String = {
    val termRows = TagTerms.map(t => s"(${sqlQuote(t)})").mkString(", ")
    s"""
      WITH terms(term) AS (VALUES $termRows),
      m AS (SELECT d.lang, t.term,
              len(list_filter(range(1, greatest(length(d.text) - length(t.term) + 2, 1)),
                  i -> substr(d.text, CAST(i AS INT), length(t.term)) = t.term)) AS n
            FROM documents d CROSS JOIN terms t)
      SELECT lang, term, CAST(sum(n) AS BIGINT) AS n_hits,
             CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
      FROM m GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** Case-insensitive variant of the tagging report — real blocklists
    * (C4's bad-words list) match case-insensitively, and the
    * sentence-cased fixture text ("Data", "Table" at sentence starts)
    * makes the folded counts strictly larger than the exact-codepoint
    * ones. The DICTIONARY side is deliberately mixed/UPPER-cased so
    * both folds (term at build, text per scanned codepoint) are on
    * the graded path; the report still labels rows with the
    * dictionary's original spelling. The oracle replays the defining
    * rewrite — `lower(term)` positionally counted in `lower(text)` —
    * with both folds applied inside DuckDB, proving the automaton's
    * per-codepoint simple lowercase agrees with the SQL `lower()`.
    */
  private val TagTermsCi = Seq("AN", "At", "Data", "LOW", "Merge", "SCAN", "Slow", "table")

  def textDictTagsCi(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dictTags(docs(s, dir), TagTermsCi, caseInsensitive = true)

  private val TextDictTagsCiOracleSql: String = {
    val termRows = TagTermsCi.map(t => s"(${sqlQuote(t)})").mkString(", ")
    s"""
      WITH terms(term) AS (VALUES $termRows),
      m AS (SELECT d.lang, t.term,
              len(list_filter(range(1, greatest(length(d.text) - length(t.term) + 2, 1)),
                  i -> substr(lower(d.text), CAST(i AS INT), length(t.term)) = lower(t.term))) AS n
            FROM documents d CROSS JOIN terms t)
      SELECT lang, term, CAST(sum(n) AS BIGINT) AS n_hits,
             CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
      FROM m GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** The gate's blocklist is PHRASES (terms spanning token
    * boundaries — the substring semantics per-token regex filters
    * miss), each hitting ~5-7% of fixture docs so the blocked share
    * is a real two-sided measurement, not 0% or 100%.
    */
  private val GateTerms = Seq("big data", "fast merge", "hash join", "slow scan")

  /** Dictionary gate application ([[TextAnalysis.dictGate]] — the
    * filter the q_text_dict_tags report precedes, i.e. the C4
    * blocklist DROP step): per language, documents removed by any
    * phrase hit, characters lost, blocked share in floored ppb. The
    * oracle replays the gate with `position(term IN text) > 0` per
    * term — existence, not counting, is the gate's semantics.
    */
  def textDictPolicy(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dictGate(docs(s, dir), GateTerms)

  private val TextDictPolicyOracleSql: String = {
    val anyHit = GateTerms
      .map(t => s"position(${sqlQuote(t)} IN text) > 0")
      .mkString("(", " OR ", ")")
    s"""
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(CASE WHEN $anyHit THEN 1 END), 0) AS BIGINT) AS n_blocked,
             CAST(coalesce(sum(CASE WHEN $anyHit THEN length(text) END), 0) AS BIGINT)
               AS chars_blocked,
             CAST(${Num.ppbSql(s"coalesce(sum(CASE WHEN $anyHit THEN 1 END), 0)", "count(*)", "//")} AS BIGINT)
               AS blocked_ppb
      FROM documents GROUP BY lang ORDER BY lang"""
  }

  /** Length-bucketed batching report ([[Corpus.lengthBuckets]]):
    * pad-to-multiple-of-32 buckets with exact integer fill ratios.
    */
  def lengthBuckets(s: SparkSession, dir: String): DataFrame =
    Corpus.lengthBuckets(docs(s, dir)).orderBy("bucket_max")

  /** Calibration of the continuous quality score against the Gopher
    * rule gate ([[TextAnalysis.scoreCalibration]]): exact decile
    * rank bins of [[TextAnalysis.qualityScores]]'s `quality`, per
    * bin the rate at which [[TextAnalysis.gopherRules]]'s `keep`
    * fires — do the two quality signals agree, and where do they
    * diverge. Both signals ride their SHARED oracle fragments
    * (QualityCtes / GopherCtes), so the calibration oracle replays
    * score-for-score and rule-for-rule.
    */
  def qualityCalibration(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    TextAnalysis.scoreCalibration(
        TextAnalysis.qualityScores(d).select(col("doc_id"), col("quality").as("score")),
        TextAnalysis.gopherRules(d).select(col("doc_id"), col("keep").as("flag")),
        bins = 10)
      .orderBy("bin")
  }

  /** Spool dir for [[streamHeavyHitters]]'s ordered replay, built
    * once per (session, sfDir) — the batchSpool/sessionSpool caching
    * pattern.
    */
  private val hhSrc = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Streaming heavy hitters: the [[graft.functions.MisraGries]]
    * sketch maintained as STREAMING AGGREGATION STATE — the token
    * stream replays as 4 micro-batches (maxFilesPerTrigger = 1) and
    * each batch's partial sketch merges into the Complete-mode
    * global aggregate's state store, exercising the UDAF's `merge`
    * across batch boundaries rather than across partitions.
    *
    * Graded exactly like the batch form (q_heavy_hitters): the MG
    * theorems hold for ANY merge order — mergeable-summaries
    * (Agarwal et al., PODS'12): error stays ≤ n/(k+1) under
    * arbitrary pairwise merges — so every token with true frequency
    * ≥ 2n/(k+1) must be found with an estimate in
    * [true − n/(k+1), true], and the oracle pins those booleans
    * next to hash-compared exact counts. Same oracle SQL verbatim.
    */
  def streamHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    Relational6.view(s, dir, "lineitem")
    val K = 100
    val toks = s.sql(Relational6.HhToksSql)
    val tmp = hhSrc.computeIfAbsent(dir, { _ =>
      val t = java.nio.file.Files.createTempDirectory("graft-hh-stream").toString
      toks.repartition(4).write.mode("overwrite").parquet(t)
      t
    })
    val mg = org.apache.spark.sql.functions.udaf(new graft.functions.MisraGries(K))
    val name = "graft_stream_hh"
    val res = Replay.ladder(s, tmp, toks.schema, name,
        mode = org.apache.spark.sql.streaming.OutputMode.Complete)(
      _.agg(mg(col("tok")).as("sketch"), count(col("tok")).as("n")))
    // the k-entry map collects to the driver by design — it IS the
    // bounded summary (same argued exception as the batch form)
    val head = res.head()
    val sketch = head.getMap[String, Long](0).toMap
    val n = head.getLong(1)
    val bound = n.toDouble / (K + 1)
    val est = element_at(typedlit(sketch), col("tok"))
    toks.groupBy("tok").agg(count(lit(1)).as("exact_count"))
      .filter(col("exact_count") >= 2.0 * bound)
      .select(col("tok"), col("exact_count"),
        est.isNotNull.as("found"),
        (est.isNotNull && est <= col("exact_count") &&
          (col("exact_count") - est) <= lit(bound)).as("est_ok"))
      .orderBy("tok")
  }

  /** Per-stratum dedup governance rollup ([[Dedup.removalReport]]):
    * corpus size, near-dup involvement, survivor-election removals,
    * and removal rate per (lang, source) — derived from the SHARED
    * compute-once cluster artifact (the q_dedup_artifact_reuse
    * pattern) and the graded [[Dedup.keepBest]] election, so the
    * report's inputs are byte-identical to the queries that grade
    * them individually.
    */
  def dedupReport(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val (_, labels) = Pipeline.clusterArtifact(s, dir)
    Dedup.removalReport(d,
        Dedup.keepBest(labels, TextAnalysis.qualityScores(d)))
      .orderBy("lang", "source")
  }

  /** Cross-source duplication matrix: WHERE near-duplication comes
    * from — per unordered source pair (canonicalized lo ≤ hi so the
    * matrix is upper-triangular), the verified pair count, its
    * floored-ppb share of all pairs (the overflow-free [[Num.ppbSql]]
    * long division), and the cross-source flag. The report a corpus
    * owner reads before deciding whether dedup is an intra-source
    * cleanup or a cross-source (mirror/syndication) problem. Rides
    * the compute-once pair artifact; two dimension joins + one
    * sources²-bounded aggregate.
    */
  def dedupSourceMatrix(s: SparkSession, dir: String): DataFrame = {
    val (pairs, _) = Pipeline.clusterArtifact(s, dir)
    sourceMatrixOn(pairs, docs(s, dir).select(col("doc_id"), col("source")))
  }

  private[queries] def sourceMatrixOn(pairs: DataFrame, meta: DataFrame): DataFrame =
    pairs
      .join(meta.select(col("doc_id").as("id_a"), col("source").as("src_a")), "id_a")
      .join(meta.select(col("doc_id").as("id_b"), col("source").as("src_b")), "id_b")
      .select(least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"))
      .groupBy("source_lo", "source_hi")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("pair_share_ppb",
        expr(s"CAST(${Num.ppbSql("n_pairs", "sum(n_pairs) OVER ()", "DIV")} AS BIGINT)"))
      .withColumn("is_cross", col("source_lo") =!= col("source_hi"))
      .orderBy("source_lo", "source_hi")

  private val DedupSourceMatrixOracleSql = s"""
      WITH RECURSIVE ${Pipeline.ClusterClosureCtes},
      m AS (SELECT least(da.source, db.source) AS source_lo,
                   greatest(da.source, db.source) AS source_hi
            FROM pairs p
            JOIN documents da ON da.doc_id = p.id_a
            JOIN documents db ON db.doc_id = p.id_b),
      g AS (SELECT source_lo, source_hi, CAST(count(*) AS BIGINT) AS n_pairs
            FROM m GROUP BY source_lo, source_hi)
      SELECT source_lo, source_hi, n_pairs,
        CAST(${Num.ppbSql("n_pairs", "sum(n_pairs) OVER ()", "//")} AS BIGINT)
          AS pair_share_ppb,
        source_lo <> source_hi AS is_cross
      FROM g ORDER BY source_lo, source_hi"""

  /** Probe users for the streaming CMS point estimates — shared with
    * the oracle's VALUES list.
    */
  private val StreamCmsProbeUsers = Seq(1L, 2L, 3L, 4L, 5L)

  /** Streaming count-min sketch state: per event type, the CMS of
    * user_id ([[graft.operators.Sketches]]) maintained as
    * Complete-mode aggregation state across the 4-micro-batch events
    * replay — the state store IS the sketch relation `(event_type,
    * j, bucket, cnt)`, bounded at groups×depth×width rows no matter
    * how long the stream runs, and per-batch partial counts merge
    * into it by exactly the count linearity [[Relational6.aggCms]]
    * proves across a batch rollup. Because the hash family is
    * cross-engine BIGINT arithmetic, the final state's point
    * estimates grade EXACTLY against the oracle's relational rebuild
    * over the full replayed event set — stronger than the HLL
    * sibling's contract booleans (q_stream_distinct_sketch).
    */
  def streamCms(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    import s.implicits._
    val ev = Relational.events(s, dir)
    val sk = Replay.ladder(s, Pipeline.batchSpool(s, dir), ev.schema, "graft_stream_cms",
        mode = org.apache.spark.sql.streaming.OutputMode.Complete)(
      st => Sketches.cmsSketch(st, Seq("event_type"), col("user_id")))
    val probes = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(StreamCmsProbeUsers.toDF("probe_key")))
    val est = Sketches.cmsEstimate(sk, Seq("event_type"), probes, "probe_key")
    val exact = ev.filter(col("user_id").isin(StreamCmsProbeUsers: _*))
      .groupBy(col("event_type"), col("user_id").as("probe_key"))
      .agg(count(lit(1)).as("exact_cnt"))
    est.join(exact, Seq("event_type", "probe_key"), "left")
      .select(col("event_type"), col("probe_key"),
        coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"), col("cms_est"),
        (col("cms_est") >= coalesce(col("exact_cnt"), lit(0L))).as("never_under"))
      .orderBy("event_type", "probe_key")
  }

  private def streamCmsOracleSql: String = {
    import graft.operators.Sketches._
    s"""WITH h AS (SELECT j, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
             FROM (VALUES $cmsHashValuesSql) t(j, a, b)),
      keys AS (SELECT CAST(k AS BIGINT) AS k
             FROM (VALUES ${StreamCmsProbeUsers.map(k => s"($k)").mkString(", ")}) t(k)),
      ev AS (SELECT event_type, user_id FROM events),
      sk AS (SELECT event_type, j,
               ((user_id % $CmsP) * a + b) % $CmsP % $CmsW AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
             FROM ev CROSS JOIN h GROUP BY 1, 2, 3),
      et AS (SELECT DISTINCT event_type FROM ev),
      pb AS (SELECT et.event_type, k.k, h.j,
               ((k.k % $CmsP) * h.a + h.b) % $CmsP % $CmsW AS bucket
             FROM et CROSS JOIN keys k CROSS JOIN h),
      est AS (SELECT pb.event_type, pb.k,
                CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS cms_est
              FROM pb LEFT JOIN sk ON sk.event_type = pb.event_type
                AND sk.j = pb.j AND sk.bucket = pb.bucket
              GROUP BY 1, 2),
      ex AS (SELECT event_type, user_id AS k, CAST(count(*) AS BIGINT) AS exact_cnt
             FROM ev WHERE user_id IN (${StreamCmsProbeUsers.mkString(", ")}) GROUP BY 1, 2)
      SELECT e.event_type AS event_type, CAST(e.k AS BIGINT) AS probe_key,
        coalesce(ex.exact_cnt, 0) AS exact_cnt, e.cms_est,
        e.cms_est >= coalesce(ex.exact_cnt, 0) AS never_under
      FROM est e
      LEFT JOIN ex ON ex.event_type = e.event_type AND ex.k = e.k
      ORDER BY event_type, probe_key"""
  }

  /** Streaming approximate-distinct sketch state: per event type, a
    * Datasketches HLL sketch of user_id (lgConfigK = 14, the
    * q_agg_sketch_column configuration) maintained as Complete-mode
    * streaming aggregation state across the 4-micro-batch events
    * replay — per-batch partial sketches merge into the state store,
    * the same mergeability [[Relational6.aggSketchColumn]] proves
    * across a batch rollup. Graded by the 2% sketch contract next to
    * hash-compared exact distinct counts (sketch VALUES are
    * engine-internal, sketch CONTRACTS are not).
    */
  def streamDistinctSketch(s: SparkSession, dir: String): DataFrame = {
    val res = Replay.ladder(s, Pipeline.batchSpool(s, dir),
        Relational.events(s, dir).schema, "graft_stream_hll",
        mode = org.apache.spark.sql.streaming.OutputMode.Complete)(
      _.groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"),
          count(lit(1)).as("n_events")))
    val exact = Relational.events(s, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    res
      .select(col("event_type"), col("n_events"),
        hll_sketch_estimate(col("sk")).as("est"))
      .join(exact, "event_type")
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <= col("exact_users") * lit(0.02))
          .as("est_within_2pct"))
      .orderBy("event_type")
  }

  /** Audio-window energy/peak stats ([[graft.pipeline.Multimodal
    * .audioWindows]]) over the standard fake-PCM payload — the VAD
    * primitive, oracled sample-for-sample by a relational PCM16
    * decode (hex byte pairs → signed little-endian samples).
    */
  def mmAudio(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Multimodal.audioWindows(s,
        graft.pipeline.Multimodal.withBinaryPayload(docs(s, dir)))
      .orderBy("doc_id", "window_idx")

  private val lateSrc = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Spool for [[streamLateAudit]]'s replay ladder, built once per
    * (session, sfDir): the full ts-sorted event stream, then ONE
    * straggler batch carrying planted late arrivals — echoes of the
    * first 10 minutes of events (their windows closed long before
    * the straggler batch: watermark-DROPPED) and of the last 3
    * minutes (inside the 5-minute delay: late but KEPT) — then the
    * two watermark-mover sentinels that flush every real window out
    * of the Append-mode state (the sessionSpool ladder).
    */
  private def lateSpool(s: SparkSession, dir: String): String = {
    import graft.streaming.EventStream
    lateSrc.computeIfAbsent(dir, { d =>
      val t = java.nio.file.Files.createTempDirectory("graft-late-q")
      sys.addShutdownHook(Pipeline.rmTree(t.toFile))
      val ev = Relational.events(s, d)
      def writeOne(df: DataFrame, name: String): Unit = {
        val tdir = java.nio.file.Files.createTempDirectory("graft-late-part")
        df.repartitionByRange(1, col("ts")).sortWithinPartitions("ts")
          .write.mode("overwrite").parquet(tdir.toString)
        val part = tdir.toFile.listFiles.find(_.getName.startsWith("part-")).get
        java.nio.file.Files.move(part.toPath, t.resolve(name))
        Pipeline.rmTree(tdir.toFile)
      }
      writeOne(ev, "aa-data.parquet")
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      // end of the last REAL 15-minute bucket, exact integer ms math
      val lastBucketEndMs = (maxTs.getTime / 900000L + 1L) * 900000L
      def sentinel(atMs: Long, name: String): Unit = {
        val row = org.apache.spark.sql.Row(-1L, new java.sql.Timestamp(atMs),
          -1L, "sentinel", 0.0, "{}")
        val tdir = java.nio.file.Files.createTempDirectory("graft-late-sent")
        s.createDataFrame(java.util.Arrays.asList(row), EventStream.EventSchema)
          .coalesce(1).write.mode("overwrite").parquet(tdir.toString)
        val part = tdir.toFile.listFiles.find(_.getName.startsWith("part-")).get
        java.nio.file.Files.move(part.toPath, t.resolve(name))
        Pipeline.rmTree(tdir.toFile)
      }
      // Eviction lags watermark advancement by one batch: the batch
      // that first RUNS with watermark = max − delay is the one that
      // evicts+emits the closed windows; only a batch AFTER that can
      // meet evicted state and be watermark-dropped. The mover is
      // that eviction batch. Its event time is pinned INSIDE
      // (lastBucketEnd, lastBucketEnd + delay): past the end so its
      // own window is a fresh bucket the report's join excludes, but
      // close enough that the resulting watermark (mover − delay <
      // lastBucketEnd) keeps the LAST real bucket alive for the
      // straggler batch's in-delay echoes.
      sentinel(lastBucketEndMs + 60000L, "bb-mover.parquet")
      val bounds = ev.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      val withB = ev.crossJoin(broadcast(bounds))
      // recent echoes are clamped to the last real bucket (an event
      // within 3 min of max but across the bucket boundary would have
      // had its window evicted by the mover and flip to dropped)
      val echoes = withB
        .filter(col("ts") < col("mn") + expr("INTERVAL 10 MINUTES") ||
          (col("ts") > col("mx") - expr("INTERVAL 3 MINUTES") &&
            expr("unix_micros(ts) DIV 900000000 = unix_micros(mx) DIV 900000000")))
        .select((col("event_id") + 10000000L).as("event_id"), col("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      writeOne(echoes, "mm-late.parquet")
      sentinel(maxTs.getTime + 120L * 60000L, "zz-sentinel-1.parquet")
      sentinel(maxTs.getTime + 240L * 60000L, "zz-sentinel-2.parquet")
      // modification times = replay order: data, mover, straggler,
      // sentinels
      val t0 = System.currentTimeMillis() - 3600_000L
      val parts = t.toFile.listFiles.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(t0 + i * 10_000L) }
      t.toString
    })
  }

  /** Streaming late-data audit — the data-loss visibility report a
    * production stream runs next to every watermarked aggregation:
    * per 15-minute window, how many events the watermark silently
    * dropped. The replay ladder plants BOTH fates: echoes of the
    * oldest 10 minutes arrive after the watermark passed their
    * windows (dropped — their windows closed ~30 days of event time
    * earlier), echoes of the newest 3 minutes arrive inside the
    * 5-minute delay (late but kept, counted twice). The streamed
    * Append-mode per-window counts are then joined against the
    * batch expectation over (events ∪ all echoes); the deficit IS
    * the drop count.
    *
    * The oracle independently DERIVES the watermark semantics:
    * n_dropped must equal exactly the early-echo count per window
    * and nothing else — i.e. Spark's global watermark (max event
    * time minus delay, updated at batch boundaries) dropped every
    * closed-window straggler and kept every in-delay one. Margins
    * are days vs minutes, so >/≥ boundary conventions cannot flip
    * any row.
    */
  def streamLateAudit(s: SparkSession, dir: String): DataFrame = {
    val name = "graft_stream_late"
    Replay.ladder(s, lateSpool(s, dir), graft.streaming.EventStream.EventSchema, name)(
      _.withWatermark("ts", "5 minutes")
        .groupBy(window(col("ts"), "15 minutes"))
        .agg(count(lit(1)).as("n_stream"))
        .select(col("window.start").as("bucket"), col("n_stream")))
    val ev = Relational.events(s, dir)
    val bounds = ev.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
    val withB = ev.crossJoin(broadcast(bounds))
    val echoes = withB.filter(
      col("ts") < col("mn") + expr("INTERVAL 10 MINUTES") ||
        (col("ts") > col("mx") - expr("INTERVAL 3 MINUTES") &&
          expr("unix_micros(ts) DIV 900000000 = unix_micros(mx) DIV 900000000")))
    val total = ev.select(col("ts")).unionAll(echoes.select(col("ts")))
      .groupBy(window(col("ts"), "15 minutes"))
      .agg(count(lit(1)).as("n_total"))
      .select(col("window.start").as("bucket"), col("n_total"))
    total.join(s.table(name), Seq("bucket"), "left")
      .select(col("bucket"), col("n_total"),
        coalesce(col("n_stream"), lit(0L)).as("n_stream"),
        (col("n_total") - coalesce(col("n_stream"), lit(0L))).as("n_dropped"),
        ((col("n_total") - coalesce(col("n_stream"), lit(0L))) > 0).as("lossy"))
      .orderBy("bucket")
  }

  /** SCD-type-2 history build over the events feed
    * ([[graft.operators.Temporal.scd2Intervals]]): each user's
    * event_type change log compacted to validity intervals with
    * version numbers — the as-of-queryable dimension-history table
    * next to q_upsert_latest's SCD-1 "latest wins". Oracle replays
    * the same lag-compact + lead-interval windows relationally.
    */
  def scd2Intervals(s: SparkSession, dir: String): DataFrame =
    graft.operators.Temporal.scd2Intervals(
        Relational.events(s, dir), "user_id", "ts", "event_type", "event_id")
      .orderBy("user_id", "version")

  /** Forward as-of join ([[graft.operators.Temporal.asofJoin]] with
    * `forward = true`): for every click, the NEXT purchase by that
    * user — the outcome-labeling / time-to-conversion lookup, the
    * feature-store complement of q_asof_join's backward feature
    * read. Same single-shuffle tagged-union device on the reversed
    * timeline; vs DuckDB's native forward ASOF (`p.ts >= c.ts`).
    */
  def asofForward(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Temporal
    val ev = Relational.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = Temporal.latestPerKeyTs(
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("ts").as("p_ts"),
          col("event_id").as("p_event"), col("value").as("p_value")),
      "user_id", "ts", "p_event")
    Temporal.asofJoin(clicks, purchases, "user_id", "ts",
        Seq("p_ts", "p_event", "p_value"), forward = true)
      .orderBy("event_id")
  }

  /** Full MERGE / changeset apply ([[graft.operators.Upsert
    * .applyChangeset]]): a deterministic change log over the customer
    * snapshot — updates (every 10th key, +1000 balance, seq 1),
    * tombstones (every 7th key, seq 2 — so key%70 is updated THEN
    * deleted and must vanish), and 50 inserts past the max key —
    * folded into the next snapshot by one keyed aggregate. The
    * merge-on-read compaction shape of every table format.
    */
  def mergeChangeset(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Upsert
    val c = Tables.t(s, dir, "customer")
    val mx = broadcast(c.agg(max(col("c_custkey")).as("mx")))
    val updates = c.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        (col("c_acctbal") + 1000).as("c_acctbal"), col("c_mktsegment"),
        lit(1L).as("seq"), lit("upsert").as("op"))
    val deletes = c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), lit(null).cast("string").as("c_name"),
        lit(null).cast("int").as("c_nationkey"), lit(null).cast("double").as("c_acctbal"),
        lit(null).cast("string").as("c_mktsegment"), lit(2L).as("seq"),
        lit("delete").as("op"))
    val inserts = s.range(1, 51).toDF("i").crossJoin(mx)
      .select((col("mx") + col("i")).as("c_custkey"),
        concat(lit("Customer#new"), col("i")).as("c_name"),
        lit(0).cast("int").as("c_nationkey"), lit(0.0).as("c_acctbal"),
        lit("NEW").as("c_mktsegment"), lit(1L).as("seq"), lit("upsert").as("op"))
    Upsert.applyChangeset(c, updates.unionAll(deletes).unionAll(inserts),
        Seq("c_custkey"), "seq", "op")
      .orderBy("c_custkey")
  }

  private val scd2Src = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Spool for [[streamScd2]]: events split into 4 ts-range files
    * (cross-batch event-time order by construction — every real
    * batch boundary exercises the state carry) plus two sentinels
    * past the 45-day hold point, so every key's final open version
    * times out and emits deterministically.
    */
  private def scd2Spool(s: SparkSession, dir: String): String = {
    import graft.streaming.EventStream
    scd2Src.computeIfAbsent(dir, { d =>
      val t = java.nio.file.Files.createTempDirectory("graft-scd2-q")
      sys.addShutdownHook(Pipeline.rmTree(t.toFile))
      val ev = Relational.events(s, d)
      val tdir = java.nio.file.Files.createTempDirectory("graft-scd2-parts")
      ev.repartitionByRange(4, col("ts")).sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(tdir.toString)
      // part files sort by name in range order — rename preserving it
      val parts = tdir.toFile.listFiles.filter(_.getName.startsWith("part-"))
        .sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.move(f.toPath, t.resolve(f"aa-data-$i%02d.parquet"))
      }
      Pipeline.rmTree(tdir.toFile)
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      def sentinel(atMs: Long, name: String): Unit = {
        val row = org.apache.spark.sql.Row(-1L, new java.sql.Timestamp(atMs),
          -1L, "sentinel", 0.0, "{}")
        val sd = java.nio.file.Files.createTempDirectory("graft-scd2-sent")
        s.createDataFrame(java.util.Arrays.asList(row), EventStream.EventSchema)
          .coalesce(1).write.mode("overwrite").parquet(sd.toString)
        val part = sd.toFile.listFiles.find(_.getName.startsWith("part-")).get
        java.nio.file.Files.move(part.toPath, t.resolve(name))
        Pipeline.rmTree(sd.toFile)
      }
      sentinel(maxTs.getTime + 46L * 86400000L, "zz-sentinel-1.parquet")
      sentinel(maxTs.getTime + 47L * 86400000L, "zz-sentinel-2.parquet")
      val t0 = System.currentTimeMillis() - 3600_000L
      val all = t.toFile.listFiles.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      all.zipWithIndex.foreach { case (f, i) => f.setLastModified(t0 + i * 10_000L) }
      t.toString
    })
  }

  /** Streaming SCD-type-2 history ([[graft.streaming.EventStream
    * .scd2]]): the events feed replayed as 4 event-time-ordered
    * batches; closed versions stream out at each attribute change
    * (crossing real batch boundaries), open versions flush on
    * EventTimeTimeout past the hold point — and the result must
    * equal [[scd2Intervals]] row-for-row, so it shares that query's
    * oracle VERBATIM (the funnel/sessionize twin pattern).
    */
  def streamScd2(s: SparkSession, dir: String): DataFrame =
    Replay.ladder(s, scd2Spool(s, dir), graft.streaming.EventStream.EventSchema,
        "graft_stream_scd2")(graft.streaming.EventStream.scd2(s, _))
      .filter(col("user_id") >= 0) // sentinel rows never emit; belt and braces
      .select(col("user_id"), col("event_type"), col("version"),
        expr("timestamp_micros(from_us)").as("valid_from"),
        expr("timestamp_micros(to_us)").as("valid_to"),
        col("is_current"))
      .orderBy("user_id", "version")

  /** Interval-overlap join ([[graft.operators.Temporal
    * .intervalOverlapJoin]]): each user's 30-minute-gap sessions
    * (the graded batch sessionizer's intervals, shared recipe)
    * overlap-joined against daily one-hour maintenance windows
    * derived from the event span — "which sessions were exposed to
    * maintenance, and for how long". Windows are half-open spelled
    * as closed ([day, day+1h−1µs]) so the closed-interval predicate
    * is exact in both engines; overlap_us is exact integer
    * arithmetic. The oracle runs the naive theta join over the SAME
    * shared sessionization CTEs — the bucketed equi-join rewrite
    * must reproduce the all-pairs semantics pair-for-pair.
    */
  def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Sessionize, Temporal}
    val ev = Relational.events(s, dir)
    val sess = Sessionize.sessions(ev, 30)
      .select(col("user_id"), col("start_us"), col("end_us"))
    val wins = ev.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      .select(explode(expr(
        "sequence(date_trunc('DAY', mn), date_trunc('DAY', mx), interval 1 day)")).as("day"))
      .select(unix_micros(col("day")).as("w_start"),
        (unix_micros(col("day")) + lit(3599999999L)).as("w_end"))
    Temporal.intervalOverlapJoin(sess, wins,
        "start_us", "end_us", "w_start", "w_end", bucketUs = 3600000000L)
      .select(col("user_id"), col("start_us"), col("end_us"), col("w_start"),
        (least(col("end_us"), col("w_end")) - greatest(col("start_us"), col("w_start")))
          .as("overlap_us"))
      .orderBy("user_id", "start_us", "w_start")
  }

  /** The NOT IN null landmine, demonstrated as a 3VL trichotomy: the
    * same anti-membership question asked three ways over a
    * NULL-bearing subquery set (BUILDING customers, negative
    * balances mapped to NULL). With a NULL in the set, `NOT IN` can
    * never be TRUE (x <> NULL is UNKNOWN), so the first count is 0 —
    * Spark plans it as a null-aware anti join; filtering the NULLs
    * restores the plain anti join; `NOT EXISTS` is null-insensitive
    * (NULL = x is UNKNOWN ⇒ unmatched ⇒ the row SURVIVES) and agrees
    * with the filtered form. Both engines run the identical ANSI
    * text — the graded artifact is the semantics, not arithmetic.
    */
  def nullAwareAnti(s: SparkSession, dir: String): DataFrame = {
    Relational6.view(s, dir, "customer", "orders")
    s.sql(NullAwareAntiSql)
  }

  private val NullAwareAntiSql = """
      WITH nullable_set AS (
        SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
        FROM customer WHERE c_mktsegment = 'BUILDING')
      SELECT 'not_in_with_nulls' AS variant, count(*) AS n
      FROM orders WHERE o_custkey NOT IN (SELECT k FROM nullable_set)
      UNION ALL
      SELECT 'not_in_nulls_filtered', count(*)
      FROM orders
      WHERE o_custkey NOT IN (SELECT k FROM nullable_set WHERE k IS NOT NULL)
      UNION ALL
      SELECT 'not_exists', count(*)
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM nullable_set ns WHERE ns.k = o.o_custkey)
      ORDER BY variant"""

  // ------------------------------------------------------------ oracles

  private val IntervalJoinOracleSql = s"""
      WITH ${Pipeline.SessionizeCtes},
      sess AS (SELECT user_id, min(tus) AS start_us, max(tus) AS end_us
               FROM g GROUP BY user_id, grp),
      mnx AS (SELECT min(ts) AS mn, max(ts) AS mx FROM events),
      days AS (SELECT unnest(generate_series(date_trunc('day', mn),
                 date_trunc('day', mx), INTERVAL 1 DAY)) AS day FROM mnx),
      wins AS (SELECT epoch_us(day) AS w_start, epoch_us(day) + 3599999999 AS w_end
               FROM days)
      SELECT s.user_id, s.start_us, s.end_us, w.w_start,
             (least(s.end_us, w.w_end) - greatest(s.start_us, w.w_start))::BIGINT
               AS overlap_us
      FROM sess s JOIN wins w
        ON s.start_us <= w.w_end AND w.w_start <= s.end_us
      ORDER BY s.user_id, s.start_us, w.w_start"""

  private val MergeChangesetOracleSql = """
      WITH mx AS (SELECT max(c_custkey) AS mx FROM customer),
      ch AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000 AS c_acctbal,
               c_mktsegment, 1 AS seq, 'upsert' AS op
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey, NULL, NULL, NULL, NULL, 2, 'delete'
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT mx + i, 'Customer#new' || i, 0, 0.0, 'NEW', 1, 'upsert'
        FROM mx, unnest(range(1, 51)) AS t(i)),
      allr AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
               -9223372036854775808 AS seq, 'upsert' AS op FROM customer
        UNION ALL SELECT * FROM ch),
      latest AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
          FROM allr) WHERE rn = 1)
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM latest WHERE op <> 'delete' ORDER BY c_custkey"""

  private val AsofForwardOracleSql = """
      WITH clicks AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
      purch0 AS (
        SELECT user_id, ts, ts AS p_ts, event_id AS p_event, value AS p_value
        FROM events WHERE event_type = 'purchase'),
      purch AS (
        SELECT user_id, ts, p_ts, p_event, p_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY p_event DESC) AS rn
          FROM purch0) WHERE rn = 1)
      SELECT c.event_id, c.user_id, c.ts, c.value,
             p.p_ts AS r_p_ts, p.p_event AS r_p_event, p.p_value AS r_p_value
      FROM clicks c ASOF LEFT JOIN purch p
        ON c.user_id = p.user_id AND p.ts >= c.ts
      ORDER BY c.event_id"""

  /** The SCD2 interval derivation, shared verbatim by the batch,
    * streaming, and point-in-time-join oracles (the shared-fragment
    * device): compaction to change rows, then lead-bounded validity
    * intervals as CTE `v`.
    */
  private[queries] val Scd2Ctes = """
      WITH o AS (SELECT user_id, ts, event_type, event_id,
              lag(event_type) OVER w AS prev,
              row_number() OVER w AS rn
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      c AS (SELECT user_id, ts, event_type, event_id FROM o
            WHERE rn = 1 OR (event_type IS DISTINCT FROM prev)),
      v AS (SELECT user_id, event_type,
              row_number() OVER w2 AS version,
              ts AS valid_from,
              lead(ts) OVER w2 AS valid_to
            FROM c
            WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))"""

  private val Scd2IntervalsOracleSql = Scd2Ctes + """
      SELECT user_id, event_type, version::BIGINT AS version,
             valid_from, valid_to, valid_to IS NULL AS is_current
      FROM v ORDER BY user_id, version"""

  // the oracle DERIVES the watermark semantics independently: the
  // stream must lose exactly the early echoes (closed windows) and
  // keep exactly the recent ones (inside the delay)
  private val StreamLateAuditOracleSql = """
      WITH mnx AS (SELECT min(ts) AS mn, max(ts) AS mx FROM events),
      early AS (SELECT ts FROM events, mnx WHERE ts < mn + INTERVAL 10 MINUTE),
      recent AS (SELECT ts FROM events, mnx WHERE ts > mx - INTERVAL 3 MINUTE
                 AND epoch_us(ts) // 900000000 = epoch_us(mx) // 900000000),
      allv AS (SELECT ts FROM events
               UNION ALL SELECT ts FROM early
               UNION ALL SELECT ts FROM recent),
      tot AS (SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS bucket,
                     count(*) AS n_total FROM allv GROUP BY 1),
      drp AS (SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS bucket,
                     count(*) AS n_dropped FROM early GROUP BY 1)
      SELECT t.bucket, t.n_total::BIGINT AS n_total,
             (t.n_total - COALESCE(d.n_dropped, 0))::BIGINT AS n_stream,
             COALESCE(d.n_dropped, 0)::BIGINT AS n_dropped,
             COALESCE(d.n_dropped, 0) > 0 AS lossy
      FROM tot t LEFT JOIN drp d USING (bucket) ORDER BY t.bucket"""

  // the relational PCM16 decode: byte 2i is the low half, byte 2i+1
  // the high half, two's-complement signing at 32768 — replayed from
  // the hex of the same UTF-8 payload bytes
  private val MmAudioOracleSql = """
      WITH p AS (SELECT doc_id, hex(encode(text)) AS h,
                        octet_length(encode(text)) AS n FROM documents),
      s AS (SELECT doc_id, i AS sample_idx,
              CAST('0x' || substr(h, (2 * i) * 2 + 1, 2) AS INT)
              + 256 * CAST('0x' || substr(h, (2 * i + 1) * 2 + 1, 2) AS INT) AS u16
            FROM p, unnest(range(0, n // 2)) AS t(i)),
      sgn AS (SELECT doc_id, sample_idx,
              CASE WHEN u16 >= 32768 THEN u16 - 65536 ELSE u16 END AS v FROM s)
      SELECT doc_id, (sample_idx // 32)::BIGINT AS window_idx,
             count(*)::BIGINT AS n_samples,
             sum(v * v)::BIGINT AS energy,
             max(abs(v))::BIGINT AS peak
      FROM sgn GROUP BY doc_id, sample_idx // 32
      ORDER BY doc_id, window_idx"""

  private val DedupBoilerplateOracleSql = s"""
      WITH planted AS (
        SELECT doc_id, '$BoilerHeader' || ' ' || text AS text FROM documents),
      all_docs AS (
        SELECT doc_id, text FROM planted
        UNION ALL
        SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id, text
        FROM planted WHERE doc_id % 20 = 0),
      words AS (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs),
      segs AS (
        SELECT doc_id, unnest(range(0, (len(w) + 19) // 20)) AS seg_idx, w
        FROM words),
      seg2 AS (
        SELECT doc_id, seg_idx,
               array_to_string(w[(seg_idx * 20 + 1):(seg_idx * 20 + 20)], ' ') AS seg
        FROM segs),
      hot AS (
        SELECT md5(seg) AS h FROM seg2
        GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
      flagged AS (
        SELECT s.doc_id, s.seg_idx, s.seg, (h.h IS NOT NULL) AS boiler
        FROM seg2 s LEFT JOIN hot h ON md5(s.seg) = h.h)
      SELECT doc_id,
             count(*)::BIGINT AS n_segs,
             (count(*) FILTER (boiler))::BIGINT AS n_removed,
             md5(coalesce(string_agg(CASE WHEN NOT boiler THEN seg END, ' '
               ORDER BY seg_idx), '')) AS kept_hash
      FROM flagged GROUP BY doc_id ORDER BY doc_id"""

  private val TextVocabCoverageOracleSql = """
      WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
      freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
      tot AS (SELECT count(*)::BIGINT AS n_types, sum(cnt)::BIGINT AS total_tokens
              FROM freq),
      ranked AS (
        SELECT token, cnt::BIGINT AS cnt,
               row_number() OVER (ORDER BY cnt DESC, token ASC) AS vocab_rank,
               sum(cnt) OVER (ORDER BY cnt DESC, token ASC
                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM freq)
      SELECT vocab_rank::BIGINT AS vocab_rank, token, cnt,
             cum_tokens::BIGINT AS cum_tokens,
             ((cum_tokens * 1000000000) // total_tokens)::BIGINT AS coverage_ppb,
             n_types, total_tokens
      FROM ranked, tot
      WHERE vocab_rank IN (1, 3, 10, 30)
      ORDER BY vocab_rank"""

  private val TextBpePairsOracleSql = """
      WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      wc AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
      pairs AS (
        SELECT w[i:i + 1] AS pair, cnt
        FROM wc, unnest(range(1, length(w))) AS t(i)
        WHERE length(w) >= 2)
      SELECT pair, sum(cnt)::BIGINT AS freq FROM pairs GROUP BY pair
      ORDER BY freq DESC, pair ASC LIMIT 20"""

  private val LengthBucketsOracleSql = """
      WITH d AS (SELECT len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
      b AS (SELECT n_tok, ((n_tok + 31) // 32) * 32 AS bucket_max FROM d)
      SELECT bucket_max::BIGINT AS bucket_max, count(*)::BIGINT AS n_docs,
             sum(n_tok)::BIGINT AS sum_tok,
             (bucket_max * count(*) - sum(n_tok))::BIGINT AS pad_waste,
             ((sum(n_tok) * 1000000000) // (bucket_max * count(*)))::BIGINT AS fill_ppb
      FROM b GROUP BY bucket_max ORDER BY bucket_max"""

  // score-for-score and rule-for-rule replay through the SHARED
  // fragments; the decile cut is the exact-rank formula over the
  // (score desc, doc_id asc) total order
  private val QualityCalibrationOracleSql = s"""
      WITH ${Pipeline.QualityCtes},
      ${Pipeline2.GopherCtes},
      j AS (SELECT q.doc_id, q.quality AS score, g.gkeep AS flag
            FROM qual q JOIN gk g USING (doc_id)),
      r AS (SELECT doc_id, score, flag,
              row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn,
              count(*) OVER () AS n
            FROM j)
      SELECT (((rn - 1) * 10) // n)::BIGINT AS bin,
             count(*)::BIGINT AS n_docs,
             (count(*) FILTER (flag))::BIGINT AS n_flagged,
             (((count(*) FILTER (flag)) * 1000000000) // count(*))::BIGINT AS flag_ppb,
             min(score) AS min_score,
             max(score) AS max_score
      FROM r GROUP BY 1 ORDER BY bin"""

  // the report replayed from the SAME shared cluster + quality + keep
  // fragments the individually-graded queries use, rolled up per stratum
  private val DedupReportOracleSql = s"""
      WITH RECURSIVE ${Pipeline.ClusterClosureCtes},
      ${Pipeline.QualityCtes},
      k AS (SELECT l.doc_id, l.cluster_id, qual.quality FROM lab l JOIN qual USING (doc_id)),
      r AS (SELECT doc_id, cluster_id,
              first_value(doc_id) OVER (PARTITION BY cluster_id
                ORDER BY quality DESC, doc_id ASC) AS keep_id
            FROM k),
      j AS (SELECT d.doc_id, d.lang, d.source,
              CASE WHEN r.doc_id IS NULL THEN NULL
                   ELSE r.doc_id = r.keep_id END AS is_kept
            FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id)
      SELECT lang, source,
             count(*)::BIGINT AS n_docs,
             (count(*) FILTER (is_kept IS NOT NULL))::BIGINT AS n_clustered,
             (count(*) FILTER (is_kept = false))::BIGINT AS n_removed,
             (((count(*) FILTER (is_kept = false)) * 1000000000) // count(*))::BIGINT
               AS removed_ppb
      FROM j GROUP BY lang, source ORDER BY lang, source"""

  private val StreamDistinctSketchOracleSql = """
      SELECT event_type, count(*)::BIGINT AS n_events,
             count(DISTINCT user_id)::BIGINT AS exact_users,
             true AS est_within_2pct
      FROM events GROUP BY event_type ORDER BY event_type"""

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The DuckDB replay of [[dedupBandPlanning]]: the identical
    * left-fold floor-multiply chains via `list_reduce` (same count,
    * same order, same BIGINT floor division — digit-exact), config
    * list generated from [[Dedup.BandPlanConfigs]] so planner and
    * oracle share one design space.
    */
  private def BandPlanOracleSql: String = {
    val cfgVals = Dedup.BandPlanConfigs.map { case (b, r) => s"($b, $r)" }.mkString(", ")
    s"""
      WITH cfg(nb, nr) AS (VALUES $cfgVals),
      grid AS (SELECT CAST(i * 50000000 AS BIGINT) AS s_ppb FROM range(1, 20) t(i)),
      x AS (SELECT CAST(nb AS BIGINT) AS n_bands, CAST(nr AS BIGINT) AS n_rows, s_ppb,
          list_reduce(list_prepend(s_ppb, list_transform(range(2, nr + 1), i -> s_ppb)),
            (acc, q) -> (acc * q) // 1000000000) AS sr_ppb
        FROM cfg, grid),
      y AS (SELECT n_bands, n_rows, s_ppb, sr_ppb,
          1000000000 - list_reduce(
            list_prepend(CAST(1000000000 AS BIGINT),
              list_transform(range(1, n_bands + 1), i -> 1000000000 - sr_ppb)),
            (acc, q) -> (acc * q) // 1000000000) AS collide_ppb
        FROM x)
      SELECT n_bands, n_rows, s_ppb, sr_ppb, collide_ppb,
        CAST(sum(CASE WHEN s_ppb = 800000000 THEN collide_ppb END)
          OVER (PARTITION BY n_bands, n_rows) AS BIGINT) AS collide_at_t_ppb,
        CAST(sum(CASE WHEN s_ppb < 800000000 THEN collide_ppb ELSE 0 END)
          OVER (PARTITION BY n_bands, n_rows) AS BIGINT) AS fp_area,
        CAST(sum(CASE WHEN s_ppb >= 800000000 THEN 1000000000 - collide_ppb ELSE 0 END)
          OVER (PARTITION BY n_bands, n_rows) AS BIGINT) AS fn_area
      FROM y ORDER BY n_bands, n_rows, s_ppb"""
  }

  /** LSH band planning ([[Dedup.bandPlan]]) — the exact analytic
    * collision-probability sweep over [[Dedup.BandPlanConfigs]]
    * (which includes the shipped 32×4 minhash configuration by
    * reference) at the pipeline's 0.8 threshold.
    */
  def dedupBandPlanning(s: SparkSession, dir: String): DataFrame =
    Dedup.bandPlan(s).orderBy("n_bands", "n_rows", "s_ppb")

  /** The DuckDB replay of [[textBpeApply]]'s ENCODING: rebuild every
    * type's delimited character segmentation (chr(30)/chr(31) — the
    * [[TextAnalysis.BpeOpen]] wrapping), apply the side-channeled
    * merge table as a generated nested `replace` chain (identical
    * left-to-right non-overlap semantics on both engines), count
    * pieces as open-mark occurrences, and roll up per language.
    * Induction itself stays Spark-side by contract — what the oracle
    * proves is that the encoding under the learned table is exact.
    */
  private def TextBpeApplyOracleSql: String =
    bpeEncodeOracleSql(lastBpeMerges.get().getOrElse(Seq.empty))

  private def TextBpeBatchedOracleSql: String =
    bpeEncodeOracleSql(lastBpeBatchedMerges.get().getOrElse(Seq.empty))

  private def bpeEncodeOracleSql(merges: Seq[(String, String)]): String = {
    val seg0 = "array_to_string(list_transform(range(1, length(w) + 1), " +
      "i -> chr(30) || substr(w, CAST(i AS INTEGER), 1) || chr(31)), '')"
    val seg = merges.foldLeft(seg0) { case (e, (a, b)) =>
      s"replace($e, chr(30) || ${sqlQuote(a)} || chr(31) || chr(30) || ${sqlQuote(b)} || chr(31), " +
        s"chr(30) || ${sqlQuote(a + b)} || chr(31))"
    }
    s"""
      WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
      tw AS MATERIALIZED (SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt
            FROM tok WHERE length(w) >= 1 GROUP BY lang, w),
      sg AS (SELECT lang, cnt, $seg AS seg FROM tw),
      np AS (SELECT lang, cnt,
              CAST(length(seg) - length(replace(seg, chr(30), '')) AS BIGINT) AS n_pieces
            FROM sg)
      SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(cnt * n_pieces) AS BIGINT) AS n_pieces,
             CAST(${Num.ppbSql("sum(cnt * n_pieces)", "sum(cnt)", "//")} AS BIGINT)
               AS pieces_per_token_ppb
      FROM np GROUP BY lang ORDER BY lang"""
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_boilerplate" -> (dedupBoilerplate _),
    "q_text_vocab_coverage" -> (textVocabCoverage _),
    "q_text_vocab_spectrum" -> (textVocabSpectrum _),
    "q_text_lexical_diversity" -> (textLexicalDiversity _),
    "q_text_fertility" -> (textFertility _),
    "q_text_bpe_pairs" -> (textBpePairs _),
    "q_text_bpe_apply" -> (textBpeApply _),
    "q_text_bpe_batched" -> (textBpeBatched _),
    "q_text_unigram_lm" -> (textUnigramLm _),
    "q_text_unigram_ambiguity" -> (textUnigramAmbiguity _),
    "q_text_tokenize_budget" -> (textTokenizeBudget _),
    "q_text_pii" -> (textPii _),
    "q_text_nb_langid" -> (textNbLangid _),
    "q_text_nb_calibration" -> (textNbCalibration _),
    "q_text_dict_tags" -> (textDictTags _),
    "q_text_dict_tags_ci" -> (textDictTagsCi _),
    "q_text_dict_policy" -> (textDictPolicy _),
    "q_text_wordpiece" -> (textWordpiece _),
    "q_dedup_band_planning" -> (dedupBandPlanning _),
    "q_length_buckets" -> (lengthBuckets _),
    "q_quality_calibration" -> (qualityCalibration _),
    "q_stream_heavy_hitters" -> (streamHeavyHitters _),
    "q_dedup_report" -> (dedupReport _),
    "q_dedup_source_matrix" -> (dedupSourceMatrix _),
    "q_stream_distinct_sketch" -> (streamDistinctSketch _),
    "q_stream_cms" -> (streamCms _),
    "q_mm_audio" -> (mmAudio _),
    "q_stream_late_audit" -> (streamLateAudit _),
    "q_scd2_intervals" -> (scd2Intervals _),
    "q_asof_forward" -> (asofForward _),
    "q_merge_changeset" -> (mergeChangeset _),
    "q_stream_scd2" -> (streamScd2 _),
    "q_interval_join" -> (intervalJoin _),
    "q_null_aware_anti" -> (nullAwareAnti _))

  /** A `def`, not a `val`: the q_text_bpe_apply entry inlines the
    * side-channeled merge table, so the map must be rebuilt when
    * Verify reads it AFTER the queries ran (the [[Pipeline]]
    * trained-IVF contract).
    */
  def oracle: Map[String, String] = Map(
    "q_text_bpe_apply" -> TextBpeApplyOracleSql,
    "q_text_bpe_batched" -> TextBpeBatchedOracleSql,
    "q_text_unigram_lm" -> TextUnigramOracleSql,
    "q_text_unigram_ambiguity" -> TextUnigramAmbiguityOracleSql,
    "q_text_tokenize_budget" -> TextTokenizeBudgetOracleSql,
    "q_text_pii" -> TextPiiOracleSql,
    "q_text_nb_langid" -> TextNbLangidOracleSql,
    "q_text_nb_calibration" -> TextNbCalibrationOracleSql,
    "q_text_dict_tags" -> TextDictTagsOracleSql,
    "q_text_dict_tags_ci" -> TextDictTagsCiOracleSql,
    "q_text_dict_policy" -> TextDictPolicyOracleSql,
    "q_text_wordpiece" -> TextWordpieceOracleSql,
    "q_dedup_band_planning" -> BandPlanOracleSql,
    "q_dedup_boilerplate" -> DedupBoilerplateOracleSql,
    "q_text_vocab_coverage" -> TextVocabCoverageOracleSql,
    "q_text_vocab_spectrum" -> TextVocabSpectrumOracleSql,
    "q_text_lexical_diversity" -> TextLexicalDiversityOracleSql,
    "q_text_fertility" -> TextFertilityOracleSql,
    "q_text_bpe_pairs" -> TextBpePairsOracleSql,
    "q_length_buckets" -> LengthBucketsOracleSql,
    "q_quality_calibration" -> QualityCalibrationOracleSql,
    "q_stream_heavy_hitters" -> Relational6.HeavyHittersOracleSql,
    "q_dedup_report" -> DedupReportOracleSql,
    "q_dedup_source_matrix" -> DedupSourceMatrixOracleSql,
    "q_stream_distinct_sketch" -> StreamDistinctSketchOracleSql,
    "q_stream_cms" -> streamCmsOracleSql,
    "q_mm_audio" -> MmAudioOracleSql,
    "q_stream_late_audit" -> StreamLateAuditOracleSql,
    "q_scd2_intervals" -> Scd2IntervalsOracleSql,
    "q_asof_forward" -> AsofForwardOracleSql,
    "q_merge_changeset" -> MergeChangesetOracleSql,
    // the streamed twin must equal the batch SCD2 build row-for-row
    "q_stream_scd2" -> Scd2IntervalsOracleSql,
    "q_interval_join" -> IntervalJoinOracleSql,
    // identical ANSI text on both engines — the semantics ARE the test
    "q_null_aware_anti" -> NullAwareAntiSql)
}
