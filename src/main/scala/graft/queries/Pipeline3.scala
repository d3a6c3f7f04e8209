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

  /** One BPE induction round ([[TextAnalysis.bpePairStats]]): top-20
    * adjacent character pairs weighted by word frequency — the next-
    * merge statistic of byte-pair tokenizer training.
    */
  def textBpePairs(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpePairStats(docs(s, dir), 20)
      .orderBy(col("freq").desc, col("pair").asc)

  /** Length-bucketed batching report ([[Corpus.lengthBuckets]]):
    * pad-to-multiple-of-32 buckets with exact integer fill ratios.
    */
  def lengthBuckets(s: SparkSession, dir: String): DataFrame =
    Corpus.lengthBuckets(docs(s, dir)).orderBy("bucket_max")

  // ------------------------------------------------------------ oracles

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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_boilerplate" -> (dedupBoilerplate _),
    "q_text_vocab_coverage" -> (textVocabCoverage _),
    "q_text_bpe_pairs" -> (textBpePairs _),
    "q_length_buckets" -> (lengthBuckets _))

  val oracle: Map[String, String] = Map(
    "q_dedup_boilerplate" -> DedupBoilerplateOracleSql,
    "q_text_vocab_coverage" -> TextVocabCoverageOracleSql,
    "q_text_bpe_pairs" -> TextBpePairsOracleSql,
    "q_length_buckets" -> LengthBucketsOracleSql)
}
