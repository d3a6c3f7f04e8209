package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming deduplication — continuous-ingestion novelty detection,
  * the streaming composition of the batch dedup tier
  * ([[graft.pipeline.Dedup]]): documents arrive as an unbounded
  * stream and each is labeled AT ARRIVAL with the canonical id of its
  * exact-content group (the minimum doc_id seen so far for that
  * content hash). This is the operator a training-data pipeline runs
  * at ingest: "is this document new, and if not, which keeper does it
  * duplicate" — without re-running batch dedup over the full corpus
  * per increment.
  *
  * Scale shape: state is keyed by content hash — one Long per
  * DISTINCT document ever seen, partitioned by the hash across the
  * cluster (RocksDB-backed beyond heap). Each micro-batch shuffles
  * only its own rows (hash groupByKey), touches only the groups it
  * contains, and emits exactly its own rows labeled. Nothing is
  * quadratic and nothing reprocesses history — the canonical
  * incremental-dedup contract. Spark's built-in
  * `dropDuplicates("h")` covers the drop-only case; keeping the
  * (doc_id → canon_id) mapping for lineage is why this is
  * flatMapGroupsWithState.
  *
  * Determinism contract (what the oracle replays relationally): with
  * a replay spool ordered by doc_id (earlier batches hold smaller
  * ids), the at-arrival canonical id equals the GLOBAL group minimum,
  * so `min(doc_id) OVER (PARTITION BY md5(text))` reproduces the
  * stream's output exactly. Within a batch the group's rows are
  * sorted before labeling, so iterator order never leaks in.
  */
object DedupStream {

  /** Spool schema for the graded replay (slim: hash input + id). */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Label every arriving doc with its exact-content group's
    * canonical (minimum-seen) doc_id. Output: (doc_id, canon_id);
    * `doc_id === canon_id` means "first sighting, keep".
    */
  def exactDedup(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(md5(col("text")).as("h"), col("doc_id").cast("long").as("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          val ids = rows.map(_._2).toVector.sorted
          val canon = state.getOption.fold(ids.head)(c => math.min(c, ids.head))
          state.update(canon)
          ids.iterator.map(id => (id, canon))
      }
      .toDF("doc_id", "canon_id")
  }
}
