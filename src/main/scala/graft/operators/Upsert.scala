package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Latest-wins merge (CDC / SCD-1 compaction): collapse a union of
  * snapshot + change rows to the newest version of each key — the
  * standard shape for maintaining a mutable table on immutable
  * storage (what table formats run as "merge on read" compaction).
  * The reference has no mutation surface at all
  * (`/root/reference/csvb_engine/src/lib.rs:87-89` only appends), so
  * this is a pipeline extra in the SURVEY §2.12 sense.
  */
object Upsert {

  /** Keep the newest row per key, ordered by `orderCols`
    * lexicographically (version, then tie-breakers).
    *
    * Executed as `max_by(struct(all columns), struct(orderCols))` —
    * a hash aggregate, NOT a `row_number()` window: the aggregate
    * partial-combines map-side, so the shuffle carries one surviving
    * row per (key, input partition) instead of every version of
    * every key, and there is no per-partition sort at all. At 100 TB
    * with a long change history per key that is the difference
    * between shuffling the history and shuffling the table.
    *
    * Ties across ALL `orderCols` are resolved by Spark's struct
    * comparison picking one row nondeterministically — pass a unique
    * tie-breaker (e.g. a change-log sequence number) when versions
    * can collide.
    */
  def latestWins(rows: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val valueCols = rows.columns.filterNot(keys.contains)
    val payload = struct(valueCols.toIndexedSeq.map(col): _*)
    rows
      .groupBy(keys.map(col): _*)
      .agg(max_by(payload, struct(orderCols: _*)).as("__latest"))
      .select(keys.map(col) ++ valueCols.map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** Full MERGE / changeset apply with tombstones: fold a change log
    * (`opCol` ∈ {"upsert", "delete"}, ordered by `seqCol` per key)
    * into a base snapshot and emit the next snapshot — updates
    * replace, inserts appear, deletes drop the key, and a key's fate
    * is decided by its LATEST change (a delete after an update
    * deletes; an upsert after a delete resurrects). This is the
    * merge-on-read compaction every table format (Delta/Iceberg/Hudi
    * shape) runs over immutable storage; [[latestWins]] is its
    * tombstone-free special case and does the heavy lifting here.
    *
    * Scale shape: one union + one partial-combining keyed aggregate —
    * the shuffle carries one surviving candidate per (key, partition),
    * never the history; the tombstone filter is a post-aggregate
    * projection, so deleted keys cost one aggregate row, not a join.
    * Snapshot rows enter at `Long.MinValue` sequence — any real
    * change outranks them; `changes` must carry unique (key, seq)
    * pairs (a change-log sequence number does).
    */
  def applyChangeset(snapshot: DataFrame, changes: DataFrame,
      keys: Seq[String], seqCol: String, opCol: String): DataFrame = {
    val snap = snapshot
      .withColumn(seqCol, lit(Long.MinValue))
      .withColumn(opCol, lit("upsert"))
      .select(changes.columns.map(col): _*) // align column order
    latestWins(snap.unionAll(changes), keys, Seq(col(seqCol)))
      .filter(col(opCol) =!= "delete")
      .drop(seqCol, opCol)
  }
}
