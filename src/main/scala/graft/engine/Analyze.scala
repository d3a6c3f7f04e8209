package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** `EXPLAIN ANALYZE` analog — the reference reaches DataFusion's
  * runtime-metrics explain through its single SQL delegation point
  * (`/root/reference/csvb_engine/src/lib.rs:87-89`); Spark's
  * equivalent signal lives on the EXECUTED plan's SQLMetrics, which
  * this surfaces as a per-operator report after running the query
  * exactly once.
  *
  * Execution contract: the query streams through `toLocalIterator`
  * (one partition resident at a time — the same bounded-memory
  * discipline as [[PgWire]]'s result path), the first `maxRows` rows
  * are CAPTURED for display from that same pass, and the metrics are
  * read from the very QueryExecution that produced them. Running
  * display and analysis as separate actions would double-count scan
  * metrics (SQLMetrics accumulate across actions on one Dataset).
  *
  * Report scope — the metrics a 100 TB operator actually tunes by:
  * scans (files read post-pruning, rows delivered post row-group
  * skipping), exchanges (shuffle bytes/records — the scale
  * bottleneck), aggregates/joins/sorts (output rows, peak memory,
  * spill). Metric keys are matched by name, so the report degrades
  * gracefully across Spark versions rather than breaking.
  */
object Analyze {

  /** Interesting metric keys, in display order. */
  private val Keys = Seq(
    "numFiles", "filesSize", "numOutputRows", "numPartitions",
    "dataSize", "shuffleBytesWritten", "shuffleRecordsWritten",
    "recordsRead", "peakMemory", "spillSize", "numTasks")

  /** Run `df` once; return (captured head rows, total row count,
    * metrics report).
    */
  def run(df: DataFrame, maxRows: Int): (Seq[Row], Long, String) = {
    val it = df.toLocalIterator()
    val head = scala.collection.mutable.ArrayBuffer.empty[Row]
    var n = 0L
    while (it.hasNext) {
      val r = it.next()
      if (n < maxRows) head += r
      n += 1
    }
    (head.toSeq, n, report(df.queryExecution.executedPlan))
  }

  /** Per-operator metric lines for an ALREADY-EXECUTED plan. AQE
    * wraps every materialized stage in a LEAF QueryStageExec
    * (Result/Shuffle/Broadcast) whose real subtree hangs off `.plan`
    * — `children` alone would see an empty tree, so the walk unwraps
    * stages (and reused exchanges) before descending.
    */
  def report(executed: SparkPlan): String = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    @annotation.tailrec
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => unwrap(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => unwrap(r.child)
      case other => other
    }
    def walk(p: SparkPlan, depth: Int): Unit = {
      val node = unwrap(p)
      val shown = Keys.flatMap { k =>
        node.metrics.get(k).map(m => s"$k=${m.value}")
      }
      if (shown.nonEmpty) lines += ("  " * depth) + node.nodeName + ": " + shown.mkString(" ")
      // scalar/IN subqueries hang off expressions, not children —
      // their scans/aggregates executed too and carry metrics. The
      // header only prints when the subtree contributed lines (same
      // gating as every node line — no dangling labels)
      node.subqueries.foreach { sq =>
        val mark = lines.size
        lines += ("  " * (depth + 1)) + "Subquery:"
        walk(sq, depth + 2)
        if (lines.size == mark + 1) lines.remove(mark)
      }
      node.children.foreach(walk(_, depth + 1))
    }
    walk(executed, 0)
    if (lines.isEmpty) "(no runtime metrics on this plan)" else lines.mkString("\n")
  }
}
