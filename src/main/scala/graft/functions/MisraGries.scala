package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Mergeable Misra-Gries heavy-hitter sketch (typed UDAF): one pass,
  * at most `k` counters per partial, no shuffle of raw keys — the
  * bounded-memory answer to "which tokens dominate 100 TB" where an
  * exact groupBy would shuffle every distinct key. The reference has
  * no frequency sketch; Spark SQL ships HLL++ and quantile sketches
  * but no heavy-hitter summary, so this fills the family out.
  *
  * Contract (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): for stream length n, every
  * estimate satisfies `true - n/(k+1) <= est <= true`, and every key
  * with true frequency > n/(k+1) is PRESENT in the summary —
  * regardless of partitioning or merge order. Those two theorems are
  * exactly what q_heavy_hitters grades (the same
  * sketch-values-are-internal / sketch-contracts-are-graded design
  * as q_agg_approx).
  *
  * reduce: increment; on overflow past k counters, subtract the
  * current minimum from all (the batched form of MG's decrement-all)
  * and drop zeros. merge: pointwise sum, then subtract the (k+1)-th
  * largest count and drop non-positives — the PODS'12 merge that
  * preserves the additive error bound.
  */
class MisraGries(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
  require(k > 0, "k must be positive")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(m: mutable.Map[String, Long], tok: String): mutable.Map[String, Long] = {
    if (tok != null) {
      m.update(tok, m.getOrElse(tok, 0L) + 1L)
      if (m.size > k) shrink(m)
    }
    m
  }

  override def merge(
      a: mutable.Map[String, Long],
      b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (tok, c) => a.update(tok, a.getOrElse(tok, 0L) + c) }
    if (a.size > k) shrink(a)
    a
  }

  /** Subtract the (k+1)-th largest count from every counter and drop
    * the non-positive ones — leaves at most k counters and charges
    * every surviving estimate the same decrement the dropped ones
    * absorbed, which is what keeps the additive bound at n/(k+1).
    */
  private def shrink(m: mutable.Map[String, Long]): Unit = {
    val counts = m.values.toArray
    java.util.Arrays.sort(counts)
    val t = counts(counts.length - (k + 1)) // (k+1)-th largest
    val dead = m.collect { case (tok, c) if c - t <= 0 => tok }.toList
    dead.foreach(m.remove)
    m.mapValuesInPlace((_, c) => c - t)
    ()
  }

  override def finish(m: mutable.Map[String, Long]): Map[String, Long] = m.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
