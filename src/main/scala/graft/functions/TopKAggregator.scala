package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Typed UDAF (SURVEY §2.11 surface): bounded top-k by score within a
  * group, as a single partial-aggregating pass — the shuffle carries
  * at most k (score, id) pairs per group instead of every candidate
  * row, which is the scalable alternative to
  * `row_number().over(window)` when groups are huge (a window sorts
  * the whole partition; this keeps a k-element heap).
  *
  * Register with `functions.udaf(new TopKAggregator(k))` or use via
  * [[graft.pipeline.Similarity.bruteForceTopKAgg]].
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), mutable.PriorityQueue[(Double, Long)], Seq[(Double, Long)]] {

  // min-heap by (score, then id desc) so the worst kept element is on top;
  // final output is descending score with ascending-id tiebreak
  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](ord)

  override def reduce(
      heap: mutable.PriorityQueue[(Double, Long)],
      row: (Double, Long)): mutable.PriorityQueue[(Double, Long)] = {
    heap.enqueue(row)
    while (heap.size > k) heap.dequeue()
    heap
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(a.enqueue(_))
    while (a.size > k) a.dequeue()
    a
  }

  override def finish(heap: mutable.PriorityQueue[(Double, Long)]): Seq[(Double, Long)] =
    heap.toSeq.sortBy { case (s, id) => (-s, id) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
