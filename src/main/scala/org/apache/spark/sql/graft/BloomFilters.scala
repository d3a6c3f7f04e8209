// Hosted under org.apache.spark.sql for the private[sql] typing API —
// see FloatVectorDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column-API bridge to Spark's internal Bloom-filter pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the
  * machinery behind runtime row-group filtering, not registered in
  * the SQL function catalog). Used by the scale path of eval-set
  * decontamination ([[graft.pipeline.TextAnalysis.decontaminateBloom]]):
  * build one compact bloom over the eval grams, prune the exploded
  * train grams inside the scan stage, verify exactly after. The
  * probe expression is codegen'd; the aggregate's state is the
  * sketch bytes (size set by `numBits`), mergeable map-side like any
  * partial aggregate.
  */
object BloomFilters {

  /** Aggregate a LongType column into a serialized bloom filter
    * (one binary row). `estimatedItems` sizes the hash count;
    * `numBits` fixes the sketch size — both are explicit because the
    * 100 TB caller budgets the broadcast, not a heuristic.
    */
  def agg(child: Column, estimatedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(ExpressionUtils.expression(child),
        Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a serialized bloom — false positives
    * at the configured rate, never false negatives (the property the
    * exact-verify contract rides on).
    */
  def mightContain(bloom: Column, value: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(value)))
}
