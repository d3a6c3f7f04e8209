package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators the reference lacks (SURVEY §2.3 flags as-of
  * join as absent from DataFusion 44) but a time-keyed pipeline
  * needs.
  *
  * Implemented by composition (SURVEY §7.3 preference tier (a)): the
  * tagged-union + last-non-null-window rewrite. Both sides are
  * unioned with a side tag, sorted within each key partition by
  * (ts, tag) — right rows sort before left rows at equal timestamps
  * so `<=` matches — and each left row reads the latest preceding
  * right values via `last(_, ignoreNulls = true)` over an unbounded
  * preceding frame.
  *
  * Scale: exactly ONE shuffle (hash by key for the window), state is
  * a single carried value per column — the same asymptotics as a
  * native sort-merge as-of operator, with AQE/skew handling for
  * free. This is why tier (a) beats a custom SparkPlan here: the
  * semantics are expressible, so the optimizer stays in charge.
  */
object Temporal {

  /** Left as-of join: for each left row, the right row with the
    * greatest `tsCol` ≤ left's `tsCol`, within the same `keyCol`.
    * `rightVals` are the right-side columns to carry. Right side
    * must be unique per (key, ts) — pre-dedup if not (see
    * [[latestPerKeyTs]]).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightVals: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .select((lCols.map(col) :+ col("__side")) ++ rightVals.map(c => lit(null).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(
        (lCols.map(c =>
          if (c == keyCol || c == tsCol) col(c) else lit(null).cast(left.schema(c).dataType).as(c))
          :+ col("__side")) ++ rightVals.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionAll(r)
      .select(
        (lCols.map(col) :+ col("__side")) ++
          rightVals.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"r_$c")): _*)
    carried.filter(col("__side") === 1).drop("__side")
  }

  /** Deduplicate a time-keyed side to one row per (key, ts), keeping
    * the row with the greatest tiebreak column — makes as-of
    * matching deterministic when timestamps can collide.
    */
  def latestPerKeyTs(df: DataFrame, keyCol: String, tsCol: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol), col(tsCol)).orderBy(col(tiebreak).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
