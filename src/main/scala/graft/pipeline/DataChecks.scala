package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the Deequ / dbt-test shape): a
  * constraint suite evaluated as a single report of
  * (check_name, n_violations) rows.
  *
  * Scale shape is the whole point:
  *  - all row-predicate checks on one table FUSE into ONE scan of
  *    conditional aggregates (`sum(if(violated, 1, 0))`) — adding a
  *    check costs an expression, not a pass;
  *  - uniqueness is a groupBy on the key with count > 1 (partial
  *    aggregation bounds the shuffle by key cardinality);
  *  - referential integrity is a left-anti join, broadcast when the
  *    referenced key set is dimension-sized.
  * The report is a union of tiny (1-row) aggregates, so the job's
  * cost is one pass over each fact table regardless of suite size.
  */
object DataChecks {

  /** One fused scan: each (name, violation-predicate) pair becomes a
    * conditional count over the same table.
    */
  def rowChecks(table: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val aggs = checks.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(name)
    }
    val wide = table.agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row wide aggregate into (check_name, n_violations)
    val stacked = checks.map { case (name, _) => s"'$name', `$name`" }.mkString(", ")
    wide.selectExpr(s"stack(${checks.size}, $stacked) AS (check_name, n_violations)")
  }

  /** Duplicate-key violations: number of EXTRA rows per duplicated
    * key, summed (0 when the key is unique).
    */
  def uniquenessCheck(table: DataFrame, name: String, key: String): DataFrame =
    table.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Referential-integrity violations: child rows whose NON-NULL
    * foreign key has no match in the parent key set (anti join;
    * Catalyst broadcasts the parent side when it is small).
    *
    * NULL child keys are excluded by contract — SQL's null semantics
    * make every formulation disagree on them otherwise (a left-anti
    * join counts them as violations, `NOT IN` silently drops them and
    * returns zero rows if the parent set contains a NULL, `NOT
    * EXISTS` counts them) — so "is the FK allowed to be null" is a
    * separate [[rowChecks]] null check, and this check answers only
    * "does every present key resolve".
    */
  def fkCheck(child: DataFrame, childKey: String, parent: DataFrame, parentKey: String,
      name: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey)), col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))
}
