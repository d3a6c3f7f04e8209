package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpec {

  private def embs = spark.read.parquet(s"$Sf/embeddings.parquet")

  // the declarative formulation FloatVectorDot replaces — used as the
  // bit-compatibility reference (same sequential double accumulation)
  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"

  test("codegen FloatVectorDot is bit-identical to the zip_with/aggregate dot") {
    val a = embs.select(col("vec_id").as("ia"), col("embedding").as("a"))
    val b = embs.select(col("vec_id").as("ib"), col("embedding").as("b"))
    val pairs = a.join(b, col("ia") < col("ib") && col("ib") < col("ia") + 20)
    val mismatch = pairs
      .select(Vectors.dot("a", "b").as("fast"), expr(hofDot).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(mismatch.count() === 0)
  }

  test("dot of a vector with itself is its squared norm, and codegen path is exercised") {
    val d = embs.select(col("embedding").as("a"), col("embedding").as("b"))
      .select(Vectors.dot("a", "b").as("sq"), Vectors.norm("a").as("n"))
    assert(d.filter(abs(col("sq") - col("n") * col("n")) > 1e-12).count() === 0)
    // whole-stage codegen compiles the expression (no fallback):
    // the `*(n)` prefix marks a WholeStageCodegen stage containing it
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [float_vector_dot"), plan)
  }

  test("null vector yields null dot") {
    val df = spark.sql(
      "SELECT CAST(NULL AS ARRAY<FLOAT>) AS a, array(CAST(1.0 AS FLOAT)) AS b")
    assert(df.select(Vectors.dot("a", "b")).head().isNullAt(0))
  }
}
