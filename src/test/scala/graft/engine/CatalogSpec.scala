package graft.engine

import graft.SparkSpec

/** Catalog introspection through the single SQL delegation point —
  * the counterpart of the reference enabling `information_schema`
  * on its session (`/root/reference/csvb_engine/src/lib.rs:22`).
  */
class CatalogSpec extends SparkSpec {

  test("SHOW TABLES lists registered tables") {
    Core.addParquetTable(spark, "cat_nation", Seq(s"$Sf/nation.parquet"))
    val shown = Core.execute(spark, "SHOW TABLES")
      .collect().map(_.getString(1))
    assert(shown.contains("cat_nation"))
    assert(spark.catalog.tableExists("cat_nation"))
  }

  test("DESCRIBE TABLE exposes the schema") {
    val df = Core.addParquetTable(spark, "cat_nation", Seq(s"$Sf/nation.parquet"))
    val desc = Core.execute(spark, "DESCRIBE TABLE cat_nation")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    df.schema.fields.foreach { f =>
      assert(desc.contains(f.name), s"missing ${f.name}")
      assert(desc(f.name) === f.dataType.simpleString)
    }
  }

  test("SHOW COLUMNS matches the DataFrame columns") {
    val df = Core.addParquetTable(spark, "cat_nation", Seq(s"$Sf/nation.parquet"))
    val cols = Core.execute(spark, "SHOW COLUMNS IN cat_nation")
      .collect().map(_.getString(0)).toSet
    assert(cols === df.columns.toSet)
  }
}
