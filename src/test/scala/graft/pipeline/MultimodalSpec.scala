package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$Sf/documents.parquet")

  test("binary payload schema: binary column + typed metadata struct") {
    val m = Multimodal.withBinaryPayload(docs)
    assert(m.schema("payload").dataType.typeName === "binary")
    assert(m.schema("meta").dataType.typeName === "struct")
    val r = m.filter(col("doc_id") === 0).select("meta.kind", "meta.size_bytes").head()
    assert(r.getString(0) === "text/plain")
    assert(r.getLong(1) > 0)
  }

  test("feature extraction runs per-partition and matches SQL-side arithmetic") {
    val m = Multimodal.withBinaryPayload(docs.limit(50))
    val f = Multimodal.extractFeatures(spark, m)
    // n_bytes from the imperative stage == octet length from the SQL side
    val joined = f.join(m, "doc_id")
      .filter(col("n_bytes") =!= length(col("payload")))
    assert(joined.count() === 0)
    // checksum is a positive byte sum for ASCII text
    assert(f.filter(col("checksum") <= 0).count() === 0)
    assert(f.head().getString(3).length === 16) // 8 bytes → 16 hex chars
  }

  test("partitioning is preserved through the decode stage") {
    val m = Multimodal.withBinaryPayload(docs).repartition(7)
    val f = Multimodal.extractFeatures(spark, m)
    assert(f.rdd.getNumPartitions === 7)
    assert(f.count() === docs.count())
  }

  test("frame sampling emits array<binary> with stride") {
    val m = Multimodal.withBinaryPayload(docs.limit(10))
    val fr = Multimodal.frameSample(m, frameBytes = 16, stride = 2)
    assert(fr.schema("frames").dataType.sql === "ARRAY<BINARY>")
    val r = fr.filter(col("doc_id") === 0).head()
    assert(r.getLong(2) > 0)
  }
}
