package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end test of the distributed HTTP range-read CSV source
  * against an in-process JDK HttpServer that serves 206 partial
  * content — the executors' ranged GETs are real HTTP, no egress.
  * A second server that IGNORES Range (plain 200) covers the
  * fallback path.
  */
class HttpCsvSpec extends SparkSpec {

  /** CSV body with line lengths varying around the chunk size so
    * chunk boundaries land mid-line in many positions.
    */
  private lazy val csvBody: Array[Byte] = {
    val sb = new StringBuilder("id,name,score\n")
    (0 until 5000).foreach { i =>
      sb.append(i).append(",n").append("x" * (i % 37)).append(i)
        .append(",").append(i * 3 % 101).append("\n")
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  private def startServer(honorRange: Boolean): (com.sun.net.httpserver.HttpServer, String) =
    HttpCsv.serveBytes(csvBody, "data.csv", honorRange)

  test("ranged scan reassembles every line exactly once across chunk boundaries") {
    val (server, url) = startServer(honorRange = true)
    try {
      // 4 KiB chunks -> ~40 ranges, every boundary mid-line somewhere
      val df = HttpCsv.rangedCsvTable(spark, url, "http_csv", chunkBytes = 4096)
      assert(df.count() === 5000)
      assert(df.columns.toSeq === Seq("id", "name", "score"))
      // exact content: ids are a permutation of 0..4999, scores match
      assert(df.agg(sum("id")).head().getLong(0) === (0 until 5000).map(_.toLong).sum)
      assert(df.filter(col("id") === 4999).head().getInt(2) === 4999 * 3 % 101)
      assert(df.select("id").distinct().count() === 5000)
      // parallel shape: one partition per range, not one blob
      assert(HttpCsv.rangedLines(spark, url, 4096).rdd.getNumPartitions > 10)
    } finally server.stop(0)
  }

  test("content length comes from Content-Range on a 1-byte probe") {
    val (server, url) = startServer(honorRange = true)
    try assert(HttpCsv.contentLength(url) === csvBody.length.toLong)
    finally server.stop(0)
  }

  test("empty-but-existing file: 416 to the 1-byte probe reports length 0, not an error") {
    val (server, url) = HttpCsv.serveBytes(Array.emptyByteArray, "empty.csv")
    try assert(HttpCsv.contentLength(url) === 0L)
    finally server.stop(0)
  }

  test("multi-url listing table unions two servers under one name, schema pinned from the first") {
    // two shards with the same header, different row ranges, on two
    // INDEPENDENT servers (≡ the reference's several HTTP paths per
    // base store)
    def shardBytes(lo: Int, hi: Int): Array[Byte] = {
      val sb = new StringBuilder("id,name,score\n")
      (lo until hi).foreach(i => sb.append(i).append(",n").append(i)
        .append(",").append(i * 3 % 101).append("\n"))
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    val (s1, u1) = HttpCsv.serveBytes(shardBytes(0, 1200), "a.csv")
    val (s2, u2) = HttpCsv.serveBytes(shardBytes(1200, 2000), "b.csv")
    try {
      val df = HttpCsv.rangedCsvTableMulti(spark, Seq(u1, u2), "http_csv_multi",
        chunkBytes = 4096)
      assert(df.columns.toSeq === Seq("id", "name", "score"))
      assert(df.count() === 2000)
      // every row exactly once across both shards — no duplicated or
      // swallowed header/boundary lines
      assert(df.select("id").distinct().count() === 2000)
      assert(df.agg(sum("id")).head().getLong(0) === (0 until 2000).map(_.toLong).sum)
      // registered as ONE queryable table
      assert(spark.sql("SELECT count(*) FROM http_csv_multi").head().getLong(0) === 2000)
    } finally { s1.stop(0); s2.stop(0) }
  }

  test("multi-url listing bails on header drift before any distributed work") {
    val (s1, u1) = HttpCsv.serveBytes("id,name\n1,a\n".getBytes, "a.csv")
    val (s2, u2) = HttpCsv.serveBytes("id,label\n2,b\n".getBytes, "b.csv")
    try {
      val e = intercept[IllegalArgumentException] {
        HttpCsv.rangedCsvTableMulti(spark, Seq(u1, u2), "http_csv_drift")
      }
      assert(e.getMessage.contains("header mismatch"), e.getMessage)
    } finally { s1.stop(0); s2.stop(0) }
  }

  test("falls back correctly when the server ignores Range") {
    val (server, url) = startServer(honorRange = false)
    try {
      val df = HttpCsv.rangedCsvTable(spark, url, "http_csv_noranges", chunkBytes = 16384)
      assert(df.count() === 5000)
      assert(df.agg(sum("id")).head().getLong(0) === (0 until 5000).map(_.toLong).sum)
    } finally server.stop(0)
  }
}
