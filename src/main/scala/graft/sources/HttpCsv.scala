package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Distributed HTTP(S) range-read CSV scan — the scale-honest
  * counterpart of the reference's HTTP object store
  * (`csvb_engine/src/lib.rs:54-71`, which registers an HTTP store and
  * range-reads CSV through it). `Core.materializeIfHttp`'s
  * whole-file driver download is kept for the single-small-file CLI
  * case; this source is the 100 TB shape: the driver issues ONE
  * 1-byte probe to learn the content length, then executors fetch
  * disjoint byte ranges in parallel with `Range:` headers and parse
  * only the lines they own — no bytes ever flow through the driver.
  *
  * Line-ownership contract (the classic distributed text split): a
  * chunk `[s, e)` owns every line whose first byte lies in `[s, e)`.
  * A reader at `s > 0` fetches from `s - 1` so it can tell whether
  * `s` starts a line (previous byte is '\n') or sits mid-line (skip
  * to after the first '\n'); it reads past `e` into readahead to
  * finish its last owned line. Readahead doubles until the line
  * completes, so no line-length assumption is baked in.
  *
  * Servers that ignore `Range` (HTTP 200, no Content-Range) get the
  * whole body streamed and sliced executor-side — correct, not
  * parallel-efficient; real object stores all honor Range.
  *
  * Zero-egress test env: exercised end-to-end in HttpCsvSpec against
  * an in-process `com.sun.net.httpserver` serving 206 partial
  * content.
  */
object HttpCsv {

  /** Fetch `[from, to)` of `url` (bounds clamped server-side via the
    * Range header). Returns the bytes plus whether the server honored
    * the range (206).
    */
  private[sources] def fetchRange(url: String, from: Long, to: Long): Array[Byte] = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestProperty("Range", s"bytes=$from-${to - 1}")
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(120000)
    val code = conn.getResponseCode
    val in = conn.getInputStream
    try {
      val body = in.readAllBytes()
      if (code == 206) body
      else { // Range ignored: whole body came back — slice our window
        val lo = math.min(from, body.length.toLong).toInt
        val hi = math.min(to, body.length.toLong).toInt
        java.util.Arrays.copyOfRange(body, lo, hi)
      }
    } finally in.close()
  }

  /** Content length via a 1-byte ranged GET (reads the total from
    * `Content-Range: bytes 0-0/<len>`), falling back to
    * `Content-Length` when the server ignores Range.
    */
  private[sources] def contentLength(url: String): Long = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestProperty("Range", "bytes=0-0")
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(30000)
    val code = conn.getResponseCode
    // only "the resource is not there" codes may surface as
    // FileNotFoundException: callers (the Hadoop FS contract) treat
    // FNF as "path does not exist", and under
    // spark.sql.files.ignoreMissingFiles that silently DROPS the
    // file — a 500 or a timeout must stay a hard IOException
    // drain+close the error body before throwing: an unconsumed
    // error stream pins the socket and blocks keep-alive reuse on
    // every missing-file probe
    def closeError(): Unit = {
      val es = conn.getErrorStream
      if (es != null) { try es.readAllBytes() catch { case _: Exception => }; es.close() }
      else conn.disconnect()
    }
    // 416 to `bytes=0-0` means the resource exists but is EMPTY (a
    // compliant server can't satisfy any range of a 0-byte body);
    // the total comes back in `Content-Range: bytes */<len>`. Only a
    // WELL-FORMED total is trusted — a 416 without it stays a hard
    // IOException like every other >=400, because under
    // ignoreMissingFiles a silent length-0 would DROP a non-empty
    // file a misbehaving proxy answered 416 for (the same silent-loss
    // contract as the FNF carve-out above)
    if (code == 416) {
      val len = Option(conn.getHeaderField("Content-Range"))
        .map(_.trim)
        .collect { case cr if cr.matches("(?i)bytes\\s+\\*/\\d{1,18}") => cr.split('/').last.toLong }
      closeError()
      return len.getOrElse(throw new java.io.IOException(
        s"$url: HTTP 416 without a parseable 'Content-Range: bytes */<len>'"))
    }
    if (code == 404 || code == 410) {
      closeError()
      throw new java.io.FileNotFoundException(s"$url: HTTP $code")
    }
    if (code >= 400) {
      closeError()
      throw new java.io.IOException(s"$url: HTTP $code")
    }
    val len =
      if (code == 206)
        Option(conn.getHeaderField("Content-Range"))
          .flatMap(cr => cr.split('/').lastOption)
          .map(_.trim.toLong)
          .getOrElse(sys.error(s"206 without Content-Range from $url"))
      else conn.getContentLengthLong
    conn.getInputStream.close()
    require(len >= 0, s"server reports no content length for $url")
    len
  }

  /** The lines of the chunk `[s, e)` under the ownership contract
    * above. Runs on an executor; issues its own ranged GETs.
    */
  private def chunkLines(url: String, s: Long, e: Long, total: Long,
      readahead0: Int): Iterator[String] = {
    val fetchFrom = math.max(s - 1, 0L)
    var readahead = readahead0.toLong
    var bytes = fetchRange(url, fetchFrom, math.min(e + readahead, total))
    // grow until the last owned line is complete (ends with \n inside
    // the buffer, or the buffer reaches EOF)
    def lastOwnedLineComplete(b: Array[Byte]): Boolean = {
      if (fetchFrom + b.length >= total) return true
      // find last newline at offset >= e - fetchFrom - 1: a line
      // starting before e is finished iff some \n lands at/after its
      // end; simplest sufficient check: buffer contains a \n at
      // byte-offset >= (e - fetchFrom) - 1
      var i = b.length - 1
      val need = (e - fetchFrom - 1).toInt
      while (i >= need) {
        if (b(i) == '\n') return true
        i -= 1
      }
      false
    }
    while (!lastOwnedLineComplete(bytes)) {
      readahead *= 2
      bytes = fetchRange(url, fetchFrom, math.min(e + readahead, total))
    }
    // position of the first owned line within the buffer
    var start =
      if (s == 0) 0
      else if (bytes.nonEmpty && bytes(0) == '\n') 1 // s starts a line
      else { // mid-line: owner is the previous chunk; skip past its end
        var i = 0
        while (i < bytes.length && bytes(i) != '\n') i += 1
        i + 1
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val ownedEnd = (e - fetchFrom).toInt // first byte NOT owned as a line start
    while (start < bytes.length && start < ownedEnd) {
      var i = start
      while (i < bytes.length && bytes(i) != '\n') i += 1
      // strip trailing \r for CRLF bodies
      val end = if (i > start && bytes(i - 1) == '\r') i - 1 else i
      out += new String(bytes, start, end - start, java.nio.charset.StandardCharsets.UTF_8)
      start = i + 1
    }
    out.iterator
  }

  /** The url's lines as a Dataset, one HTTP range per partition, in
    * byte order (so the header line is the first row of the first
    * partition).
    */
  def rangedLines(spark: SparkSession, url: String,
      chunkBytes: Long = 8L * 1024 * 1024, readahead: Int = 64 * 1024): Dataset[String] = {
    import spark.implicits._
    val total = contentLength(url)
    val ranges = (0L until total by chunkBytes).map(s => (s, math.min(s + chunkBytes, total)))
    val nParts = math.max(ranges.size, 1)
    spark.createDataset(ranges.toSeq)
      .repartitionByRange(nParts, $"_1")
      .flatMap { case (s, e) => chunkLines(url, s, e, total, readahead) }
  }

  /** Register `url` as a CSV table scanned by distributed ranged
    * reads (header + inferSchema, matching the reference's CSV
    * inference posture; inference is one extra pass, i.e. one extra
    * round of ranged fetches — same trade the reference's store
    * makes).
    */
  def rangedCsvTable(spark: SparkSession, url: String, name: String,
      chunkBytes: Long = 8L * 1024 * 1024): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(rangedLines(spark, url, chunkBytes))
    df.createOrReplaceTempView(name)
    df
  }

  /** First line of the resource — one small ranged GET, used for the
    * cheap cross-URL header-equality check below. 64 KiB covers any
    * sane CSV header; a header longer than that fails loudly.
    */
  private def headerLine(url: String): String = {
    val bytes = fetchRange(url, 0, 64 * 1024)
    var i = 0
    while (i < bytes.length && bytes(i) != '\n') i += 1
    require(i < bytes.length || bytes.length < 64 * 1024,
      s"no line break in the first 64 KiB of $url — not a CSV header")
    val end = if (i > 0 && bytes(i - 1) == '\r') i - 1 else i
    new String(bytes, 0, end, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Register N urls as ONE CSV listing table scanned by distributed
    * ranged reads — the multi-URL registration the reference's HTTP
    * object store drives (`csvb_engine/src/lib.rs:47-80`: one listing
    * table over several paths per base store). Schema is pinned from
    * the FIRST url (inference pass over it alone — the same
    * first-file-pinned posture as the local CSV listing scan in
    * `Core.addCsvTable`); each remaining url parses positionally
    * under the pinned schema with its own header row skipped. Before
    * any distributed work, every url's header LINE is compared to the
    * first's with one small ranged GET each — the schema-equality
    * bail of `union_table_provider.rs:35-62` applied at the cheapest
    * possible point, so a drifted shard fails at registration, not as
    * nulls mid-scan.
    *
    * Scale shape: the union is a plain UnionExec over N independent
    * ranged scans — each url's ranges parallelize exactly as the
    * single-url form, nothing is driver-localized, and the header
    * probes are N tiny requests.
    */
  def rangedCsvTableMulti(spark: SparkSession, urls: Seq[String], name: String,
      chunkBytes: Long = 8L * 1024 * 1024): DataFrame = {
    require(urls.nonEmpty, "rangedCsvTableMulti needs at least one url")
    val head = headerLine(urls.head)
    urls.tail.foreach { u =>
      val h = headerLine(u)
      require(h == head,
        s"csv header mismatch under listing table '$name': $u has '$h', expected '$head'")
    }
    val first = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(rangedLines(spark, urls.head, chunkBytes))
    val df = urls.tail
      .map(u => spark.read.option("header", "true").schema(first.schema)
        .csv(rangedLines(spark, u, chunkBytes)))
      .foldLeft(first)(_ unionAll _)
    df.createOrReplaceTempView(name)
    df
  }

  /** In-process HTTP server for `bytes` at `/path`, honoring `Range`
    * with 206 partial content (optionally ignoring it, for fallback
    * testing) — the zero-egress stand-in for an object store, used by
    * HttpCsvSpec and the graded `q_http_scan`. Returns (server, url);
    * caller owns shutdown.
    */
  def serveBytes(bytes: Array[Byte], path: String,
      honorRange: Boolean = true): (com.sun.net.httpserver.HttpServer, String) = {
    // start() inside a daemon thread: the JDK server's dispatcher
    // thread inherits daemon status from its creator, so a server a
    // query leaves running for lazy evaluation can never pin the JVM
    // open (a non-daemon dispatcher deadlocks exit: main returns, the
    // JVM waits for the dispatcher, and the shutdown hook that would
    // stop it only runs once all non-daemon threads are gone)
    var out: (com.sun.net.httpserver.HttpServer, String) = null
    val starter = new Thread(() => out = serveBytesBlocking(bytes, path, honorRange))
    starter.setDaemon(true)
    starter.start()
    starter.join()
    out
  }

  private def serveBytesBlocking(bytes: Array[Byte], path: String,
      honorRange: Boolean): (com.sun.net.httpserver.HttpServer, String) = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    // concurrent handling (32 executor threads fetch ranges in
    // parallel); daemon threads so the pool can't pin the JVM either
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8, r => {
      val t = new Thread(r); t.setDaemon(true); t
    }))
    server.createContext(s"/$path", (ex: com.sun.net.httpserver.HttpExchange) => {
      val range = Option(ex.getRequestHeaders.getFirst("Range")).filter(_ => honorRange)
      range match {
        case Some(r) =>
          val Array(lo, hi) = r.stripPrefix("bytes=").split("-").map(_.toLong)
          if (lo >= bytes.length) { // unsatisfiable (incl. any range of a 0-byte body)
            ex.getResponseHeaders.set("Content-Range", s"bytes */${bytes.length}")
            ex.sendResponseHeaders(416, -1)
          } else {
            val from = lo.toInt
            val to = math.min(hi + 1, bytes.length.toLong).toInt
            val slice = java.util.Arrays.copyOfRange(bytes, from, to)
            ex.getResponseHeaders.set("Content-Range", s"bytes $from-${to - 1}/${bytes.length}")
            ex.sendResponseHeaders(206, slice.length)
            ex.getResponseBody.write(slice)
          }
        case None =>
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
      }
      ex.close()
    })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}/$path")
  }
}
