package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + catalog glue — the Spark-native analog of the reference
  * engine core (see `/root/reference/csvb_engine/src/lib.rs:13-31`:
  * session construction with information_schema + a greedy memory
  * pool; here: a `SparkSession` with UTC, AQE, and a bounded shuffle
  * partition count — Spark's `UnifiedMemoryManager` replaces the
  * greedy pool, see SURVEY.md §4).
  *
  * Scale notes (100 TB design point):
  *  - shuffle partitions default to the local core count for tests;
  *    on a real cluster this is AQE-coalesced from a high initial
  *    count, so we leave `spark.sql.adaptive.enabled=true`.
  *  - no driver-side state is kept here beyond the catalog names.
  */
object Core {

  /** Build the standard session. `cpus` mirrors the harness contract
    * (`local[$SPARK_GRAFT_CPUS]`, shuffle.partitions = cpus).
    */
  def session(appName: String = "graft", cpus: Int = defaultCpus): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // keep wide aggregates (128-col minhash) in whole-stage codegen
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def defaultCpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt

  /** Register N CSV files/dirs as ONE named table — the reference's
    * multi-path "listing table" (`csvb_engine/src/lib.rs:33-85`):
    * schema inferred once, then pinned for every path; files
    * discovered by `.csv` extension. Spark's reader already unions
    * multiple paths under one scan with partition-parallel reads, so
    * this is a single declarative scan Catalyst can push filters and
    * projections into.
    */
  def addCsvTable(
      spark: SparkSession,
      name: String,
      paths: Seq[String],
      header: Boolean = true,
      inferSchema: Boolean = true): DataFrame = {
    require(paths.nonEmpty, "No sources provided")
    val local = paths.map(materializeIfHttp)
    val df = spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      // match the reference's `.csv` extension filter for directories
      .option("pathGlobFilter", "*.csv")
      .csv(local: _*)
    df.createOrReplaceTempView(name)
    df
  }

  /** Exact reference schema semantics: infer from the FIRST path
    * only, then pin that schema on every path
    * (`csvb_engine/src/lib.rs:73-80` — `infer_schema(&table_paths[0])`
    * then fixed on the ListingTableConfig). Spark's default
    * `inferSchema` samples all files (a superset behavior —
    * [[addCsvTable]]); this variant reproduces the reference's
    * pin-from-first contract, which also bounds inference cost to one
    * file at any corpus size.
    */
  def addCsvTableFirstFileSchema(
      spark: SparkSession,
      name: String,
      paths: Seq[String],
      header: Boolean = true): DataFrame = {
    require(paths.nonEmpty, "No sources provided")
    val local = paths.map(materializeIfHttp)
    val pinned = spark.read
      .option("header", header.toString)
      .option("inferSchema", "true")
      .option("pathGlobFilter", "*.csv")
      .csv(local.head)
      .schema
    val df = spark.read
      .option("header", header.toString)
      .option("pathGlobFilter", "*.csv")
      .schema(pinned)
      .csv(local: _*)
    df.createOrReplaceTempView(name)
    df
  }

  /** Register one-or-more parquet paths as a named table. */
  def addParquetTable(spark: SparkSession, name: String, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "No sources provided")
    val df = spark.read.parquet(paths: _*)
    df.createOrReplaceTempView(name)
    df
  }

  /** Register JSON-lines paths as a named table (schema-on-read —
    * one inference pass, then a pinned-schema distributed scan).
    */
  def addJsonTable(spark: SparkSession, name: String, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "No sources provided")
    val df = spark.read.json(paths: _*)
    df.createOrReplaceTempView(name)
    df
  }

  /** Register ORC paths as a named table (columnar like parquet;
    * predicate pushdown and column pruning apply identically).
    */
  def addOrcTable(spark: SparkSession, name: String, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "No sources provided")
    val df = spark.read.orc(paths: _*)
    df.createOrReplaceTempView(name)
    df
  }

  /** The reference registers an HTTP object store per http(s) base URL
    * (`csvb_engine/src/lib.rs:54-71`) and range-reads CSV over HTTP.
    * Spark has no built-in http:// FileSystem; this shim is a one-time
    * download to a local spool — fine for the CLI's single small file.
    * The scale path is [[graft.sources.HttpCsv.rangedCsvTable]]:
    * executors fetch disjoint byte ranges in parallel with `Range:`
    * headers, no bytes through the driver (HttpCsvSpec drives it
    * against an in-process 206 server).
    */
  private def materializeIfHttp(path: String): String =
    if (path.startsWith("http://") || path.startsWith("https://")) {
      val tmp = java.nio.file.Files.createTempFile("graft-http-", ".csv")
      val out = new java.io.FileOutputStream(tmp.toFile)
      val in = new java.net.URI(path).toURL.openStream()
      try in.transferTo(out)
      finally { in.close(); out.close() }
      tmp.toString
    } else path

  /** Execute SQL — the single delegation point, mirroring the
    * reference's one-call-site execute (`csvb_engine/src/lib.rs:87-89`
    * delegates everything to the underlying engine; here Catalyst).
    */
  def execute(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)

  /** Sink: write a result out — the reference's `COPY ... TO`
    * surface (reachable via raw SQL in the reference, SURVEY §2.1).
    * Distributed write; `header` applies to csv only.
    */
  def copyTo(df: DataFrame, path: String, format: String = "parquet"): Unit =
    df.write.mode("overwrite").option("header", "true").format(format).save(path)

  /** Easter egg — the reference ships one (`csvb/src/lib.rs:5-78`);
    * ours is original and about this engine.
    */
  def haiku: String =
    """columns of autumn —
      |a shuffle of falling leaves
      |sorted on the wind""".stripMargin

  /** Pretty-print a result like the reference's collect-then-format
    * sink (`csvb/src/lib.rs:101-113`). Bounded: takes the first
    * `maxRows` — never a full collect of an unbounded result.
    */
  def pretty(df: DataFrame, maxRows: Int = 100): String = {
    val header = df.columns
    val rows = df.take(maxRows).map(_.toSeq.map(v => if (v == null) "NULL" else v.toString))
    val all = header.toSeq +: rows.toSeq
    val widths = header.indices.map(i => all.map(_(i).length).max)
    def line(ch: String) = widths.map(w => ch * (w + 2)).mkString("+", "+", "+")
    def fmt(r: Seq[String]) =
      r.zip(widths).map { case (v, w) => " " + v.padTo(w, ' ') + " " }.mkString("|", "|", "|")
    (Seq(line("-"), fmt(header.toSeq), line("-")) ++ rows.map(r => fmt(r)) :+ line("-"))
      .mkString("\n")
  }
}
