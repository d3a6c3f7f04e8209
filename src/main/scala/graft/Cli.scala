package graft

import java.io.PrintStream

import org.apache.spark.sql.SparkSession

import graft.engine.Core

/** User-facing command line — the reference's primary surface
  * (`/root/reference/csvb/src/bin/csvb.rs:168-178`: subcommands
  * `haiku | exec | serve | federate`, with `exec --csv <path>...
  * --table-name tbl "<SQL>"`). graft keeps the same contract for the
  * local subcommands over the existing engine pieces
  * ([[graft.engine.Core.addCsvTable]] / [[graft.engine.Core.execute]]
  * / [[graft.engine.Core.pretty]]), plus `--parquet` since the engine
  * is columnar-first:
  *
  * {{{
  * graft.Cli exec [--csv <path>]... [--parquet <path>]...
  *                [--table-name tbl] [--max-rows N] "<SQL>"
  * graft.Cli haiku
  * }}}
  *
  * `serve` (pgwire, `csvb_engine/src/lib.rs:91-132`) stays descoped
  * per SURVEY §7.5 — Spark's idiomatic remote surface is Spark
  * Connect — and `federate` is a library surface
  * ([[graft.engine.Federation]]); both subcommands print that
  * pointer instead of failing silently.
  */
object Cli {

  private val Usage =
    """usage:
      |  exec [--csv <path>]... [--parquet <path>]... [--table-name tbl] [--max-rows N] "<SQL>"
      |  haiku
      |
      |exec registers the given paths as table <tbl> (default: tbl).
      |When BOTH --csv and --parquet are passed, the csv paths register
      |as <tbl> and the parquet paths as <tbl>_pq.
      |""".stripMargin

  /** Testable entry: parse + run against a provided session, print to
    * `out`, return a process exit code (0 ok, 2 usage error).
    */
  def run(args: Seq[String], spark: SparkSession, out: PrintStream): Int = args.toList match {
    case "haiku" :: _ =>
      out.println(Core.haiku)
      0
    case "exec" :: rest =>
      exec(rest, spark, out)
    case "serve" :: _ =>
      out.println("serve (pgwire) is not provided; use Spark Connect for a remote SQL surface (SURVEY §7.5)")
      2
    case "federate" :: _ =>
      out.println("federate is a library surface: graft.engine.Federation.unionOfShards / jdbcShards")
      2
    case _ =>
      out.println(Usage)
      2
  }

  private def exec(rest: List[String], spark: SparkSession, out: PrintStream): Int = {
    var csvs = Vector.empty[String]
    var parquets = Vector.empty[String]
    var tableName = "tbl"
    var maxRows = 100
    var query: Option[String] = None
    var argv = rest
    while (argv.nonEmpty) argv match {
      case "--csv" :: p :: t         => csvs :+= p; argv = t
      case "--parquet" :: p :: t     => parquets :+= p; argv = t
      case "--table-name" :: n :: t  => tableName = n; argv = t
      case "--max-rows" :: n :: t    => maxRows = n.toInt; argv = t
      case q :: t if !q.startsWith("--") && query.isEmpty => query = Some(q); argv = t
      case bad :: _ =>
        out.println(s"unrecognized argument: $bad\n$Usage")
        return 2
      case Nil => // unreachable: loop guard
    }
    query match {
      case None =>
        out.println(s"missing query\n$Usage")
        2
      case Some(sql) =>
        if (csvs.nonEmpty) Core.addCsvTable(spark, tableName, csvs)
        if (parquets.nonEmpty)
          Core.addParquetTable(spark, if (csvs.nonEmpty) s"${tableName}_pq" else tableName, parquets)
        out.println(Core.pretty(Core.execute(spark, sql), maxRows))
        0
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = Core.session("graft-cli")
    val code =
      try run(args.toSeq, spark, System.out)
      finally spark.stop()
    if (code != 0) sys.exit(code)
  }
}
