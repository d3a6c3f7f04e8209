package graft.engine

import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

/** Session-scoped materialization spool.
  *
  * Multi-consumer intermediates (the MinHash shingle table, LSH band
  * table, candidate-pair sets) need a materialization boundary: left
  * lazy they recompute per consumer; left `persist()`ed they leak
  * executor storage for the rest of the session (the round-3 OOM
  * risk — a long-lived 100 TB session accumulating cached plans).
  * The contract here is the third option: the producer persists its
  * intermediates, forces the *result* through a parquet spool, then
  * unpersists everything before returning — callers get a plain
  * re-readable scan and the storage pool is left exactly as found
  * (`spark.sparkContext.getPersistentRDDs` stays empty, spec-asserted
  * in DedupSpec).
  *
  * On a cluster, point `spark.graft.scratch.dir` at shared storage
  * (HDFS/S3) — the default JVM-local temp dir only works when driver
  * and executors share a filesystem (local mode). The spool is
  * removed on JVM exit.
  */
object Scratch {

  private val counter = new AtomicLong()

  @volatile private var baseDir: Option[Path] = None

  private def base: Path = synchronized {
    baseDir.getOrElse {
      val p = Files.createTempDirectory("graft-scratch-")
      sys.addShutdownHook(remove(p.toFile))
      baseDir = Some(p)
      p
    }
  }

  /** Recursive delete — the shared helper for every spool/staging
    * cleanup (public so callers stop growing private copies).
    */
  def removeTree(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(removeTree))
    f.delete()
    ()
  }

  private def remove(f: java.io.File): Unit = removeTree(f)

  /** Write `df` to a fresh scratch parquet dir (forcing full
    * execution now, while any producer-side caches are still live)
    * and return the re-read — a clean scan with no lineage back into
    * the producer's cached plans.
    */
  def checkpoint(df: DataFrame, tag: String): DataFrame =
    df.sparkSession.read.parquet(checkpointPath(df, tag))

  /** [[checkpoint]]'s write half, returning the scratch dir — for
    * callers that cache the materialized ARTIFACT per sfDir (a stored
    * index in production) and re-read it per run.
    */
  def checkpointPath(df: DataFrame, tag: String): String = {
    val spark = df.sparkSession
    val root = spark.conf.getOption("spark.graft.scratch.dir").getOrElse(base.toString)
    val dir = s"$root/$tag-${counter.incrementAndGet()}"
    df.write.mode("overwrite").parquet(dir)
    dir
  }
}
