package graft

import graft.engine.Core

/** Dev-only scratch main: checks Spark 4.1 behaviors the build plan
  * depends on. Not part of the library surface.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Core.session("probe")
    def t(name: String)(f: => Any): Unit =
      try println(s"[probe] $name -> " + f)
      catch { case e: Throwable => println(s"[probe] $name FAIL: ${e.toString.take(300)}") }

    t("events-nanosAsLong") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      ev.selectExpr("event_id", "ts", "unix_micros(ts) um").orderBy("event_id").limit(2)
        .collect().mkString("; ")
    }
    spark.stop()
  }
}
