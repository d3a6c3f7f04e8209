ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "csvbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// The Spark Connect CLIENT (shaded, ships with the image under
// connect-repl/) — test-only, used by CliSpec to round-trip a query
// against the `serve` subcommand's in-process Connect server.
Test / unmanagedJars += Attributed.blank(
  file("/opt/spark/jars/connect-repl/spark-connect-client-jvm_2.13-4.1.2.jar"))
// ... and its JDBC driver, so CliSpec can prove the route a psql user
// takes (any JDBC tool -> jdbc:sc://host:port) works end-to-end.
Test / unmanagedJars += Attributed.blank(
  file("/opt/spark/jars/connect-repl/spark-connect-client-jdbc_2.13-4.1.2.jar"))
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Bench prints its machine-readable JSON as the LAST stdout line, but
// sbt's "[success] Total time: ..." banner trails it, so a driver that
// parses the tail of stdout reads the banner instead of the JSON (its
// `parsed` field has been null for eight rounds). Suppressing the
// banner makes the JSON line genuinely last; the exit code still
// carries success/failure, and BENCH_LAST.json stays as belt-and-braces.
ThisBuild / showSuccess := false
// ...and the banner was only half the problem: sbt logs a forked run's
// stdout through its logger, so every line — including the JSON — gains
// an "[info] " prefix that defeats the driver's tail parse (r20 verdict
// #1: `parsed` null for the ninth round). StdoutOutput passes the forked
// process's stdout through verbatim: the JSON line reaches the driver
// byte-exact.
run / outputStrategy := Some(StdoutOutput)
// (the run-scoped key IS consumed by the forked-run machinery — the
// lint can't see through the delegation; verified live: the JSON line
// reaches stdout unprefixed)
Global / excludeLintKeys += run / outputStrategy
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // the 200+-query bench sweep generates thousands of codegen classes;
  // the JDK default 240m code cache fills mid-sweep and late queries
  // run deoptimized (measured: q_weighted_quantiles 11s mid-sweep vs
  // 2.5s standalone). One JVM flag removes the cliff.
  "-XX:ReservedCodeCacheSize=512m",
)
