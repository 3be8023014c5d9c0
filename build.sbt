ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "data_warehouse_projectspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
)
// local-mode Spark = driver + all executor threads in ONE JVM. The bench
// entrypoint (run) sizes the heap for 32 concurrent tasks + shuffle +
// cached relations at sf0.1 (the round-1 bench ran local[32] in 8g and
// spent most of ext_dedup_minhash in GC). Tests run tiny fixtures: a
// smaller default keeps `sbt test` viable on smaller hosts instead of
// reserving 48g per forked JVM. SPARK_DRIVER_MEM overrides both.
run / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}"
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}"
// The registry compiles several hundred LARGE Janino-generated classes per
// bench pass; at the JDK 17 default ReservedCodeCacheSize (240 MB) the
// code cache fills mid-bench and UseCodeCacheFlushing silently evicts hot
// compiled methods — generated aggregate loops then run interpreted,
// showing up as intermittent 10-50x per-task slowdowns that never
// reproduce in isolated runs (Bench prints per-run code-cache usage on
// stderr to keep this observable). 2g leaves eviction headroom.
run / javaOptions += "-XX:ReservedCodeCacheSize=2g"

// The bench/verify contract is "print ONE JSON line"; sbt's own
// "[success] Total time: ..." epilogue lands on stdout AFTER that line,
// so a driver that parses the last stdout line sees sbt chrome instead of
// the JSON (every BENCH_r*.json records "parsed": null). Suppressing the
// success banner makes the program's final println the last stdout line.
Global / showSuccess := false
// ...and sbt's logger prefixes every forked-process stdout line with
// "[info] " (stderr with "[error] "), which corrupts that JSON line too.
// StdoutOutput inherits the parent's raw streams: the program's println
// reaches stdout byte-identical, with no logger prefix.
run / connectInput := false
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
