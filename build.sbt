ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hearthstatsspark"
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
// Forked run output goes straight to this process's stdout/stderr —
// sbt's default LoggedOutput prefixes every line with [info]/[error],
// which breaks line-oriented JSON consumers of Bench/Verify output.
run / outputStrategy := Some(StdoutOutput)
// ...and sbt's own trailing "[success] Total time: ..." line must not
// follow the JSON, or a last-line parser reads "[success]" instead of
// the benchmark result (BENCH_r01/r02 both recorded parsed:null).
Global / showSuccess := false
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
  // 16g default (was 8g), still SPARK_DRIVER_MEM-overridable: local[32]
  // runs 32 concurrent tasks in ONE JVM — at 8g the unified memory
  // region left ~150 MB execution memory per task slot, and the bench
  // session's accumulated fixture/stream state pushed the later timed
  // entries into GC/eviction churn (measured: the same quiet-box run
  // at 8g vs 16g = 337 s vs 301 s total, with q112 11.1→7.5 s,
  // q76 4.5→2.5 s — guide §5: size memory to concurrent task count,
  // not to a round number; the box has 128 GiB).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
