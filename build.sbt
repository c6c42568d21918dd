ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datatransformspark"
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
// The round-driver keeps only the last 2000 chars of stdout and parses
// the LAST line as the bench JSON. Two sbt behaviors defeated that for
// nine rounds: the logged-output strategy prefixes every app line with
// "[info] " (so no line starts with '{'), and sbt appends its own
// "[success] Total time..." line AFTER the app's final JSON. Inherit
// stdout directly (no prefix) and suppress the success banner so the
// app's compact JSON line is the literal last line of stdout.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, which the unused-key
// lint can't see — the note in its own warning text says to exclude it
Global / excludeLintKeys += showSuccess
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
  // 24g default (round 14): the full 358-query bench sweep in one JVM
  // accumulates localCheckpoint blocks + status-store state that 8g
  // could not hold — measured: q143's passes 2-3 degraded 1.2s -> 7.8s
  // under GC pressure at 8g and read 1.19s flat at 24g (the machine
  // has 128 GiB; tests and verify simply get headroom).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Dozens of wide whole-stage-codegen classes (128-column aggs etc.)
  // overflow the default 240m code cache in one long-lived JVM; once it
  // fills, the JIT silently deopts and query times go 10-30x.
  "-XX:ReservedCodeCacheSize=1g",
  // G1's GCLocker + humongous-allocation interaction throws
  // "Retried waiting for GCLocker too often" under the 100k+-vector
  // ANN builds (256 MB task buffers); raising the retry budget is the
  // documented mitigation and costs nothing elsewhere. (Diagnostic
  // flag — must be unlocked first.)
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
)
