ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "commercepulsedatapipelinespark"
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
// The bench/verify collectors parse the LAST lines of stdout as bare
// JSON. sbt's default forked-run logger decorates child stdout as
// "[info] {...}" and appends a "[success] Total time" epilogue — both
// break json.loads on the graded metric line (BENCH_r0{1..7} all
// recorded parsed:null). StdoutOutput passes the child's stdout through
// undecorated; showSuccess drops the epilogue.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
// showSuccess is consumed by sbt's command layer, not another setting —
// exclude it from lintUnused so the build stays warning-free
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // JDK17 GCLocker hazard under heavy native parquet I/O near a full
  // heap: "Retried waiting for GCLocker too often" surfaces as an
  // executor-thread OOM, which in local mode KILLS the whole JVM
  // (SparkUncaughtExceptionHandler). Observed once on the 100x bench
  // rung (round 10); raising the retry budget is the standard
  // mitigation (JDK-8192647 family) and costs nothing when GC is calm.
  // Diagnostic option on JDK17 — the unlock flag must precede it.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
)
