ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pydispark"
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
// The bench driver tail-captures stdout and parses the LAST line as the
// bench JSON; sbt's "[success] Total time: N s" epilogue landed after
// Bench's compact summary every round (r8-r11: parsed null). Suppress
// the epilogue so the compact JSON line is the final stdout line. All
// gate scripts key off exit codes, not the [success] banner.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Forked run output goes through sbt's logger by default, which wraps
// every stdout line in "[info] " (and stderr in "[error] ") — the
// driver's last-line JSON parse then sees a prefixed line. StdoutOutput
// passes the forked JVM's streams through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] runs driver+executors in ONE JVM: 8g forced constant full
  // GCs once the suite passed ~85 queries (round-4 bench: match_rule 65s
  // under GC thrash vs 2s with headroom). The box has 125G; 48g leaves
  // room for the test JVM and the driver's DuckDB oracle side-by-side.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
