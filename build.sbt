ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pwetlscrumptioussquadspark"
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
// The driver invokes `sbt "runMain graft.Bench"` and parses the LAST
// stdout line as JSON. sbt's default LoggedOutput strategy prefixes every
// forked-process line with "[info] " and appends a "[success] Total
// time..." line — both of which broke the driver's parse four rounds
// running. StdoutOutput passes the forked JVM's stdout/stderr through
// verbatim; showSuccess drops the trailing success line, so the bench's
// compact JSON really is the final line.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by the command engine, not a task — exclude it
// from the unused-key lint
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
  // local[32] with multi-million-row shuffles needs headroom or GC noise
  // dominates bench timings (the box has 128 GiB). Fixed-size, pre-touched
  // heap: growing the heap mid-query triggers a kernel page-fault/
  // compaction storm on this VM (observed: 6000s of system CPU in one
  // shuffle-heavy first run) — fault the pages in at JVM start instead.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
)
