ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "northwindetlspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Generated-class volume across the full query surface benefits from a
// larger JIT code cache (default 240m); no GC tuning needed (G1 pauses
// measured <12ms on the full bench).
javaOptions += "-XX:ReservedCodeCacheSize=512m"
// The bench contract line (one JSON object on stdout) must be the LAST
// line the `sbt runMain graft.Bench` invocation prints, UNWRAPPED: the
// harness reads a bounded stdout tail and parses the JSON line, and sbt
// both prefixes forked-process stdout with "[info] " (via its logger) and
// appends a "[success] Total time: ..." footer — either can break a
// strict line parser. StdoutOutput pipes the forked JVM's streams straight
// through, and showSuccess drops the footer, so the contract line is the
// final, prefix-free line of the invocation.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
