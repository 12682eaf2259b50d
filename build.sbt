ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "notionspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Keep forked suites SEQUENTIAL (sbt's default for forked JVMs, pinned
// here deliberately): several specs flip mutable path-selection seams
// (Bpe.LocalVocabCap, Components.LocalEdgeCap, Dedup.HotBandBucketCap)
// inside try/finally windows — a concurrently running suite would
// nondeterministically take the other path during the window (results
// identical on both paths, but any path-specific assertion would flake).
Test / testForkedParallel := false
run / fork := true
// Forked run output must reach stdout UNPREFIXED: sbt's default
// LoggedOutput wraps every line in "[info] ", which breaks the
// driver's line-oriented JSON parse of Bench's one-line result
// (BENCH_r1..r4 all recorded parsed:null). StdoutOutput passes the
// child's stdout/stderr straight through.
run / outputStrategy := Some(StdoutOutput)
// ...and the trailing "[success] Total time" banner would otherwise be
// the last line of output, displacing the JSON line a last-line parser
// would read.
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude
// it from the unused-key lint so every batch invocation isn't prefixed
// by a 6-line warning banner.
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
)
