ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datapipelinestripespark"
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
// Bench driver contract: the driver keeps a ~2000-char tail of stdout and
// parses the JSON it finds there, so the forked program's stdout must reach
// sbt's stdout RAW (no "[info] " logger prefix) and nothing may print after
// the final JSON line (no "[success] Total time" epilogue). Both were present
// in rounds 1-5 and broke the parse (BENCH_r0*.json "parsed": null).
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by the command loop, not a task — exclude it from
// the unused-key lint so every sbt invocation doesn't print a warning.
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
  // 8g showed GC-pressure variance (2.5s -> 47s on one query) when all
  // 33 bench queries share one local[32] JVM; 16g keeps timings stable
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
