ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gentropyspark"
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
// Forked run output must reach the real stdout UNWRAPPED: the default
// LoggedOutput strategy prefixes every line with "[info] ", which defeats
// the driver's JSON-tail parse of Bench's final line (BENCH_r11-r13 all
// arrived as `[info] {...}` -> "parsed": null). StdoutOutput inherits the
// parent process's stdout/stderr file descriptors directly.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / excludeLintKeys += outputStrategy
// ...and suppress the trailing "[success] Total time: ..." line so the
// bare JSON stays the LAST line the driver's 3 KB tail sees.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // HotSpot refuses to JIT methods over 8000 bytecodes, and Spark's fused
  // whole-stage-codegen methods exceed that on wide projections/aggregates
  // ("Generated method too long to be JIT compiled" — round-18 sweep found
  // several, and the affected parses ran 2-3x slower as interpreted
  // bytecode). Standard Spark deployment tuning; harmless for small
  // methods, no behaviour change.
  "-XX:-DontCompileHugeMethods",
)
