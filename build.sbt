ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreducelitespark"
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
// Forked run output must reach stdout RAW (no sbt "[info] " prefix):
// the external driver parses Bench's single JSON line from stdout, and
// a logger-decorated line is not valid JSON (round-1 BENCH_r01.json
// recorded parsed:null for exactly this reason).
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
  // 24g default (box has 128 GiB): the 102-query bench suite on 8g
  // spent its tail in GC — q86 in-suite sat at ~1.5× its fresh-JVM
  // time from heap pressure alone (isolated 1.15 s → 1.69 s at 8g →
  // 1.37 s at 24g on an idle box, codegen cache already fixed; see
  // Bench.scala for the other half of the round-6 "in-suite
  // inflation" root cause)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // room for the 4096-entry codegen class cache's JIT'd code
  // (default 240 MB code cache holds ~100 queries' worth compiled
  // once; the bench compiles 102 × ~10 units and re-runs them)
  "-XX:ReservedCodeCacheSize=1g",
)
