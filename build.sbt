ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataminingmapreducespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Warnings are errors, everywhere. A silent cross-type `==` in the
// KernelRewrite ANSI guard survived two rounds of review while scalac
// printed "will always yield true" on every clean build — never again.
// (Incremental builds HIDE warnings for unchanged files; -Werror makes
// the one clean build that does see them fail loudly.)
ThisBuild / scalacOptions ++= Seq("-Xlint", "-Werror")
Test / fork := true
run / fork := true
// Forked run output must reach stdout RAW: sbt's default logger prefixes
// every line with "[info] ", which breaks the driver's line-wise JSON
// parse of graft.Bench's result (BENCH_r01/r02 recorded parsed:null).
run / outputStrategy := Some(StdoutOutput)
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
  // 16g default: the bench session runs ~150 query executions in one
  // JVM; at 8g the accumulated shuffle/broadcast state GC-thrashed the
  // later timed queries (the host has 128 GiB).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
