ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
// Keep sbt's "[success] Total time: ..." banner off stdout: the bench
// contract is ONE machine-parseable JSON line as the process's final
// stdout line, and the banner landed after it — the driver's stdout
// parse has recovered nothing since r12 (VERDICT r16 ask #2).
Global / showSuccess := false
// Pass the forked JVM's stdout/stderr straight through instead of
// re-logging them as "[info] ..."/"[error] ..." lines: the logger
// prefix made the bench's JSON line unparseable even when it was the
// last line (same driver-contract fix as showSuccess above).
outputStrategy := Some(OutputStrategy.StdoutOutput)
// these keys are read through forkOptions / the command loop; sbt's
// lint cannot see that and would warn on every invocation
Global / excludeLintKeys ++= Set(outputStrategy, showSuccess)
name := "pgcapturespark"
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
  // 24g default: the bench/verify box has 128 GiB and one JVM hosting
  // 32 executor threads — an 8g heap made the 86-query suite GC-bound
  // in its tail. 512m code cache: ~90 distinct plans' generated classes
  // overflow the 240m default and JIT falls back to interpretation.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:ReservedCodeCacheSize=512m",
)
