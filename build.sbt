ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "trialsubmissionstudiospark"
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
// The bench/verify driver keeps only the LAST 2000 bytes of sbt's output and
// parses the JSON line it finds there. sbt's default forked-run logger
// prefixes every forked-process line with "[info] " and appends a
// "[success] Total time: ..." epilogue — BENCH_r06..r11 all came back
// `parsed: null` because of exactly that framing. StdoutOutput passes the
// forked JVM's stdout through unprefixed, and showSuccess drops the
// epilogue, so Bench's final contract line is the literal last line of
// output and parses standalone.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not by a task — exclude it
// from the unused-key lint (the warning would otherwise precede every batch)
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
  // 16g default (was 8g): pipe2/d16 are measured heap-sensitive — the r10s4
  // two-way bench inflated pipe2 to 68s vs its 25s standalone floor through
  // block-store + heap pressure alone, and the r11s2 4-way window read 99s.
  // The sandbox has 128 GiB and bench shards fork SEQUENTIALLY, so one 16g
  // child at a time is safe at any SPARK_GRAFT_CPUS. Override via env.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
