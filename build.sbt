ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "extracttablespark"
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
// forked runMain output goes straight to stdout/stderr without sbt's
// "[info] " prefixes — the driver machine-parses Bench's JSON line
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
  // Always use the serialized (Tungsten) shuffle writer, never the
  // bypass-merge writer. Bypass kicks in at R <= 200 reduce partitions
  // and writes R files per map task; on this sandbox's filesystem the
  // create/write/delete syscall storm measured 11.4 task-CPU-s for a
  // 120k-row groupBy that the serialized writer does in 0.9 (tools/
  // BypassTest; the same data on tmpfs costs 1.5, confirming it's
  // file-op overhead, not sorting). At production scale R >> 200, so
  // the serialized writer IS the default path — this aligns the local
  // bench (R = cores = 32, from the frozen session config) with the
  // production writer instead of a local-only degenerate one.
  // Parameterised: SPARK_BYPASS_THRESHOLD restores any other value.
  s"-Dspark.shuffle.sort.bypassMergeThreshold=${sys.env.getOrElse("SPARK_BYPASS_THRESHOLD", "1")}",
  // 24g default: the 87-query bench suite in one JVM (cached BPE
  // models, stream landing zones, checkpointed graph blocks) runs into
  // a GC wall at 8g — measured 2.3x slower flagship timings with gc at
  // 20% of task time; the host has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ sys.env.get("SPARK_GC_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
