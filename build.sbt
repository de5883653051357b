ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlpipelineorchestrationspark"
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
// Forked `run` output goes straight to this process's stdout instead of
// through sbt's logger: the bench/verify contract is "last stdout line is
// one parseable JSON object", and the logger's `[info] ` prefix breaks any
// line-oriented JSON parse of the captured output.
run / outputStrategy := Some(StdoutOutput)
// ...and suppress sbt's trailing "[success] Total time" banner, so the
// bench JSON is literally the LAST line of the process output.
Global / showSuccess := false
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
  // Heap size was A/B-measured on the full 243-query bench at sf0.1 on
  // local[32]: 8g+G1 = 238s with a clean profile; 24g (either collector)
  // = ~256s with random multi-second stalls landing on arbitrary queries
  // (big-heap G1 young-gen pauses under 32 task threads). Keep the small
  // proven heap; SPARK_DRIVER_MEM / SPARK_GRAFT_GC override for
  // experiments. This is the test-harness JVM, not the cluster posture
  // (executors size their own heaps there).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-XX:+Use${sys.env.getOrElse("SPARK_GRAFT_GC", "G1")}GC",
)
