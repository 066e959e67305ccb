ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dawisspark"
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
  // JDK 17 G1 + many-core local mode: 32 concurrent parquet readers
  // decompress through JNI (snappy/zstd), each briefly holding the
  // GCLocker; a large allocation (Tungsten hash-map growth during a
  // wide aggregation) that needs a GC retries only twice by default
  // before throwing a SPURIOUS OutOfMemoryError while the heap is
  // recoverable ("Retried waiting for GCLocker too often"). Raising
  // the retry count is the documented mitigation until JDK 21's
  // GCLocker rework; on a real cluster the same two flags belong in
  // spark.executor.extraJavaOptions for JDK-17 executors.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
)
// The harness keeps only a bounded tail (2000 chars) of sbt's stdout and
// parses the bench's one-line JSON out of it. sbt's "[success] Total
// time ..." epilogue eats ~75 chars of that window after the line, so
// suppress the banner; errors still print.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
