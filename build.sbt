ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etldatabasespark"
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
// Forked run output must hit stdout directly (no "[info] " logger
// prefix) so the driver can parse Bench's single JSON line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and nothing may print AFTER that line: sbt's trailing
// "[success] Total time: …" banner breaks a last-line JSON parse
// (BENCH_r01/r02 came back parsed:null).
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
  // 24g: local[32] is driver+executors in ONE JVM, and Bench's sf1
  // section (10x sf0.1) OOM'd the old 8g default mid-bench. The
  // container has 125 GiB; tests run fine either way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // GCLocker spurious-OOM mitigation (JDK-8192647): with 32 tasks in
  // lz4 JNI critical sections, tiny allocations ("5 words" in the
  // r13 sf1 bench log) fail after the default 2 GCLocker retries and
  // kill the JVM with heap to spare. Raising the retry budget lets
  // the allocation wait for the locker to drain and a real GC to run.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
  // GC is env-swappable for A/B measurement (SPARK_GC=UseParallelGC
  // etc.); default stays the JVM's own choice unless overridden.
) ++ sys.env.get("SPARK_GC").map(g => s"-XX:+$g").toSeq
