ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lxmlreadabilityspark"
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
  // Batch-throughput engine: ParallelGC beats G1 by ~23% at 16+ threads
  // on the allocation-heavy extraction path (one DOM per in-flight turn;
  // measured: N->4N scaling 0.69 -> 0.83). On a cluster:
  // spark.executor.extraJavaOptions.
) ++ {
  val extra = sys.env.get("GRAFT_JAVA_OPTS").toSeq
    .flatMap(_.split(' ').filter(_.nonEmpty))
  (if (extra.exists(_.matches("-XX:\\+Use\\w+GC"))) Seq.empty
   else Seq("-XX:+UseParallelGC")) ++ extra
}
// Bench/Verify/ScalingBench (runMain): big pre-sized, PRE-TOUCHED heap.
// This VM is a Firecracker microVM whose cold memory pages fault through
// the host (cumulative cgroup cpu.stat shows ~50% system time):
// first-touch of a fresh eden region mid-run collapsed single-thread
// extraction from 55 to 2800 us/doc across rounds. AlwaysPreTouch pays
// the fault cost once at JVM start (~15-30 s at 24 GiB), after which
// throughput is flat; measured +26% on the 32-thread headline. The
// sandbox has 128 GiB. (8g went GC-bound at 32 threads: -26%.)
run / javaOptions ++= Seq(
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
)
// Tests are correctness, not measurement: light heap, no pre-touch tax.
Test / javaOptions ++= Seq("-Xmx8g")
