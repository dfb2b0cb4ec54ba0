ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "streamingforexdatapipelinespark"
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
// The driver parses Bench's ONE JSON line out of the last ~2000 chars of
// stdout; sbt's default LoggedOutput prefixes every forked line with
// [info]/[error] and appends a "[success] Total time" footer, and that
// parse has failed every round ("parsed": null in BENCH_r0{1,2,3}.json).
// Raw pass-through + no success banner makes the bare JSON line the last
// thing on stdout.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Suites share one SparkSession (and its JVM-wide CacheManager): parallel
// suites race plan-shape assertions against caches/conf other suites
// materialize. Deterministic order > the small parallelism win.
Test / parallelExecution := false
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
  // 190 queries share one JVM-wide CacheManager plus SoftReference index
  // memos. 24g is the measured sweet spot: at 8g the cached indexes
  // evict mid-bench and shared-index consumers re-pay their build
  // (dedup_clusters 1.7s -> 7s); at 48g GC behavior degrades the SAME
  // workload ~3x (warmup 156s -> 503s, A/B-tested) — bigger is not
  // better here.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
