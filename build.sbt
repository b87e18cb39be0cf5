ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stormnetmonitorspark"
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
// The bench/verify driver anchors on the LAST stdout line being pure
// JSON. sbt's default LoggedOutput strategy prefixes every forked-run
// line with "[info] " and its epilogue appends "[success] Total time:"
// after the program exits — both break that parse. Pass forked output
// through raw and drop the epilogue.
run / outputStrategy := Some(StdoutOutput)
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
  // 65-query suites on local[32] are GC-bound at 8g (bench totals varied
  // 33-53s run to run); the machine has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // The generated-class cache defaults to 100 entries; a 178-query suite
  // compiles several codegen units per query, so the LRU thrashes and
  // late queries pay Janino recompilation for evicted units. Static SQL
  // conf — must be set before the session exists, hence here. Env
  // override is the A/B seam.
  s"-Dspark.sql.codegen.cache.maxEntries=${sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096")}",
) ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq
  .flatMap(_.split("\\s+").toSeq).filter(_.nonEmpty)
