ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dynamicqueryenginespark"
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
// Keep sbt's "[success] Total time..." epilogue out of run output — the
// bench driver keeps only the last 2000 chars of stdout, and every byte
// after graft.Bench's JSON line eats into that window.
Global / showSuccess := false
// 48g default: the bench/verify JVM runs local[32] — 32 concurrent tasks'
// execution memory plus the battery's persisted shared indexes. The old 8g
// default put the whole 151-query battery into GC/eviction thrash as it
// grew: the same 4-query slice measured 25.5 s at 8g vs 11.4 s at 48g
// (q_pagerank 17.8→7.5, q_dedup_clusters 3.8→2.1), which is exactly the
// round-9 "unexplained 3×" regression set. The machine has 128 GiB; 48g
// leaves room for sbt, DuckDB oracle runs, and page cache.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
