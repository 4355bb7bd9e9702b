ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "letstalkcdcchangefeedplaygroundspark"
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
// Driver/executor heap scales with the requested core count (round-17):
// local[N] runs N concurrent tasks in ONE JVM, so a flat 8g at 32 cores is
// 250 MB of execution+storage per task — measured on the full 254-query
// bench, the memory-store pressure evicts persisted blocks mid-query
// ("Block rdd_* already exists" recompute churn) and inflated late-run
// queries up to 34× (dedup_winnow 6.2 s under 8g vs 0.22 s under 24g,
// OPTIMIZATION_r17.md). 768 MB/core (floor 8g) keeps per-task memory
// constant as SPARK_GRAFT_CPUS varies — the same rule a production
// deployment applies per executor — and SPARK_DRIVER_MEM still overrides.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val cores = sys.env.get("SPARK_GRAFT_CPUS")
      .flatMap(c => scala.util.Try(c.toInt).toOption).getOrElse(4)
    s"${math.max(8L, (cores * 768L) / 1024L)}g"
  })}",
)
// Smaller heap for tests: Hadoop's local FS shells out (readlink/chmod) on
// streaming state checkpoints, and each exec forks the JVM — fork cost is
// proportional to dirty heap, so a big test heap makes state stores crawl.
Test / javaOptions := jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  "-Xmx3g",
)
