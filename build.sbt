ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bandwidthfirstannrefinementprecisionondemandinvectordatabasesspark"
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
// Forward the forked run's stdout verbatim (no sbt "[info] " prefix):
// the bench/verify mains print machine-parsed JSON lines.
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
  // local[N] runs driver+executor in ONE JVM: all concurrent tasks'
  // sort/agg/broadcast memory comes out of this heap, and 8g caused
  // spill/GC stalls on the window-heavy queries at sf0.1. Default to
  // half the machine's RAM capped at 48g (the 128 GiB bench box gets
  // 48g; a 16 GB dev box gets 8g instead of swapping), overridable via
  // SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val physGb = try {
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        .getTotalMemorySize / (1L << 30)
    } catch { case _: Throwable => 16L }
    s"${math.max(2L, math.min(48L, physGb / 2))}g"
  })}",
)
