ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mysqltos3spark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Optional extra driver jars (e.g. MySQL Connector/J for the
// deploy/mysql harness — see deploy/mysql/README.md): drop them in
// ./lib. Empty in the sandbox; unmanagedBase above repoints the
// default lib lookup, so restore it explicitly.
Compile / unmanagedJars ++= ((baseDirectory.value / "lib") * "*.jar").classpath
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
  // 12g default: the full suite peaked within ~1 extra heavy test of an
  // 8g heap (the 2-edge cube compile mass + resident edge2Results), and
  // the host has 128 GiB — headroom is cheaper than a flaked OOM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // Headroom for Janino-generated classes: the JDK default (240 MB) was
  // 61% occupied after one 143-query bench run (146 MB peak); a longer
  // production session would tip into code-cache flushing, which
  // deoptimizes hot codegen'd loops. Reserved, not committed — costs
  // address space only.
  "-XX:ReservedCodeCacheSize=512m",
)
