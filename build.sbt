ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "financial_data_pipeline_optimizationspark"
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
// The driver benchmark parses ONE JSON line out of the last ~2 KB of sbt's
// output. Two sbt behaviors broke that every round: (a) forked-run stdout is
// LOGGED by default, so the JSON line arrived as "[info] {...}" — not
// parseable as a bare JSON line; (b) the "[success] Total time" trailer
// printed after it. StdoutOutput passes the child's streams through raw and
// showSuccess drops the trailer, so the JSON line is the last stdout line.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A 126-query Bench run generates thousands of whole-stage-codegen
  // classes in ONE JVM. Measured with -XX:+PrintCodeCache at r9: 142 MB
  // max_used of the JDK 17 default 240 MB — not full today, but the
  // registry grows every round and reservation (not commitment) is free,
  // so reserve enough that JIT eviction can never become a suite-position
  // variable.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
