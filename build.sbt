ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkpatternsspark"
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
// Per-test durations in the report (-oD) so the suite's wall-time
// budget is measurable per spec (the r15 driver run was budget-killed
// mid-suite; shrinking it starts with knowing where it goes).
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// Run suites CONCURRENTLY inside the forked test JVM: each suite holds
// its own SparkSession (SparkSpec.newSession — session-scoped conf /
// temp views / streams), so suites are independent jobs on one shared
// local SparkContext and overlap safely (guide §2.6). Measured r16:
// 392 tests, 23:50 sequential → see OPTIMIZATION_r16.md for the
// parallel number; this is what keeps `sbt test` inside the driver's
// budget.
Test / testForkedParallel := true
// Forked run output normally routes through sbt's logger, which prefixes
// every stdout line with "[info] " — that decoration breaks the driver's
// parse of Bench's single JSON result line. StdoutOutput passes the
// child's stdout through verbatim.
run / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
