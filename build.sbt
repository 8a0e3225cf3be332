ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vectraplayerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Degenerate-volume stress tests (tag graft.Slow) run on demand:
//   sbt 'set Test/testOptions := Seq(); testOnly * -- -n graft.Slow'
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.Slow")
run / fork := true
// Forked-run output normally routes through sbt's logger, which prefixes
// every line with "[info] " — a line that must parse as bare JSON (the
// Bench/Verify driver contract) never does. StdoutOutput wires the child
// process straight to sbt's stdout: contract lines come out raw. With
// showSuccess off, sbt also skips its trailing "[success] Total time"
// line, so the LAST stdout line of `sbt "runMain graft.Bench"` is the
// bench contract JSON itself.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
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
) ++
  // Extra forked-JVM flags, space-separated (e.g. "-Xms24g
  // -XX:+AlwaysPreTouch" to pin the heap: G1 uncommits regions after the
  // bench harness's per-query System.gc(), and on this virtualized box
  // re-faulting those pages showed up as 20-30x kernel-time storms inside
  // timed reps — see SCALING.md round-14 "machine-noise episodes")
  sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq
    .flatMap(_.split("\\s+").toSeq.filter(_.nonEmpty))
