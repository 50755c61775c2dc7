ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "realtimefrauddetectionflinkkafkaspark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as JSON. Two sbt-logger behaviors broke that in round 8: forked stdout
// was wrapped as `[info] {...}`, and sbt appended a `[success] Total
// time...` line after it. Pass forked output through verbatim and drop
// the success banner so Bench's summary line is the literal final line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not by other settings —
// exclude it from the unused-key lint so the warn doesn't precede runs.
Global / excludeLintKeys += showSuccess
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
  // forward graft.* system properties into the forked run/test JVMs, so
  // plan-override knobs (-Dgraft.jaccard.prefix.ratio, -Dgraft.bm.serve.plan)
  // reach mains like Explain/AbProbe: SBT_OPTS land in the sbt launcher
  // JVM, not the fork, without this
  sys.props.toSeq.collect { case (k, v) if k.startsWith("graft.") => s"-D$k=$v" }
