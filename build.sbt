ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "eclipsespark"
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
// Without this, sbt's logger prefixes every forked-run stdout line with
// "[info] " — so the bench's one-line JSON contract (Bench.scala: "prints
// ONE JSON line for the driver") was never satisfied in any round: the
// driver's parse read null 16 rounds straight. StdoutOutput passes the
// forked JVM's stdout through raw.
run / outputStrategy := Some(StdoutOutput)
// ... and without this, sbt appends "[success] Total time: ..." AFTER the
// bench's JSON, so a parser that reads the LAST line still fails. With both,
// the compact JSON is the final line of stdout.
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
  // local[32] with 70+ array-heavy queries needs headroom; GC thrash at 8g
  // inflated bench medians ~2x, and 28g still showed 15s G1 storms on the
  // iterative graph queries (machine has 128 GiB — use it)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
) ++
  // extra JVM flags for measured A/B only (e.g. SPARK_GRAFT_GC_FLAGS=
  // "-XX:+UseParallelGC" to test the collector against the documented G1
  // storms); default empty keeps the committed baseline comparable
  sys.env.get("SPARK_GRAFT_GC_FLAGS").toSeq.flatMap(_.split("\\s+")).filter(_.nonEmpty)
