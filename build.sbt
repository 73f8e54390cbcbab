ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stromspark"
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
// Forked `run` output goes straight to stdout, un-prefixed — the bench
// harness greps for the bare one-line JSON that Bench/Verify print.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // Extra JVM flags (space-separated) for experiments — e.g.
  // SPARK_GRAFT_JAVA_OPTS="-XX:+UseParallelGC" to A/B a collector.
  // Default empty: the shipped run uses the JVM defaults.
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))

// Parallel test groups: suites are partitioned into forked JVMs that
// run CONCURRENTLY (suite wall-clock ~716s single-JVM -> a few min).
// JVM-per-group isolation is what makes this safe with Spark: several
// suites mutate their session conf (codegen factory mode, broadcast
// thresholds) and a shared concurrent session would leak those into
// other suites' plan assertions. StreamingSpec gets a dedicated group
// so its stateful named memory sinks stay serialized with each other;
// every other suite lands in a stable hash bucket. Opt out (one JVM,
// fully serial) with SPARK_GRAFT_SERIAL_TESTS=1 — e.g. on a small box
// where N concurrent local[4] sessions would thrash.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / forkOptions).value
  if (sys.env.get("SPARK_GRAFT_SERIAL_TESTS").contains("1"))
    Seq(Tests.Group("all", tests, Tests.SubProcess(opts)))
  else {
    val nHash = 5
    tests.groupBy { t =>
      if (t.name.endsWith("StreamingSpec")) "streaming"
      else "g" + (math.abs(t.name.hashCode) % nHash)
    }.toSeq.sortBy(_._1).map { case (name, ts) =>
      Tests.Group(name, ts, Tests.SubProcess(opts))
    }
  }
}
Global / concurrentRestrictions := Seq(Tags.limit(Tags.ForkedTestGroup, 6))
