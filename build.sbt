ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "buildkitelogsparquetspark"
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
// The bench's one-line JSON contract: the forked run's stdout must reach
// the console UNDECORATED (sbt's default LoggedOutput prefixes every line
// with "[info] ", which breaks any consumer that parses the final stdout
// line as JSON), and sbt's own "[success] Total time: ..." epilogue must
// not displace the JSON as the last line.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// per-test durations in the report (slow-suite forensics)
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// Per-suite forked JVMs, several in flight: the single-JVM serial run
// measured ~30 min on an idle 32-core host (PropertySpec 529 s,
// OperatorsSpec 396 s, StreamingSpec 355 s, CliSpec 192 s — mostly
// independent local[4] Spark jobs that never fill the machine), and the
// round-20 driver test run was torn down mid-write, i.e. it overran its
// window. Heavy suites get their own JVM (isolated SparkSession, temp
// dirs, warehouse), light suites share one; 6 groups in flight × local[4]
// sessions ≈ 24 active cores. Each group gets a PRIVATE warehouse dir so
// bucketed-table tests (fixed catalog names) can never collide.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val jvmOpts = (Test / javaOptions).value.toVector
  val whBase = (Test / target).value / "test-warehouses"
  def group(name: String, ts: Seq[TestDefinition]) =
    Tests.Group(name, ts, Tests.SubProcess(ForkOptions().withRunJVMOptions(
      jvmOpts :+ s"-Dspark.sql.warehouse.dir=${(whBase / name).getAbsolutePath}")))
  val heavy = Set("PropertySpec", "OperatorsSpec", "OperatorsSpec2",
    "StreamingSpec", "StreamingSpec2", "CliSpec", "HllStoreSpec",
    "SketchStoreSpec", "LshIndexSpec", "FuzzEquivalenceSpec")
    .map("graft." + _)
  val (big, light) = tests.partition(t => heavy(t.name))
  (big.sortBy(_.name).map(t => group(t.name.stripPrefix("graft."), Seq(t))) :+
    group("light-suites", light)).toSeq
}
Global / concurrentRestrictions := Seq(
  Tags.limitAll(24), Tags.limit(Tags.ForkedTestGroup, 6))
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
)
