ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dbtgdpranonymizerspark"
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
// Container default locale is ASCII and JDK17's sun.jnu.encoding (file-NAME
// encoding) is locale-derived at JVM startup — without this, partitioned
// writes with non-ASCII partition values (region='Autre région') fail with
// InvalidPathException.
run / envVars += "LC_ALL" -> "C.utf8"
Test / envVars += "LC_ALL" -> "C.utf8"
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dfile.encoding=UTF-8",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// r14 (VERDICT r13 ask #8 — the serial suite ran ~27 min and the driver's
// test budget killed the r13 run mid-suite): run the suites in FOUR forked
// JVMs, each with its own local[4] SparkSession. Safe to parallelize
// because every spec isolates its state under Files.createTempDirectory
// (unique path per call) and only BucketingSpec touches the shared
// warehouse dir (it is alone in that). Round-robin over sorted names
// spreads the alphabetically-adjacent heavy store suites (ConsentSpec,
// CurationOpsSpec, DeletionVectorsSpec, EraseCrashSpec) across groups.
// 4 JVMs x 8g heap x local[4] fits the 128 GiB / 32-core sandbox.
// sbt caps concurrently-running forked test groups at 1 unless told
// otherwise — without this the groups run back to back and the split
// buys nothing
Global / concurrentRestrictions := Seq(
  Tags.limitAll(8),
  Tags.limit(Tags.ForkedTestGroup, 4)
)
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  val opts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars((Test / envVars).value)
  val nGroups = 4
  (0 until nGroups).map { g =>
    Tests.Group(
      s"group$g",
      tests.zipWithIndex.collect { case (t, i) if i % nGroups == g => t },
      Tests.SubProcess(opts))
  }
}
