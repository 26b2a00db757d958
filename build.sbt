ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "interopspark"
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
// -oD: per-test durations in the report — the suite must fit a bounded
// test runner, so where its minutes go has to be visible
Test / testOptions += Tests.Argument(
  TestFrameworks.ScalaTest, "-oD")
// The full suite is ~25 sequential minutes in one forked JVM — long
// enough that a bounded/slower runner can hit its ceiling mid-suite
// (the r21 driver run died exactly that way). Partition the suites
// into PARALLEL forked groups: wall time becomes the longest group,
// not the sum. Pinned assignments keep (a) the heavy crawl capstones
// split across two groups and (b) every suite that materializes
// fixed-name warehouse tables (graft_b_*, graft_q_b_*) in ONE group —
// two JVMs racing on the same managed-table location would flake.
// Everything else spreads by name hash. Suites within a group still
// run sequentially in their own JVM, so no shared-session state races.
// measured poles (first grouped run): the crawl capstones ~300 s each
// group, the streaming suites wall-clock-bound and contention-
// sensitive (StreamingSpec 84 s solo, 630 s when boxed with CPU-heavy
// suites) — so the five heaviest suites spread across all groups
val pinnedTestGroups: Map[String, Int] = Map(
  "graft.NorthStarCrawlASpec" -> 0,
  "graft.AnnStreamSpec" -> 0,
  "graft.NorthStarCrawlBSpec" -> 1,
  "graft.SamplingSpec" -> 1,
  "graft.NorthStarSpec" -> 2,
  "graft.StreamingSpec" -> 2,
  "graft.CrawlKernelFuzzSpec" -> 2,
  "graft.ScaleProbeSpec" -> 2,
  "graft.RecallSpec" -> 2,
  "graft.CoreQueriesSpec" -> 3,
  "graft.PlanSpec" -> 3,
  "graft.BucketingSpec" -> 3,
  "graft.DocsSpec" -> 3,
  "graft.ModelPersistenceSpec" -> 3,
)
val nTestGroups = 4
Test / testGrouping := {
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  (Test / definedTests).value
    .groupBy(t => pinnedTestGroups.getOrElse(
      t.name, math.abs(t.name.hashCode) % nTestGroups))
    .toSeq.sortBy(_._1)
    .map { case (id, ts) =>
      Tests.Group(s"group$id", ts, Tests.SubProcess(forkOpts)) }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, nTestGroups),
  Tags.limitAll(nTestGroups + 2))
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
