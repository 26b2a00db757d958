package graft

import org.apache.spark.sql.SparkSession

/** Shared test session (one per JVM; suites grab the singleton). */
object GraftSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Second session on the same context, built through the
    * [[graft.GraftExtensions]] injector (the `spark.sql.extensions`
    * deployment path) — SQL functions + the DotProductRewrite optimizer
    * rule. Shared by the extension/rewrite suites; the default/active
    * session stays [[spark]]. */
  lazy val extendedSpark: SparkSession = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  val sf = "/root/testdata/sf0.001"
}
