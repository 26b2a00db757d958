package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit diagnostic: prints exchange/window/generate lines of the
  * physical plan for the named registry queries (all when none named).
  * `sbt "runMain graft.PlanDump q_x8 q_t30"` — the per-round audit tool
  * behind the "iterate until it's the plan you'd want" discipline.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty)
        SparkEntry.queries.keys.filter(n => args.exists(n.contains)).toSeq
      else SparkEntry.queries.keys.toSeq
    names.sorted.foreach { n =>
      println(s"===== $n")
      try {
        val p = SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.executedPlan.toString
        val lines = p.split("\n")
        println(s"  shuffles=${lines.count(_.contains("Exchange hashpartitioning")) +
          lines.count(_.contains("Exchange rangepartitioning"))}" +
          s" broadcasts=${lines.count(_.contains("BroadcastExchange"))}" +
          s" windows=${lines.count(_.trim.startsWith("Window")) +
            lines.count(_.contains("RunningWindowFunction"))}")
        lines.filter(l => l.contains("Exchange") || l.contains("Window")
            || l.contains("Generate") || l.contains("SortMergeJoin")
            || l.contains("BroadcastHashJoin"))
          .foreach(l => println("  " + l.trim.take(140)))
      } catch { case e: Throwable =>
        println(s"  FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
