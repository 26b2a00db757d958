package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round evidence dump: writes `.explain("formatted")` for
  * the named registry queries to `<outDir>/<query>_<suffix>.txt`, under
  * the exact session config [[Bench]] times with. Run once at the
  * pre-round commit (suffix `before`, via a worktree) and once at HEAD
  * (suffix `after`) so the plan-diff claims in OPTIMIZATION_r*.md are
  * checkable without running Spark.
  *
  * `SPARK_GRAFT_PLAN_DIR=plans/r21 SPARK_GRAFT_PLAN_SUFFIX=after \
  *   sbt "runMain graft.PlanExplain q_x10 q_t78"`
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanExplain <query-name> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r21")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "after")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.exists(a => n == a || n.startsWith(a)))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          ExplainMode.fromString("formatted"))
        Files.write(Paths.get(outDir, s"${n}_$suffix.txt"),
          txt.getBytes(StandardCharsets.UTF_8))
        println(s"[plan] wrote $outDir/${n}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[plan] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
