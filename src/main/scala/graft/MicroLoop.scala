package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic (not part of the engine): isolate the per-round
  * materialization cost of an iterative join+agg loop under different
  * execution configs. */
object MicroLoop {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val e = (0 until 10000).map(i => (s"n${i % 40}", s"n${(i * 7 + 3) % 40}"))
      .toDF("src", "dst").localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()

    def round(ranks: DataFrame): DataFrame = {
      val inflow = e.join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank")).as("inf"))
      nodes.join(inflow, Seq("node"), "left")
        .select(col("node"), coalesce(col("inf"), lit(0.0)).as("rank"))
    }

    def loop(tag: String, aqe: Boolean, parts: String, n: Int,
        codegen: Boolean = true): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      var ranks = nodes.withColumn("rank", lit(1.0 / 40)).localCheckpoint()
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        val df = round(ranks)             // Dataset creation = analysis
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan    // optimize + plan + prepare
        val t2 = System.nanoTime()
        ranks = df.localCheckpoint()      // execute + cache
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e6, (t2 - t1) / 1e6, (t3 - t2) / 1e6)
      }
      println(f"[micro] $tag: per-round (analyze/plan/exec) ms = " +
        times.map { case (a, p, x) => f"$a%.0f/$p%.0f/$x%.0f" }
          .mkString(", "))
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }

    // warm
    loop("warm aqe", aqe = true, cpus, 8)
    loop("aqe32", aqe = true, cpus, 10)
    loop("noaqe1", aqe = false, "1", 10)
    loop("noaqe4", aqe = false, "4", 10)
    loop("aqe32b", aqe = true, cpus, 10)
    loop("noaqe1b", aqe = false, "1", 10)
    loop("noaqe1-nocodegen", aqe = false, "1", 10, codegen = false)
    loop("aqe32-nocodegen", aqe = true, cpus, 10, codegen = false)
    loop("noaqe1-nocodegen-b", aqe = false, "1", 10, codegen = false)
    spark.stop()
  }
}
