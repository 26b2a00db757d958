package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{
  SparkListener, SparkListenerJobEnd, SparkListenerJobStart,
  SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round diagnostic: run one registry query (default twice,
  * `SPARK_GRAFT_PROFILE_RUNS`) and print every Spark job's wall time and
  * every stage's task count / task-time total / shuffle bytes — the
  * local-mode stand-in for the Spark UI's stage table (the UI is off in
  * [[Bench]], and the bench only reports per-query totals). Where a
  * query's seconds go — scan compute vs. exchange vs. many tiny
  * materialization jobs — is exactly what this table answers.
  *
  * `sbt "runMain graft.QueryProfile q_x13_ann_ivfsq8_join"`
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProfile <query-name> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new ConcurrentLinkedQueue[String]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.getOrDefault(je.jobId, 0L)
        val ms = if (t0 == 0) -1 else (System.nanoTime() - t0) / 1000000
        jobs.add(f"    job ${je.jobId}%3d  ${ms}%6d ms")
      }
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        jobs.add(f"      stage ${si.stageId}%3d " +
          f"tasks=${si.numTasks}%4d " +
          f"taskTime=${m.executorRunTime}%6d ms " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead}%9d" +
          f"/${m.shuffleReadMetrics.recordsRead}%8d " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten}%9d" +
          f"/${m.shuffleWriteMetrics.recordsWritten}%8d  " +
          si.name.take(60))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm the read path like Bench does — and SAY when the warm-up
    // did not happen, so a cold run-1 is flagged instead of silently
    // skewing the printed numbers (media/web queries additionally pay
    // their own first-table cold scan either way; trust run 2+)
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch {
      case e: Throwable =>
        println(s"[profile] warm-up read failed (${e.getMessage}); " +
          "run-1 numbers are cold")
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.exists(n.contains))
    names.foreach { name =>
      for (r <- 1 to runs) {
        jobs.clear()
        spark.catalog.clearCache()
        System.gc()
        Thread.sleep(200)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        // the listener bus is asynchronous: give it a moment to drain
        // before the table is printed and cleared, or a late event from
        // this run would be dropped or charged to the next one
        Thread.sleep(300)
        println(f"== $name run $r: $sec%.3f s, ${jobs.size} events")
        jobs.forEach(l => println(l))
      }
    }
    spark.stop()
  }
}
