package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialization helper for the iterative operators' per-round frames
  * ([[LinkGraph]], [[ConnectedComponents]], [[Outlinks]] redirect
  * resolution, [[CrawlLoop]] cycle state).
  *
  * Under AQE every `Exchange` in a materialized round becomes its own
  * query-stage JOB (submit → execute → re-optimize → submit the next),
  * which costs ~90-150 ms of driver/scheduler latency in local mode
  * REGARDLESS of data volume. For an iterative operator whose round
  * frames are provably tiny, that latency IS the runtime: q_t78's warm
  * profile showed ~74 sub-second jobs for 82-row rank frames — pure
  * stage-materialization overhead (optimization guide §1.1/§2.4: the
  * shuffle *count*, not bytes, is the lever at this size).
  *
  * When a loop holds MEASURED evidence that its frames are tiny — row
  * counts the loop already pays for (convergence probes, node counts) —
  * [[compact]] runs the round's materialization as ONE non-adaptive job
  * over a single shuffle partition: every exchange in the round plan is
  * executed inside one job by the DAG scheduler back to back, with no
  * per-stage AQE replanning round-trips.
  *
  * Results are unaffected: AQE never changes query semantics, and for
  * aggregations the per-key merge set (all map-side partials of the
  * key) is identical under any reduce partition count — re-certified
  * against the DuckDB oracle after each adopting operator changed.
  *
  * Scale-adaptive by construction, NOT a local-mode config twiddle: the
  * gate compares measured row counts against
  * `spark.graft.loop.tinyRows` (default 100000; settable per session or
  * via `SPARK_GRAFT_TINY_LOOP_ROWS`, 0 disables). Above the threshold —
  * every genuinely large run — nothing changes: the loop materializes
  * under whatever adaptive configuration the session carries, exactly
  * as before. The 100 TB path is the `else` branch.
  *
  * Thread-scoping caveat: the conf flip is session-visible for the
  * duration of one materialization. Queries planned concurrently on
  * OTHER threads of the same session during that window would plan
  * non-adaptively — harmless for results, visible in plans. The
  * declared query paths are sequential; streaming sinks plan their
  * batches on their own trigger thread, so a crawl loop driven
  * concurrently with an active streaming query may occasionally produce
  * a non-adaptive micro-batch plan (same rows either way).
  */
object TinyLoop {
  /** Session conf key: round frames with every measured count below
    * this run non-adaptively in one shuffle partition; 0 disables. */
  val ThresholdConf = "spark.graft.loop.tinyRows"

  private val DefaultThreshold = 100000L

  def threshold(spark: SparkSession): Long =
    spark.conf.getOption(ThresholdConf)
      .orElse(sys.env.get("SPARK_GRAFT_TINY_LOOP_ROWS"))
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
      .getOrElse(DefaultThreshold)

  /** True when every measured count is known (>= 0) and below the
    * threshold. Callers must pass counts covering EVERY frame the round
    * plan reads — including the pinned edge list a round re-joins — or
    * a big build side would execute single-partitioned. */
  def isTiny(spark: SparkSession, measured: Long*): Boolean = {
    val t = threshold(spark)
    t > 0 && measured.nonEmpty && measured.forall(m => m >= 0 && m < t)
  }

  /** Run `body` (actions over tiny frames) with AQE off and one shuffle
    * partition, restoring the session conf afterwards. No-op when
    * `tiny` is false. */
  def compact[T](spark: SparkSession, tiny: Boolean)(body: => T): T =
    if (!tiny) body
    else {
      val conf = spark.conf
      val aqePrev = conf.get("spark.sql.adaptive.enabled", "true")
      val partPrev = conf.get("spark.sql.shuffle.partitions", "200")
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.shuffle.partitions", "1")
      try body
      finally {
        conf.set("spark.sql.adaptive.enabled", aqePrev)
        conf.set("spark.sql.shuffle.partitions", partPrev)
      }
    }

  /** `df.localCheckpoint()` under [[compact]] when `tiny`. The plan
    * must not have been forced yet (a Dataset's physical plan is
    * prepared once, at first execution — which for a loop-round frame
    * is exactly this call). */
  def pin(df: DataFrame, tiny: Boolean): DataFrame =
    compact(df.sparkSession, tiny)(df.localCheckpoint())
}
