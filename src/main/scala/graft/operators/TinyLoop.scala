package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.graft.ColumnBridge

/** Materialization helper for the iterative operators' per-round frames
  * ([[LinkGraph]], [[ConnectedComponents]], [[Outlinks]] redirect
  * resolution, [[TextAnalysis.deriveBpeMerges]], [[CrawlLoop]] cycle
  * state).
  *
  * Under AQE every `Exchange` in a materialized round becomes its own
  * query-stage JOB (submit → execute → re-optimize → submit the next),
  * ~90-150 ms of driver/scheduler latency in local mode REGARDLESS of
  * data volume. For an iterative operator whose round frames are
  * provably tiny, that latency IS the runtime: q_t78's warm profile
  * showed ~74 sub-second jobs for 82-row rank frames (optimization
  * guide §1.1/§2.4 — at this size the shuffle *count*, not bytes, is
  * the lever; micro-benchmarked at ~175 ms/round adaptive vs ~120 ms
  * compact, per-round breakdown ~15 ms analysis + ~12 ms planning +
  * the rest execution).
  *
  * When a loop holds MEASURED evidence that its frames are tiny — row
  * counts it already pays for (convergence probes, node counts) — the
  * round materializes through a COMPACT SESSION: a one-time
  * `cloneSession` of the caller's session with AQE off and one shuffle
  * partition. The round's logical plan is rebound into the clone
  * ([[ColumnBridge.ofRows]]), executes as ONE non-adaptive job, and the
  * pinned result (a `LogicalRDD` over cached blocks) is rebound back to
  * the caller's session, so everything downstream — including the
  * declared query's final adaptive execution — is untouched. The clone
  * is why no session conf is ever mutated: conf flips on a shared
  * session would leak into queries planned CONCURRENTLY on other
  * threads (streaming micro-batches, a multi-tenant driver at scale).
  *
  * Results are unaffected: AQE never changes query semantics, and for
  * aggregations the per-key merge set (all map-side partials of the
  * key) is identical under any reduce partition count — re-certified
  * against the DuckDB oracle (230/0/3 at sf0.001 and sf0.01) after
  * each adopting operator changed.
  *
  * Scale-adaptive by construction, NOT a local-mode config twiddle: the
  * gate compares measured row counts against
  * `spark.graft.loop.tinyRows` (default 100000; settable per session or
  * via `SPARK_GRAFT_TINY_LOOP_ROWS`, 0 disables). Above the threshold —
  * every genuinely large run — nothing changes: the loop materializes
  * under whatever adaptive configuration the session carries, exactly
  * as before. The 100 TB path is the `else` branch.
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

  /** Gate master switch. Operators whose gate needs a count the loop
    * does NOT otherwise pay (an extra cached scan) must check this
    * FIRST: with the mechanism disabled (threshold 0) the operator has
    * to behave exactly as before it adopted TinyLoop — zero extra
    * jobs — which is also what makes disabled-mode profiles an honest
    * before/after baseline. */
  def enabled(spark: SparkSession): Boolean = threshold(spark) > 0

  /** True when every measured count is known (>= 0) and below the
    * threshold. Callers must pass counts covering EVERY frame the round
    * plan reads — including the pinned edge list a round re-joins — or
    * a big build side would execute single-partitioned. */
  def isTiny(spark: SparkSession, measured: Long*): Boolean = {
    val t = threshold(spark)
    t > 0 && measured.nonEmpty && measured.forall(m => m >= 0 && m < t)
  }

  // one compact clone per caller session, created lazily and dropped
  // with it. Weak KEYS alone would not reclaim anything: the clone
  // strongly references its parent (SparkSession.parentSessionState),
  // i.e. the value reaches the key — so the clone is held SOFTLY,
  // letting the GC drop the whole pair under memory pressure (a
  // cleared entry just re-clones, ~ms) while a stable driver keeps its
  // clone cached.
  private val compactSessions = new java.util.WeakHashMap[
    SparkSession, java.lang.ref.SoftReference[SparkSession]]()

  private def compactSession(spark: SparkSession): SparkSession =
    compactSessions.synchronized {
      val cached = compactSessions.get(spark)
      val live = if (cached == null) null else cached.get()
      if (live != null) live
      else {
        val c = ColumnBridge.cloneSession(spark)
        c.conf.set("spark.sql.adaptive.enabled", "false")
        c.conf.set("spark.sql.shuffle.partitions", "1")
        compactSessions.put(
          spark, new java.lang.ref.SoftReference(c))
        c
      }
    }

  /** The frame, rebound to execute under the compact session when
    * `tiny` (the caller runs its own action — e.g. the BPE argmax
    * `collect`); identity otherwise. */
  def compactExec(df: DataFrame, tiny: Boolean): DataFrame =
    if (!tiny) df
    else ColumnBridge.ofRows(
      compactSession(df.sparkSession), ColumnBridge.logicalPlan(df))

  /** `localCheckpoint()` — through the compact session when `tiny`.
    * The pinned result is rebound to the CALLER's session either way,
    * so downstream composition and the final (declared) execution stay
    * on the caller's configuration. */
  def pin(df: DataFrame, tiny: Boolean): DataFrame =
    if (!tiny) df.localCheckpoint()
    else {
      val spark = df.sparkSession
      val pinned = compactExec(df, tiny = true).localCheckpoint()
      ColumnBridge.ofRows(spark, ColumnBridge.logicalPlan(pinned))
    }

  /** [[pin]] with a riding long-valued metric (a sum/count over the
    * pinned rows) — the convergence probe costs ZERO extra jobs (the
    * [[ConnectedComponents]] Observation trick). The Observation is
    * attached to the frame AFTER any compact-session rebinding:
    * execution-end events are delivered per session, so observing the
    * caller's frame and executing the clone's would wait forever. */
  def pinCounted(
      df: DataFrame, tiny: Boolean, name: String, metric: Column)
      : (DataFrame, Long) = {
    val spark = df.sparkSession
    val obs = Observation(name)
    val pinned = compactExec(df, tiny).observe(obs, metric.as("__tl_n"))
      .localCheckpoint()
    val value = obs.get.get("__tl_n") match {
      case None | Some(null) => 0L // empty frame: aggregate over 0 rows
      case Some(v) => v.asInstanceOf[java.lang.Number].longValue()
    }
    val rebound =
      if (!tiny) pinned
      else ColumnBridge.ofRows(spark, ColumnBridge.logicalPlan(pinned))
    (rebound, value)
  }
}
