package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on
  * `SPARK_GRAFT_SF_DIR` and emits one JSON line
  * `{"metric":...,"value":N,"unit":"sec","queries":{...},"runs":{...},"sf":...}`.
  *
  * Harness-fidelity rules (each one exists because its absence produced
  * non-credible numbers in earlier rounds):
  *
  *   - '''Full-column forcing.''' `df.count()` lets Catalyst rewrite the
  *     plan to `Aggregate(count(1))` and prune every computed column, so
  *     projection-only queries timed as no-ops. We instead execute the
  *     physical plan exactly as built via `queryExecution.toRdd.count()`:
  *     every output column is materialised into `InternalRow`s, nothing
  *     is pruned, and nothing is collected to the driver.
  *   - '''Machine-readable output.''' The JSON line is written to the
  *     file named by `SPARK_GRAFT_BENCH_OUT` when set — and since r22
  *     ALWAYS to `bench_out.json` in the working directory as well — so
  *     sbt's log framing can no longer corrupt the record. The full
  *     per-query line is ~16 KB, which outlives any bounded stdout tail
  *     a harness keeps (PERF_r17-r21 all record `parsed: null` for this
  *     reason), so the LAST stdout line is a compact summary —
  *     `{"total_sec":…,"n":…,"n_errors":…,"calibration":…,
  *     "bench_out":…}` — that fits any tail and names the file holding
  *     the full record. The timing methodology is unchanged; the full
  *     line is still printed first.
  *   - '''Cross-query isolation.''' Between queries we clear the Spark
  *     cache and run an explicit GC pause, so one query's leftover heap /
  *     cached blocks can't masquerade as another query's regression.
  *   - '''Both runs reported.''' `queries` keeps the min-of-2 (the
  *     steady-state figure a long-lived cluster sees); `runs` carries
  *     both raw timings so jitter is visible instead of hidden.
  *   - '''Load calibration in-capture.''' The fixed probe trio
  *     (q_x10/q_x13/q_a13 — the bracket every cross-round
  *     adjudication uses) runs before AND after the sweep, landing as
  *     `"calibration":{"pre":…,"post":…}`: the host oscillates ~2× on
  *     minute scale, so a capture carries its own load reference and
  *     BENCH_rN comparisons normalize mechanically.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // events.ts is type-adaptive (graft.Tables.normalizeTs); nanosAsLong
      // stays on for legacy TIMESTAMP(NANOS) data compatibility.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: JIT the read path + prime file listing caches.
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }

    /** Run the query and force every output column. */
    def force(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
    }

    /** Drop cross-query state: cached blocks, then a GC+finalisation
      * pause so the next query starts from a quiet heap.
      */
    def isolate(): Unit = {
      spark.catalog.clearCache()
      System.gc()
      System.runFinalization()
      Thread.sleep(200)
    }

    // Local-iteration filter (same contract as Verify): unset → all.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.contains)))

    /** Min-of-2 for one query, isolated — the same protocol as the
      * sweep measurements. */
    def minOf2(name: String): Double = {
      isolate()
      val a = force(name); val b = force(name)
      if (a < 0 || b < 0) -1.0 else math.min(a, b)
    }

    // Host-load CALIBRATION: this machine oscillates ~2x on minute
    // scale (the r18 contended-probe adjudication), so cross-round
    // comparisons need a same-capture load reference. The fixed probe
    // trio — the three queries every adjudication since r13 brackets
    // with — runs BEFORE and AFTER the sweep and both land in the
    // JSON, so BENCH_rN deltas can be normalized mechanically instead
    // of by hand-written prose. Skipped under SPARK_GRAFT_ONLY (local
    // iteration wants speed, not cross-round comparability).
    val probeTrio = Seq("q_x10_ann_ivfpq_join", "q_x13_ann_ivfsq8_join",
      "q_a13_kmv_distinct").filter(SparkEntry.queries.contains)
    def calibrate(): Seq[(String, Double)] =
      if (only.isDefined) Nil else probeTrio.map(n => n -> minOf2(n))
    val calibPre = calibrate()

    val results = names.map { name =>
      isolate()
      val a = force(name)
      val b = force(name)
      name -> ((a, b))
    }
    val calibPost = calibrate()

    // Locale.ROOT: the f-interpolator uses the JVM default locale, and a
    // comma-decimal locale (de_DE…) would emit invalid JSON
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
    val best = results.map { case (k, (a, b)) =>
      k -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = best.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val runs = results
      .map { case (k, (a, b)) => "\"" + k + "\":[" + fmt(a) + "," + fmt(b) + "]" }
      .mkString("{", ",", "}")
    // failed queries (-1 sentinel) are excluded from the total — summing
    // them in would make the aggregate look FASTER than reality — and
    // surfaced in an errors list instead
    val failed = best.collect { case (k, v) if v < 0 => k }
    val total = best.collect { case (_, v) if v >= 0 => v }.sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    def calibJson(c: Seq[(String, Double)]) = c
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val calib = s""""calibration":{"pre":${calibJson(calibPre)},""" +
      s""""post":${calibJson(calibPost)}}"""
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""queries":$qs,"runs":$runs,"errors":$errs,$calib,""" +
        s""""sf":"$sfDir"}"""

    // stdout record first: a bad SPARK_GRAFT_BENCH_OUT path must not
    // swallow the whole run's output. NonFatal, not just IOException —
    // Paths.get itself throws InvalidPathException (a RuntimeException)
    // on malformed paths.
    println(line)
    def writeRecord(path: String): Boolean =
      try {
        Files.write(Paths.get(path),
          (line + "\n").getBytes(StandardCharsets.UTF_8))
        true
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] cannot write $path: ${e.getMessage}")
          false
      }
    // the full record always lands in a file: the env-named one when
    // set, and unconditionally bench_out.json in cwd — a tail-bounded
    // stdout capture then still leads (via the summary line below) to
    // the complete per-query map. The summary names the env path when
    // that write succeeded: the fixed default is shared cwd state, so
    // concurrent invocations (e.g. a c8/c32 scaling pair) must each be
    // followed to THEIR record, not to whichever run wrote last.
    val envOk = sys.env.get("SPARK_GRAFT_BENCH_OUT").filter(writeRecord)
    val defaultOut = "bench_out.json"
    val defaultOk = writeRecord(defaultOut)
    // LAST stdout line: a compact, always-parseable summary. It
    // deliberately carries NO "queries" map — a tail parser that reads
    // per-query maps must use the full record (first stdout line or the
    // out-file), never a truncated subset that would misread as dropped
    // queries.
    println(
      s"""{"graft_bench_summary":1,"total_sec":${fmt(total)},""" +
        s""""n":${best.size},"n_errors":${failed.size},$calib,""" +
        s""""sf":"$sfDir","cpus":$cpus,""" +
        s""""bench_out":"${
          envOk.getOrElse(if (defaultOk) defaultOut else "")
            .replace("\\", "\\\\").replace("\"", "\\\"")}"}""")
    spark.stop()
  }
}
