package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The heavy crawlCycles capstone tests, split out of
  * [[NorthStarSpec]] (together they were ~10 of its 12 minutes) so the
  * full suite parallelizes across forked test groups and fits a bounded
  * runner. Tests moved VERBATIM — nothing weakened. Part A. */
class NorthStarCrawlASpec extends AnyFunSuite {
  import GraftSpark.spark

  test("crawlCycles revisitMode=rate: a fast-changing page refetches more often than under backoff") {
    import spark.implicits._
    import graft.operators.CrawlLoop
    val base = java.nio.file.Files
      .createTempDirectory("graft_crawl_rate").toString
    val W = "https://rt.example"
    // /hot rewrites EVERY cycle, /calm never: on the same synthetic
    // web, the Poisson scheduler must learn /hot's rate and refetch it
    // more often than backoff's blind doubling does
    def page(url: String, cycle: Int): (Int, String) =
      url.stripPrefix(W) match {
        case "/" => (200,
          """<a href="/hot">h</a><a href="/calm">c</a>""")
        case "/hot" => (200, s"hot content, version $cycle")
        case "/calm" => (200, "calm forever")
        case _ => (404, "nope")
      }
    val day0 = java.time.Instant.parse("2026-08-01T00:00:00Z")
      .getEpochSecond.toDouble
    def fetchFn(plan: org.apache.spark.sql.DataFrame, cycle: Int)
        : org.apache.spark.sql.DataFrame =
      plan.select("frontier_url").as[String].collect().toSeq.map { u =>
        val (st, body) = page(u, cycle)
        (u, java.time.Instant.ofEpochSecond(
            (day0 + cycle * 43200.0).toLong).toString,
          s"<urn:rt:$cycle:$u>", "text/html; charset=utf-8",
          body.getBytes("UTF-8"), st,
          null.asInstanceOf[Map[String, String]])
      }.toDF("target_uri", "warc_date", "record_id",
        "http_content_type", "payload", "http_status", "http_headers")
    def run(tag: String, mode: String) = CrawlLoop.crawlCycles(spark,
      seeds = Seq(s"$W/").toDF("url"), seedCol = "url",
      fetch = fetchFn, archiveDir = s"$base/$tag",
      policies = Seq.empty[(String, String)].toDF("host", "robots"),
      hostCol = "host", robotsCol = "robots", agent = "graftbot",
      cycles = 8,
      clock = Some(c => day0 + c * 43200.0), // 12 h ticks
      revisitMode = mode, revisitStaleRisk = 0.1)
    def hotFetches(rs: Seq[graft.operators.CrawlLoop.CycleResult]) =
      rs.map(_.plan.select("frontier_url").as[String].collect()
        .count(_ == s"$W/hot")).sum
    val rateHot = hotFetches(run("rate", "rate"))
    val backoffHot = hotFetches(run("backoff", "backoff"))
    // both modes fetch /hot at least twice (discovery + one revisit);
    // the rate scheduler, having OBSERVED the page change on every
    // revisit, converges to near-every-cycle refetching while backoff
    // stays pinned at its base interval (one day = every other tick)
    assert(backoffHot >= 2, s"backoff must revisit at all: $backoffHot")
    assert(rateHot > backoffHot,
      s"rate mode must refetch the fast page more often: " +
        s"rate=$rateHot backoff=$backoffHot")
  }

  test("crawlCycles fetchRobots: policies fetch in-loop, 404 hosts default-allow once") {
    import spark.implicits._
    import graft.operators.CrawlLoop
    val archiveDir = java.nio.file.Files
      .createTempDirectory("graft_crawl_robots").toString + "/arc"
    val W = "https://rw.example"
    def page(url: String): (Int, String) =
      if (url == s"$W/robots.txt")
        (200, "User-agent: *\nDisallow: /secret")
      else if (url == "https://rz.example/robots.txt") (404, "nope")
      else if (url.startsWith("https://rz.example/"))
        (200, s"z page $url")
      else url.stripPrefix(W) match {
        case "/" => (200,
          """<a href="/a">a</a><a href="/secret">s</a>""" +
            """<a href="https://rz.example/p/0">z0</a>""" +
            """<a href="https://rz.example/p/1">z1</a>""")
        case "/a" => (200, "leaf a")
        case "/secret" => (200, "must never be fetched")
        case _ => (404, "nope")
      }
    val day0 = java.time.Instant.parse("2026-04-01T00:00:00Z")
      .getEpochSecond.toDouble
    def dateOf(c: Int) = f"2026-04-${c + 1}%02dT00:00:00Z"
    def fetchFn(plan: org.apache.spark.sql.DataFrame, cycle: Int)
        : org.apache.spark.sql.DataFrame =
      plan.select("frontier_url").as[String].collect().toSeq.map { u =>
        val (st, body) = page(u)
        (u, dateOf(cycle), s"<urn:rb:$cycle:$u>",
          "text/html; charset=utf-8", body.getBytes("UTF-8"), st,
          null.asInstanceOf[Map[String, String]])
      }.toDF("target_uri", "warc_date", "record_id",
        "http_content_type", "payload", "http_status", "http_headers")
    val results = CrawlLoop.crawlCycles(spark,
      seeds = Seq(s"$W/").toDF("url"), seedCol = "url",
      fetch = fetchFn, archiveDir = archiveDir,
      policies = Seq.empty[(String, String)].toDF("host", "robots"),
      hostCol = "host", robotsCol = "robots", agent = "graftbot",
      cycles = 3,
      maxAgeSeconds = 30L * 86400L, // policies stay fresh all run
      clock = Some(c => day0 + c * 86400.0),
      fetchRobots = true)
    val plans = results.map(_.plan.select("frontier_url")
      .as[String].collect().toSeq)
    // cycle 0 resolves the seed host's robots, cycle 1 the newly
    // discovered host's (a 404 — default-allow), cycle 2 nothing: both
    // attempts are fresh, INCLUDING the 404 one
    assert(results.map(_.robotsFetched) == Seq(1L, 1L, 0L),
      s"got: ${results.map(_.robotsFetched)}")
    // the policy fetched IN cycle 0 gates /secret from cycle 1 on (it
    // is carried, re-gated, never planned)
    assert(plans.flatten.forall(!_.contains("/secret")),
      s"in-loop policy must gate the disallowed path: $plans")
    // the 404-robots host default-allows: its pages plan in cycle 1
    assert(plans(1).count(_.startsWith("https://rz.example/")) == 2,
      s"404 robots must default-allow: ${plans(1)}")
    // robots URLs are infrastructure — never in the page plan
    assert(plans.flatten.forall(!_.contains("robots.txt")))
    // DURABLE STATE: an interrupted 2-cycle run resumed at cycle 2
    // produces BYTE-identical cycle-2 results to the uninterrupted
    // 3-cycle run — every loop operator is deterministic, and the
    // persisted state (seen/pending/signals/policies/attempts) plus
    // the shared archive are the complete cross-cycle inputs
    val base = java.nio.file.Files
      .createTempDirectory("graft_crawl_resume").toString
    def run(arc: String, state: String, n: Int, from: Int = 0) =
      CrawlLoop.crawlCycles(spark,
        seeds = Seq(s"$W/").toDF("url"), seedCol = "url",
        fetch = fetchFn, archiveDir = arc,
        policies = Seq.empty[(String, String)].toDF("host", "robots"),
        hostCol = "host", robotsCol = "robots", agent = "graftbot",
        cycles = n, maxAgeSeconds = 30L * 86400L,
        clock = Some(c => day0 + c * 86400.0),
        fetchRobots = true,
        stateDir = Some(state), startCycle = from)
    val unbroken = run(s"$base/arcA", s"$base/stA", 3)
    run(s"$base/arcB", s"$base/stB", 2) // "dies" after cycle 1
    val resumed = run(s"$base/arcB", s"$base/stB", 3, from = 2)
    assert(resumed.size == 1 && resumed.head.cycle == 2)
    val wantRows = unbroken(2).plan.collect().map(_.toString).toSet
    val gotRows = resumed.head.plan.collect().map(_.toString).toSet
    assert(gotRows == wantRows,
      s"resumed cycle diverged from the unbroken run:\n" +
        s" want=$wantRows\n got=$gotRows")
    assert((resumed.head.frontierSize, resumed.head.dueRevisits,
      resumed.head.robotsFetched) ==
      ((unbroken(2).frontierSize, unbroken(2).dueRevisits,
        unbroken(2).robotsFetched)))
    // INCREMENTAL state: cycle N's `seen` delta holds exactly cycle
    // N's planned URLs, not the cumulative set — total state I/O is
    // O(crawl), not O(cycles × crawl)
    val seenDeltas = (0 to 1).map(k =>
      spark.read.parquet(s"$base/stB/cycle=$k/seen").count())
    assert(seenDeltas == (0 to 1).map(k => unbroken(k).plannedCount),
      s"state must persist per-cycle deltas: $seenDeltas vs " +
        s"${(0 to 1).map(k => unbroken(k).plannedCount)}")
    // warm-started ranking (last cycle's vector seeds this cycle's
    // PageRank) changes mid-convergence VALUES, never coverage: the
    // same crawl re-run warm plans exactly the same URL set per cycle
    val warm = CrawlLoop.crawlCycles(spark,
      seeds = Seq(s"$W/").toDF("url"), seedCol = "url",
      fetch = fetchFn,
      archiveDir = archiveDir + "_warm",
      policies = Seq.empty[(String, String)].toDF("host", "robots"),
      hostCol = "host", robotsCol = "robots", agent = "graftbot",
      cycles = 3,
      maxAgeSeconds = 30L * 86400L,
      clock = Some(c => day0 + c * 86400.0),
      fetchRobots = true, warmStartRanks = true)
    val warmPlans = warm.map(_.plan.select("frontier_url")
      .as[String].collect().toSet)
    assert(warmPlans == plans.map(_.toSet),
      s"warm-start must not change per-cycle coverage:\n" +
        s"  cold=$plans\n  warm=$warmPlans")
  }

  test("crawlCycles survives a drained crawl: empty cycles are no-ops") {
    import spark.implicits._
    import graft.operators.CrawlLoop
    val archiveDir = java.nio.file.Files
      .createTempDirectory("graft_crawl_drained").toString + "/arc"
    // one linkless leaf and no clock: cycle 0 fetches it, cycles 1-2
    // have an EMPTY frontier, an empty plan, and an empty archive
    // batch — the loop must ride through, not crash on empty frames
    def fetchFn(plan: org.apache.spark.sql.DataFrame, cycle: Int)
        : org.apache.spark.sql.DataFrame =
      plan.select("frontier_url").as[String].collect().toSeq.map { u =>
        (u, "2026-06-01T00:00:00Z", s"<urn:dr:$cycle:$u>",
          "text/html; charset=utf-8",
          "a linkless leaf".getBytes("UTF-8"), 200,
          null.asInstanceOf[Map[String, String]])
      }.toDF("target_uri", "warc_date", "record_id",
        "http_content_type", "payload", "http_status", "http_headers")
    val results = CrawlLoop.crawlCycles(spark,
      seeds = Seq("https://dr.example/only").toDF("url"), seedCol = "url",
      fetch = fetchFn, archiveDir = archiveDir,
      policies = Seq.empty[(String, String)].toDF("host", "robots"),
      hostCol = "host", robotsCol = "robots", agent = "graftbot",
      cycles = 3)
    assert(results.map(_.plannedCount) == Seq(1L, 0L, 0L),
      s"got: ${results.map(_.plannedCount)}")
    assert(results.map(_.archivedRecords) == Seq(1L, 0L, 0L))
    assert(results.map(_.frontierSize) == Seq(1L, 0L, 0L))
  }

}
