package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The heavy crawlCycles capstone tests, split out of
  * [[NorthStarSpec]] (together they were ~10 of its 12 minutes) so the
  * full suite parallelizes across forked test groups and fits a bounded
  * runner. Tests moved VERBATIM — nothing weakened. Part B. */
class NorthStarCrawlBSpec extends AnyFunSuite {
  import GraftSpark.spark

  test("crawlCycles capstone: focused + robots + sitemaps + rate revisits + warm ranks + durable resume COMPOSE") {
    import spark.implicits._
    import graft.operators.CrawlLoop
    val base = java.nio.file.Files
      .createTempDirectory("graft_crawl_all").toString
    val W = "https://all.example"
    // one web, every subsystem exercised: in-loop robots (gating
    // /secret, declaring the sitemap), an urlset orphan, topical vs
    // popular link structure, and a page that rewrites every cycle
    def page(url: String, cycle: Int): (Int, String) =
      url.stripPrefix(W) match {
        case "/robots.txt" => (200,
          s"User-agent: *\nDisallow: /secret\nSitemap: $W/sitemap.xml")
        case "/sitemap.xml" => (200,
          s"""<urlset><url><loc>$W/orphan</loc>""" +
            "<priority>1.0</priority></url></urlset>")
        case "/" => (200,
          """<a href="/t">quantum physics guide</a>""" +
            """<a href="/x">boring link</a>""" +
            """<a href="/y">boring link</a>""" +
            """<a href="/hot">hot stuff</a>""" +
            """<a href="/secret">secret</a>""")
        case "/t" => (200, """<a href="/deep">quantum theory notes</a>""")
        case "/x" => (200, """<a href="/pop">celebrity news</a>""")
        case "/y" => (200, """<a href="/pop">celebrity news</a>""")
        case "/hot" => (200, s"hot content, version $cycle")
        case "/secret" => (200, "must never be fetched")
        case _ => (200, "leaf")
      }
    val day0 = java.time.Instant.parse("2026-09-01T00:00:00Z")
      .getEpochSecond.toDouble
    def fetchFn(plan: org.apache.spark.sql.DataFrame, cycle: Int)
        : org.apache.spark.sql.DataFrame =
      plan.select("frontier_url").as[String].collect().toSeq.map { u =>
        val (st, body) = page(u, cycle)
        (u, java.time.Instant.ofEpochSecond(
            (day0 + cycle * 43200.0).toLong).toString,
          s"<urn:all:$cycle:$u>", "text/html; charset=utf-8",
          body.getBytes("UTF-8"), st,
          null.asInstanceOf[Map[String, String]])
      }.toDF("target_uri", "warc_date", "record_id",
        "http_content_type", "payload", "http_status", "http_headers")
    def run(tag: String, n: Int, from: Int = 0) =
      CrawlLoop.crawlCycles(spark,
        seeds = Seq(s"$W/").toDF("url"), seedCol = "url",
        fetch = fetchFn, archiveDir = s"$base/$tag/arc",
        policies = Seq.empty[(String, String)].toDF("host", "robots"),
        hostCol = "host", robotsCol = "robots", agent = "graftbot",
        cycles = n, maxAgeSeconds = 30L * 86400L,
        clock = Some(c => day0 + c * 43200.0), // 12 h ticks
        fetchRobots = true, fetchSitemaps = true,
        warmStartRanks = true,
        topics = Some(Seq("quantum").toDF("term")),
        revisitMode = "rate", revisitStaleRisk = 0.1,
        stateDir = Some(s"$base/$tag/state"), startCycle = from)
    val full = run("a", 5)
    def planOf(r: graft.operators.CrawlLoop.CycleResult) = r.plan
      .selectExpr("frontier_url", "cast(fetch_seq as long)")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val plans = full.map(planOf)
    // robots fetched in-loop and enforced for the whole run
    assert(full.head.robotsFetched == 1L
      && full.head.sitemapsFetched == 1L)
    assert(plans.flatMap(_.keys).forall(!_.contains("/secret")),
      "in-loop policy must gate /secret throughout")
    // cycle 1: the sitemap orphan (priority-1.0 bootstrap) and the
    // topical /t lead the schedule, ahead of the off-topic pool
    val p1 = plans(1)
    assert(p1.keySet == Set(s"$W/t", s"$W/x", s"$W/y", s"$W/hot",
      s"$W/orphan"), s"got: ${p1.keySet}")
    assert(Set(p1(s"$W/orphan"), p1(s"$W/t")) == Set(1L, 2L),
      s"sitemap bootstrap + topical focus must lead: $p1")
    // cycle 2: topical /deep (one in-link) beats popular /pop (two)
    val p2 = plans(2)
    assert(p2(s"$W/deep") < p2(s"$W/pop"),
      s"relevance must beat raw authority: $p2")
    // rate revisits: the every-cycle-rewriting /hot refetches at
    // least twice after discovery within 5 cycles
    assert(plans.count(_.contains(s"$W/hot")) >= 3,
      s"rate mode must chase the fast page: " +
        s"${plans.map(_.contains(s"$W/hot"))}")
    // durable resume with EVERYTHING on: a run killed after cycle 3
    // resumes into cycles 3-4 byte-identical to the unbroken run
    run("b", 3)
    val resumed = run("b", 5, from = 3)
    assert(resumed.map(planOf) == plans.drop(3),
      "all-features resume must replay the unbroken run's cycles")
  }

  test("crawlCycles: 5-cycle synthetic web — traps contained, budgets held, revisits refetch the fast page") {
    import spark.implicits._
    import graft.operators.CrawlLoop
    val archiveDir = java.nio.file.Files
      .createTempDirectory("graft_crawl_cycles").toString + "/arc"
    val W = "https://w.example"
    val trapLinks = (0 until 12)
      .map(i => s"""<a href="/trap?p=$i">t</a>""").mkString
    val zLinks = (0 until 6)
      .map(i => s"""<a href="https://z.example/p/$i">z</a>""").mkString
    // the synthetic web: a trap template, a robots-blocked path, a
    // redirect, two canonical-declaring variants, a page that changes
    // every cycle, and a budget-capped second host
    def page(url: String, cycle: Int): (Int, String, String) = {
      val path = url.stripPrefix(W)
      if (url.startsWith("https://z.example/"))
        (200, s"stable z page $url", null)
      else if (path.startsWith("/trap")) (200, s"trap page $path", null)
      else if (path.startsWith("/v?"))
        (200, s"""<link rel="canonical" href="/v">variant $path""", null)
      else path match {
        case "/" => (200,
          """<a href="/a">a</a><a href="/b">b</a><a href="/old">o</a>""" +
            s"""<a href="/secret">s</a>$trapLinks$zLinks""", null)
        case "/a" => (200, """page a <a href="/fast">f</a>""", null)
        case "/b" => (200,
          """<a href="/v?x=1">v1</a><a href="/v?x=2">v2</a>""", null)
        case "/old" => (301, "", "/c")
        case "/c" => (200, """page c <a href="/d">d</a>""", null)
        case "/d" => (200, "leaf d", null)
        case "/fast" => (200, s"fast content, version $cycle", null)
        case "/sm" => (200, "sitemap-discovered page", null)
        case "/v" => (200, "canonical v", null)
        case _ => (404, "not found", null)
      }
    }
    val day0 = java.time.Instant.parse("2026-03-01T00:00:00Z")
      .getEpochSecond.toDouble
    def dateOf(c: Int) = f"2026-03-${c + 1}%02dT00:00:00Z"
    def fetchFn(plan: org.apache.spark.sql.DataFrame, cycle: Int)
        : org.apache.spark.sql.DataFrame = {
      val urls = plan.select("frontier_url").as[String].collect().toSeq
      urls.map { u =>
        val (st, body, loc) = page(u, cycle)
        (u, dateOf(cycle), s"<urn:cc:$cycle:$u>",
          "text/html; charset=utf-8", body.getBytes("UTF-8"), st,
          if (loc == null) null else Map("location" -> loc))
      }.toDF("target_uri", "warc_date", "record_id",
        "http_content_type", "payload", "http_status", "http_headers")
    }
    val results = CrawlLoop.crawlCycles(spark,
      seeds = Seq(s"$W/").toDF("url"), seedCol = "url",
      fetch = fetchFn, archiveDir = archiveDir,
      // the policy is stamped at day 0 with a 2-day freshness horizon:
      // cycles 0-2 enforce it, from cycle 3 it is STALE and must
      // behave as absent (RFC 9309 §2.4) — the blocked path opens up
      policies = Seq(("w.example", "User-agent: *\nDisallow: /secret",
          "2026-03-01T00:00:00Z"))
        .toDF("host", "robots", "fat"),
      hostCol = "host", robotsCol = "robots", agent = "graftbot",
      cycles = 5, maxPerTemplate = 3,
      fetchedAtCol = Some("fat"), maxAgeSeconds = 2L * 86400L,
      hostBudgets = Some(Seq(("z.example", 2L)).toDF("url_host", "budget")),
      sitemaps = Some(Seq((s"$W/sm", Option.empty[String],
          Option.empty[String], Some(1.0), false))
        .toDF("loc", "lastmod", "changefreq", "priority", "is_index")),
      clock = Some(c => day0 + c * 86400.0))
    assert(results.size == 5)
    val plans = results.map(_.plan.select("frontier_url")
      .as[String].collect().toSeq)
    // budget adherence (z.example capped at 2/cycle) and trap
    // containment (template capped at 3/cycle) hold EVERY cycle
    results.zip(plans).foreach { case (r, p) =>
      assert(r.frontierSize >= r.plannedCount && r.plannedCount > 0,
        s"cycle ${r.cycle}: ${r.frontierSize} < ${r.plannedCount}")
      assert(p.count(_.startsWith("https://z.example/")) <= 2,
        s"cycle ${r.cycle} broke the z budget: $p")
      assert(p.count(_.contains("/trap")) <= 3,
        s"cycle ${r.cycle} broke trap containment: $p")
    }
    // robots gate WITH freshness: the disallowed path never schedules
    // while the policy is fresh (cycles 0-2) — the loop re-gates it
    // every cycle instead of dropping it — and first schedules once
    // the policy goes stale at cycle 3 (default-allow under RFC 9309)
    plans.take(3).foreach(p => assert(p.forall(!_.contains("/secret")),
      s"fresh policy must keep gating: $p"))
    val secretCycles = plans.zipWithIndex.collect {
      case (p, i) if p.exists(_.contains("/secret")) => i
    }
    assert(secretCycles.nonEmpty && secretCycles.head >= 3,
      s"stale policy must open the gate at cycle >= 3: $secretCycles")
    // cycle 0: seed + the sitemap-bootstrapped URL, sitemap first
    // (priority 1.0 × cold-start scale outranks the unscored seed)
    assert(plans.head.toSet == Set(s"$W/", s"$W/sm"))
    assert(results.head.plan.filter(col("fetch_seq") === 1)
      .select("frontier_url").as[String].head() == s"$W/sm")
    // frontier monotonicity: the crawl keeps discovering while there
    // is anything legitimate left — strictly growing through cycle 3
    // (by cycle 4 only the contained trap tail and revisit-due pages
    // remain, and containment deliberately counts due-again trap URLs
    // against the template cap, so the trap tail drains slowly)
    val cumulative = plans.scanLeft(Set.empty[String])(_ ++ _).tail
    cumulative.take(4).sliding(2).foreach { w =>
      assert(w(0).size < w(1).size, s"discovery stalled early: $w")
    }
    // full coverage of the legitimate web by the end
    val everPlanned = cumulative.last
    Seq("/", "/a", "/b", "/old", "/c", "/d", "/fast", "/sm", "/v",
      "/v?x=1", "/v?x=2").foreach { p =>
      assert(everPlanned.contains(s"$W$p"), s"never planned: $p")
    }
    val planCounts = plans.flatten.groupBy(identity).map {
      case (u, l) => u -> l.size
    }
    // canonical collapse: each variant fetches ONCE — its revisit-due
    // rows rewrite onto /v through the learned mapping; the redirect
    // source (3xx, never archived, never due) also fetches once
    assert(planCounts(s"$W/v?x=1") == 1 && planCounts(s"$W/v?x=2") == 1,
      s"variant aliases must not refetch: $planCounts")
    assert(planCounts(s"$W/old") == 1)
    // revisit-driven refetch: the fast-changing page re-archives as a
    // fresh response EVERY revisit; the stable page backs off after
    // one revisit record
    val archive = spark.read.format("graft-warc").load(s"$archiveDir/batch=*")
      .filter(col("warc_type") === "response"
        || col("warc_type") === "revisit")
      .select(col("target_uri"), col("warc_type"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val fastCaps = archive.filter(_._1 == s"$W/fast").map(_._2)
    assert(fastCaps.size >= 2 && fastCaps.forall(_ == "response"),
      s"fast page must refetch as fresh responses: $fastCaps")
    val aCaps = archive.filter(_._1 == s"$W/a").map(_._2)
    assert(aCaps.count(_ == "response") == 1
      && aCaps.count(_ == "revisit") >= 1,
      s"stable page must dedup its refetches: $aCaps")
    // every planned 200-URL was captured exactly once per plan row —
    // nothing double-archives, nothing is lost
    val capCounts = archive.groupBy(_._1).map { case (u, l) => u -> l.size }
    planCounts.foreach { case (u, n) =>
      // the 301 and the 404 are planned but never archive (only 200s
      // carry revisit semantics)
      val expected =
        if (u == s"$W/old" || u == s"$W/secret") 0 else n
      assert(capCounts.getOrElse(u, 0) == expected,
        s"$u: planned $n, captured ${capCounts.getOrElse(u, 0)}")
    }
  }

  test("crawlCycles fetchSitemaps: robots-declared index -> urlset -> orphan planned") {
    import spark.implicits._
    import graft.operators.CrawlLoop
    val archiveDir = java.nio.file.Files
      .createTempDirectory("graft_crawl_sitemaps").toString + "/arc"
    val W = "https://sw.example"
    def page(url: String): (Int, String) =
      url.stripPrefix(W) match {
        case "/robots.txt" => (200,
          s"User-agent: *\nAllow: /\nSitemap: $W/sitemap.xml")
        case "/sitemap.xml" => (200,
          s"""<sitemapindex><sitemap><loc>$W/child.xml</loc>""" +
            "</sitemap></sitemapindex>")
        case "/child.xml" => (200,
          s"""<urlset><url><loc>$W/orphan</loc>""" +
            "<priority>1.0</priority><changefreq>daily</changefreq>" +
            "</url></urlset>")
        case "/" => (200, """<a href="/a">a</a>""")
        case "/a" => (200, "leaf a")
        case "/orphan" => (200, "the page nothing links to")
        case _ => (404, "nope")
      }
    val day0 = java.time.Instant.parse("2026-05-01T00:00:00Z")
      .getEpochSecond.toDouble
    def dateOf(c: Int) = f"2026-05-${c + 1}%02dT00:00:00Z"
    def fetchFn(plan: org.apache.spark.sql.DataFrame, cycle: Int)
        : org.apache.spark.sql.DataFrame =
      plan.select("frontier_url").as[String].collect().toSeq.map { u =>
        val (st, body) = page(u)
        (u, dateOf(cycle), s"<urn:sm:$cycle:$u>",
          "text/html; charset=utf-8", body.getBytes("UTF-8"), st,
          null.asInstanceOf[Map[String, String]])
      }.toDF("target_uri", "warc_date", "record_id",
        "http_content_type", "payload", "http_status", "http_headers")
    val results = CrawlLoop.crawlCycles(spark,
      seeds = Seq(s"$W/").toDF("url"), seedCol = "url",
      fetch = fetchFn, archiveDir = archiveDir,
      policies = Seq.empty[(String, String)].toDF("host", "robots"),
      hostCol = "host", robotsCol = "robots", agent = "graftbot",
      cycles = 4,
      maxAgeSeconds = 30L * 86400L,
      clock = Some(c => day0 + c * 86400.0),
      fetchRobots = true, fetchSitemaps = true)
    val plans = results.map(_.plan.select("frontier_url")
      .as[String].collect().toSeq)
    // discovery cascade: cycle 0 fetches the robots-declared index,
    // cycle 1 its child urlset, then the worklist goes quiet
    assert(results.map(_.robotsFetched) == Seq(1L, 0L, 0L, 0L))
    assert(results.map(_.sitemapsFetched) == Seq(1L, 1L, 0L, 0L),
      s"got: ${results.map(_.sitemapsFetched)}")
    // the urlset's orphan (linked by NOTHING) enters the frontier the
    // cycle after its urlset parses, and its declared priority 1.0
    // bootstraps it to the head of that cycle's per-host sequence
    assert(!plans.take(2).flatten.exists(_.contains("/orphan")),
      "urlset entries feed the NEXT cycle's frontier")
    assert(plans(2).contains(s"$W/orphan"),
      s"sitemap-discovered orphan must be planned: ${plans(2)}")
    // priority 1.0 bootstraps the orphan to max(rank) — it TIES the
    // best-ranked page (/a, which wins the URL tiebreak) and schedules
    // ahead of the rank-poor due home page
    val seq2 = results(2).plan
      .select("frontier_url", "fetch_seq").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seq2(s"$W/a") == 1L && seq2(s"$W/orphan") == 2L,
      s"priority-1.0 bootstrap must tie the best rank: $seq2")
    // sitemap XML URLs are infrastructure — never in the page plan
    assert(plans.flatten.forall(u =>
      !u.contains("sitemap.xml") && !u.contains("child.xml")))
  }
  test("crawlCycles topics: topic-matched URLs plan ahead of higher-rank off-topic ones") {
    import spark.implicits._
    import graft.operators.CrawlLoop
    val base = java.nio.file.Files
      .createTempDirectory("graft_crawl_focus").toString
    val W = "https://fo.example"
    // /e gets TWO in-links (higher PageRank), /d one topical in-link:
    // an unfocused crawl schedules /e first, the focused crawl must
    // flip the order — relevance beats raw authority
    def page(url: String): (Int, String) = url.stripPrefix(W) match {
      case "/" => (200,
        """<a href="/a">quantum physics intro</a>""" +
          """<a href="/b">cat pictures</a>""" +
          """<a href="/c">more cats</a>""")
      case "/a" => (200, """<a href="/d">quantum guide</a>""")
      case "/b" => (200, """<a href="/e">celebrity gossip</a>""")
      case "/c" => (200, """<a href="/e">celebrity gossip</a>""")
      case _ => (200, "leaf")
    }
    def fetchFn(plan: org.apache.spark.sql.DataFrame, cycle: Int)
        : org.apache.spark.sql.DataFrame =
      plan.select("frontier_url").as[String].collect().toSeq.map { u =>
        val (st, body) = page(u)
        (u, f"2026-07-${cycle + 1}%02dT00:00:00Z", s"<urn:fo:$cycle:$u>",
          "text/html; charset=utf-8", body.getBytes("UTF-8"), st,
          null.asInstanceOf[Map[String, String]])
      }.toDF("target_uri", "warc_date", "record_id",
        "http_content_type", "payload", "http_status", "http_headers")
    def run(tag: String, t: Option[org.apache.spark.sql.DataFrame]) =
      CrawlLoop.crawlCycles(spark,
        seeds = Seq(s"$W/").toDF("url"), seedCol = "url",
        fetch = fetchFn, archiveDir = s"$base/$tag",
        policies = Seq.empty[(String, String)].toDF("host", "robots"),
        hostCol = "host", robotsCol = "robots", agent = "graftbot",
        cycles = 3, topics = t)
    val focused = run("focused", Some(Seq("quantum").toDF("term")))
    val control = run("control", None)
    def seqOf(r: graft.operators.CrawlLoop.CycleResult) = r.plan
      .selectExpr("frontier_url", "cast(fetch_seq as long)")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // cycle 1 plans {a,b,c}: only /a's anchor matches the topic
    val f1 = seqOf(focused(1))
    assert(f1.keySet == Set(s"$W/a", s"$W/b", s"$W/c"), s"got: $f1")
    assert(f1(s"$W/a") == 1, s"topical /a must lead cycle 1: $f1")
    // cycle 2 plans {d,e}: /e outranks /d (two in-links vs one) — the
    // CONTROL proves it by scheduling /e first; the FOCUSED run must
    // schedule topical /d ahead of it anyway
    val f2 = seqOf(focused(2))
    val c2 = seqOf(control(2))
    assert(c2(s"$W/e") < c2(s"$W/d"),
      s"control must order by raw rank (e first): $c2")
    assert(f2(s"$W/d") < f2(s"$W/e"),
      s"focus must beat raw rank (d first): $f2")
    // focus reorders, never drops: per-cycle coverage identical
    focused.zip(control).foreach { case (f, c) =>
      assert(seqOf(f).keySet == seqOf(c).keySet,
        s"cycle ${f.cycle} coverage diverged")
    }
  }

  test("crawlCycles fetchRobots: a timed-out robots fetch counts as attempted — no eternal re-plan") {
    import spark.implicits._
    import graft.operators.CrawlLoop
    val archiveDir = java.nio.file.Files
      .createTempDirectory("graft_crawl_robots_to").toString + "/arc"
    val W = "https://to.example"
    val day0 = java.time.Instant.parse("2026-04-01T00:00:00Z")
      .getEpochSecond.toDouble
    // the fetcher DROPS robots.txt rows entirely (a timeout returns no
    // row at all) — planned-means-attempted must still stamp the host,
    // so it default-allows until the freshness horizon instead of
    // re-entering the robots worklist every cycle forever
    def fetchFn(plan: org.apache.spark.sql.DataFrame, cycle: Int)
        : org.apache.spark.sql.DataFrame =
      plan.select("frontier_url").as[String].collect().toSeq
        .filterNot(_.contains("robots.txt"))
        .map { u =>
          val body = if (u == s"$W/") """<a href="/a">a</a>""" else "leaf"
          (u, f"2026-04-${cycle + 1}%02dT00:00:00Z",
            s"<urn:to:$cycle:$u>", "text/html; charset=utf-8",
            body.getBytes("UTF-8"), 200,
            null.asInstanceOf[Map[String, String]])
        }.toDF("target_uri", "warc_date", "record_id",
          "http_content_type", "payload", "http_status", "http_headers")
    val results = CrawlLoop.crawlCycles(spark,
      seeds = Seq(s"$W/").toDF("url"), seedCol = "url",
      fetch = fetchFn, archiveDir = archiveDir,
      policies = Seq.empty[(String, String)].toDF("host", "robots"),
      hostCol = "host", robotsCol = "robots", agent = "graftbot",
      cycles = 3, maxAgeSeconds = 30L * 86400L,
      clock = Some(c => day0 + c * 86400.0),
      fetchRobots = true)
    // cycle 0 plans the ONE robots fetch; cycles 1-2 must not re-plan
    // it — the attempt recorded from the PLAN, not the returned rows
    assert(results.map(_.robotsFetched) == Seq(1L, 0L, 0L),
      s"got: ${results.map(_.robotsFetched)}")
    // with no policy row the host default-allows: pages still crawl
    val planned = results.flatMap(_.plan.select("frontier_url")
      .as[String].collect()).toSet
    assert(planned == Set(s"$W/", s"$W/a"), s"got: $planned")
  }

}
