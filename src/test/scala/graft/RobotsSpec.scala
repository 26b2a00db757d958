package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Robots

/** RFC 9309 robots.txt evaluation: the pure kernel (group parsing,
  * merge semantics, wildcard/anchor matching, precedence) plus the
  * Column surface on a DataFrame. */
class RobotsSpec extends AnyFunSuite {

  private def allowed(robots: String, agent: String, path: String) =
    Robots.decide(robots, agent, path)._1
  private def delay(robots: String, agent: String) =
    Robots.decide(robots, agent, "/")._2

  test("wildcard and anchor matching") {
    assert(Robots.pathMatches("/p/", "/p/x"))       // prefix
    assert(!Robots.pathMatches("/p/", "/q/x"))
    assert(Robots.pathMatches("/a*b", "/aXXXb/c"))  // star spans a run
    assert(Robots.pathMatches("/a*b*c", "/a1b2b3c")) // backtracking
    assert(!Robots.pathMatches("/a*b$", "/aXb/c"))  // anchored miss
    assert(Robots.pathMatches("/a*b$", "/aXXb"))    // anchored hit
    assert(Robots.pathMatches("", "/anything"))     // empty = match all
    assert(Robots.pathMatches("/*", "/"))
    assert(!Robots.pathMatches("$", "/x"))
    assert(Robots.pathMatches("/x$", "/x"))
  }

  private val policy =
    """# global
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok$
      |
      |User-agent: BotA
      |User-agent: BotB
      |Disallow: /shared
      |
      |User-agent: bota
      |Allow: /shared/yes
      |Crawl-delay: 2.5
      |Weird-key: ignored
      |Crawl-delay: 9
      |""".stripMargin

  test("group selection: case-insensitive agent, * fallback, merge") {
    // BotA matches TWO groups — their rules merge (RFC 9309 §2.2.1)
    assert(!allowed(policy, "BOTA", "/shared/x"))
    assert(allowed(policy, "BotA", "/shared/yes/now")) // merged Allow wins
    // BotB matches only the shared group — no Allow reaches it
    assert(!allowed(policy, "botb", "/shared/yes/now"))
    assert(!allowed(policy, "BotB", "/shared/anything"))
    assert(allowed(policy, "BotB", "/other"))
    // unknown bot falls back to *
    assert(!allowed(policy, "stranger", "/private/x"))
    assert(allowed(policy, "stranger", "/public"))
    // matched group suppresses * entirely: BotA may enter /private
    assert(allowed(policy, "BotA", "/private/x"))
  }

  test("precedence: longest pattern wins; Allow wins ties; $ anchors") {
    assert(allowed(policy, "nobody", "/private/ok"))   // anchored Allow
    assert(!allowed(policy, "nobody", "/private/okx")) // anchor misses
    val tie = "User-agent: *\nDisallow: /a/b\nAllow: /a/?" // same length
    assert(allowed(tie.replace("?", "b"), "x", "/a/b"))
    // no matching rule at all → allowed
    assert(allowed("User-agent: *\nDisallow: /x", "x", "/y"))
    // empty Disallow permits everything
    assert(allowed("User-agent: *\nDisallow:", "x", "/anything"))
    // null/empty robots → allowed, no delay
    assert(allowed(null, "x", "/y") && delay(null, "x").isEmpty)
  }

  test("crawl-delay: first parseable value of the merged group") {
    assert(delay(policy, "BotA").contains(2.5))
    assert(delay(policy, "stranger").isEmpty) // * group has none
  }

  test("percent-encoding normalization (RFC 9309 §2.2.2)") {
    // unreserved + space octets decode
    assert(Robots.normalizePct("/a%20b") == "/a b")
    assert(Robots.normalizePct("/%41%7e%2Dx") == "/A~-x")
    // reserved/meta escapes preserved, canonicalized to uppercase —
    // %2F stays distinct from '/', %2A/%24 never become wildcards
    assert(Robots.normalizePct("/a%2fb") == "/a%2Fb")
    assert(Robots.normalizePct("/p%2a%24%25") == "/p%2A%24%25")
    // invalid escapes pass through verbatim
    assert(Robots.normalizePct("/x%zz%2") == "/x%zz%2")
    assert(Robots.normalizePct("/plain") == "/plain")
    // end-to-end: encoded pattern matches raw path and vice versa
    val enc = "User-agent: *\nDisallow: /a%20b"
    assert(!allowed(enc, "x", "/a b"))
    assert(!allowed(enc, "x", "/a%20b/c"))
    val raw = "User-agent: *\nDisallow: /a b"
    assert(!allowed(raw, "x", "/a%20b"))
    // %2F does NOT match a literal slash (encoded slash is data)
    val slash = "User-agent: *\nDisallow: /a%2Fb"
    assert(allowed(slash, "x", "/a/b"))
    assert(!allowed(slash, "x", "/a%2fb"))
    // an encoded '$' in a pattern is a literal, not an anchor
    val dollar = "User-agent: *\nDisallow: /d%24"
    assert(!allowed(dollar, "x", "/d%24tail"))
    assert(allowed(dollar, "x", "/d"))
  }

  test("memoized parse is verdict-identical to the uncached kernel") {
    val policies = Seq(policy,
      "User-agent: a\nDisallow: /x%2a\nAllow: /x%2Ay",
      "User-agent: *\nDisallow:\n", null)
    val agents = Seq("BotA", "botb", "stranger", null)
    val paths = Seq("/shared/yes/now", "/private/ok", "/a b",
      "/x%2Ayz", "", null)
    for (r <- policies; a <- agents) {
      // the memoized lookup must be structurally identical to a fresh
      // raw parse, on first touch AND on the cache-hit path
      if (r != null)
        assert(Robots.applicable(r, a) == Robots.applicableUncached(r, a))
      for (p <- paths) {
        val first = Robots.decide(r, a, p)
        val again = Robots.decide(r, a, p) // second hit = cache path
        assert(first == again, s"cache divergence for ($a, $p)")
      }
    }
  }

  test("sitemapUrls: absolute-only, case/space tolerant, order kept") {
    val spark = GraftSpark.spark
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val robots = "User-agent: *\r\nSITEMAP: https://a.example/1.xml\r\n" +
      "Disallow: /x\n  sitemap:\thttp://b.example/2.xml  \n" +
      "Sitemap: /relative.xml\nSitemap: ftp://c.example/3.xml\n" +
      "Sitemap: HTTPS://UP.example/5.xml\n" + // RFC 3986: scheme case-insens
      "NotASitemap: https://d.example/4.xml"
    val got = Seq(robots).toDF("r")
      .select(graft.operators.Robots.sitemapUrls(col("r")))
      .head().getSeq[String](0)
    assert(got == Seq("https://a.example/1.xml", "http://b.example/2.xml",
      "HTTPS://UP.example/5.xml"),
      s"got: $got")
    val none = Seq("User-agent: *\nAllow: /").toDF("r")
      .select(graft.operators.Robots.sitemapUrls(col("r")))
      .head().getSeq[String](0)
    assert(none.isEmpty)
  }

  test("robotsFetchList: unknown hosts only, case-normalized, distinct") {
    val spark = GraftSpark.spark
    import spark.implicits._
    val frontier = Seq("https://A.Example/p1", "https://a.example/p2",
      "https://b.example/q", "not a url").toDF("u")
    val policies = Seq(("A.EXAMPLE ", "User-agent: *")).toDF("h", "r")
    val got = graft.operators.Robots
      .robotsFetchList(frontier, "u", policies, "h")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("b.example", "https://b.example/robots.txt")),
      s"got: $got")
  }

  test("policy freshness: fresh honored, stale default-allows and refetches") {
    val spark = GraftSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val asOf = Some(lit("2026-03-01 12:00:00")
      .cast("timestamp").asInstanceOf[org.apache.spark.sql.Column])
    val pages = Seq(
      "https://fresh.example/blocked/a", "https://fresh.example/open/b",
      "https://stale.example/blocked/c", // stale gate must NOT drop this
      "https://never.example/anything").toDF("uri")
    val policies = Seq(
      ("fresh.example", "User-agent: *\nDisallow: /blocked\nCrawl-delay: 3",
        "2026-03-01 00:00:00"), // 12 h old — inside the 24 h horizon
      ("stale.example", "User-agent: *\nDisallow: /blocked\nCrawl-delay: 9",
        "2026-02-20 00:00:00")) // 9.5 d old — stale
      .toDF("host", "robots", "fat")
      .withColumn("fat", col("fat").cast("timestamp"))
    val gated = Robots.gateByPolicy(pages, "uri", policies, "host",
        "robots", "bot", fetchedAtCol = Some("fat"), asOf = asOf)
      .collect().map(_.getString(0)).toSet
    assert(gated == Set("https://fresh.example/open/b",
      "https://stale.example/blocked/c", "https://never.example/anything"),
      s"fresh policy enforced, stale treated as absent: $gated")
    // the historical signature (no fetchedAtCol) still enforces both
    val eternal = Robots.gateByPolicy(pages, "uri", policies, "host",
        "robots", "bot")
      .collect().map(_.getString(0)).toSet
    assert(eternal == Set("https://fresh.example/open/b",
      "https://never.example/anything"))
    // fetchPlan under the same contract: stale host loses its gate AND
    // its 9 s crawl-delay (floor applies)
    val plan = graft.operators.Outlinks.fetchPlan(
      pages.withColumnRenamed("uri", "frontier_url"), "frontier_url",
      policies, "host", "robots", "bot",
      fetchedAtCol = Some("fat"), asOf = asOf)
      .collect().map(r => r.getAs[String]("frontier_url") ->
        r.getAs[Double]("crawl_delay")).toMap
    assert(plan == Map(
      "https://fresh.example/open/b" -> 3.0,
      "https://stale.example/blocked/c" -> 1.0,
      "https://never.example/anything" -> 1.0), s"got: $plan")
    // the worklist surfaces BOTH the never-seen and the stale host
    val refetch = Robots.robotsFetchList(pages, "uri", policies, "host",
        fetchedAtCol = Some("fat"), asOf = asOf)
      .collect().map(_.getString(0)).toSet
    assert(refetch == Set("stale.example", "never.example"), s"$refetch")
    // a null fetched_at is stale by definition
    val nullFat = Robots.robotsFetchList(pages, "uri",
      policies.withColumn("fat", lit(null).cast("timestamp")), "host",
      fetchedAtCol = Some("fat"), asOf = asOf)
      .collect().map(_.getString(0)).toSet
    assert(nullFat == Set("fresh.example", "stale.example",
      "never.example"))
  }

  test("Column surface evaluates over a frame") {
    val spark = GraftSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val df = Seq(("/shared/x", "BotA"), ("/public", "BotA"),
      ("/private/q", "zz")).toDF("path", "agent")
    val got = df.select(col("path"),
      Robots.robotsVerdict(lit(policy), col("agent"), col("path"))
        .getField("allowed").as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map("/shared/x" -> false, "/public" -> true,
      "/private/q" -> false))
  }
}
