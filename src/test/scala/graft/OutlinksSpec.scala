package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Outlinks

/** Outlink extraction + RFC 3986 resolution + frontier derivation:
  * kernel edge cases and the composed DataFrame shapes. */
class OutlinksSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  test("resolveRef: RFC 3986 merge, dot segments, junk filtering") {
    val base = "https://h.example/a/b/page.html"
    def r(ref: String) = Outlinks.resolveRef(base, ref)
    assert(r("https://x.example/p") == "https://x.example/p")
    assert(r("//cdn.example/lib.js") == "https://cdn.example/lib.js")
    assert(r("/root") == "https://h.example/root")
    assert(r("sib.html") == "https://h.example/a/b/sib.html")
    assert(r("./sib.html") == "https://h.example/a/b/sib.html")
    assert(r("../up.html") == "https://h.example/a/up.html")
    assert(r("../../../over.html") == "https://h.example/over.html")
    assert(r("?q=1") == "https://h.example/a/b/page.html?q=1")
    assert(r("x.html#frag") == "https://h.example/a/b/x.html") // frag drops
    assert(r("with space.html")
      == "https://h.example/a/b/with%20space.html")
    assert(r("#top") == null)          // same-document
    assert(r("") == null)
    assert(r("javascript:void(0)") == null)
    assert(r("mailto:a@b.c") == null)
    assert(r("data:text/plain,x") == null)
    assert(r("ht tp://broken") == null) // unparseable → null, not throw
    assert(Outlinks.resolveRef(null, "/x") == null)
    assert(Outlinks.resolveRef(base, null) == null)
  }

  test("extractOutlinks: both quote styles, entity decode, narrow explode") {
    import spark.implicits._
    val df = Seq(
      (1L, """<a href="/one">1</a> <A HREF='/two?a=1&amp;b=2'>2</A>
             |<a id="x" href="three.html">3</a>
             |<a href="#skip">s</a><p>no links here</p>""".stripMargin,
        "https://h.example/d/p.html"),
      (2L, "<p>plain, linkless</p>", "https://h.example/")
    ).toDF("id", "html", "base")
    val got = Outlinks.extractOutlinks(df, "html", "base")
      .select("id", "outlink").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(
      (1L, "https://h.example/one"),
      (1L, "https://h.example/two?a=1&b=2"),
      (1L, "https://h.example/d/three.html")))
    // the plan stays narrow: no exchange anywhere in an extract-only job
    val plan = Outlinks.extractOutlinks(df, "html", "base")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction must not shuffle:\n$plan")
  }

  test("extractAnchors: text cleanup, empty→null, unterminated skipped, narrow") {
    import spark.implicits._
    val df = Seq(
      (1L, """<a href="/one"> First  <b>link</b>&amp;co </a>""" +
        """<a href='/img'><img src="x.png"></a>""" +
        """<a href="/open">never closed""" +
        """<p>text</p><a href="https://o.example/q">plain</a>""",
        "https://h.example/d/p.html")
    ).toDF("id", "html", "base")
    val got = Outlinks.extractAnchors(df, "html", "base")
      .select("outlink", "anchor_text").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(got == Set(
      // inline-tag strip leaves a space (extractText's rule): a
      // boundary-glued "link&co" would be worse than "link &co"
      ("https://h.example/one", Some("First link &co")),
      ("https://h.example/img", None),
      ("https://o.example/q", Some("plain"))), s"got: $got")
    val plan = Outlinks.extractAnchors(df, "html", "base")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"anchors must not shuffle:\n$plan")
  }

  test("extractAnchors: nofollow rel tokens, both attribute orders") {
    import spark.implicits._
    val df = Seq((1L,
      """<a rel="nofollow" href="/a">a</a>""" +
        """<a href="/b" rel="external nofollow ugc">b</a>""" +
        """<a rel="author" href="/c">c</a>""" +
        """<a href="/d">d</a>""" +
        """<a rel=nofollow href="/e">e</a>""",
      "https://h.example/")).toDF("id", "html", "base")
    val got = Outlinks.extractAnchors(df, "html", "base")
      .select("outlink", "nofollow").collect()
      .map(r => r.getString(0).stripPrefix("https://h.example/")
        -> r.getBoolean(1)).toMap
    assert(got == Map("a" -> true, "b" -> true, "c" -> false,
      "d" -> false, "e" -> true), s"got: $got")
  }

  test("metaRefreshEdges: delay parsing, quote forms, non-refresh silent") {
    import spark.implicits._
    val df = Seq(
      ("https://m.example/1",
        """<meta http-equiv="refresh" content="5;url=/next">"""),
      ("https://m.example/2",
        """<META HTTP-EQUIV=REFRESH CONTENT="0; URL='https://o.example/x'">"""),
      ("https://m.example/3",
        """<meta http-equiv="refresh" content="30">"""), // no url → silent
      ("https://m.example/4",
        """<meta name="viewport" content="url=/not-a-redirect">"""),
      ("https://m.example/5",
        """<meta http-equiv="refresh" content="url=/now">"""), // no delay → 0
      ("https://m.example/6", // content BEFORE http-equiv — both orders
        """<meta content="7;url=/rev" http-equiv="refresh">"""),
      ("https://m.example/7", // unquoted content value
        """<meta http-equiv=refresh content=3;url=/unq>"""),
      ("https://m.example/8", // unquoted + reversed order
        """<meta content=2;url=/ru http-equiv=refresh>""")
    ).toDF("uri", "html")
    val got = Outlinks.metaRefreshEdges(df, "html", "uri")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(got == Set(
      ("https://m.example/1", "https://m.example/next", 5),
      ("https://m.example/2", "https://o.example/x", 0),
      ("https://m.example/5", "https://m.example/now", 0),
      ("https://m.example/6", "https://m.example/rev", 7),
      ("https://m.example/7", "https://m.example/unq", 3),
      ("https://m.example/8", "https://m.example/ru", 2)), s"got: $got")
  }

  test("canonicalLinkEdges: both attribute orders, junk rels silent") {
    import spark.implicits._
    val df = Seq(
      ("https://c.example/a?ref=1",
        """<link rel="canonical" href="/a">"""),
      ("https://c.example/b",
        """<link href="https://c.example/B" rel=canonical>"""),
      ("https://c.example/c",
        """<link rel="stylesheet" href="/s.css">"""),
      ("https://c.example/d", "<p>no links</p>")
    ).toDF("uri", "html")
    val got = Outlinks.canonicalLinkEdges(df, "html", "uri")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("https://c.example/a?ref=1", "https://c.example/a"),
      ("https://c.example/b", "https://c.example/B")), s"got: $got")
  }

  test("hostGraph: host/domain levels, self-edges, distinct") {
    import spark.implicits._
    val links = Seq(
      ("https://a.x.example/p1", "https://b.y.example/q"),
      ("https://a.x.example/p2", "https://b.y.example/r"), // same host pair
      ("https://a.x.example/p3", "https://a.x.example/nav"), // self
      ("https://c.x.example/p", "https://b.y.example/s"),
      ("https://a.x.example/p4", "not a url")
    ).toDF("page", "outlink")
    val hosts = Outlinks.hostGraph(links, "page", "outlink")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(hosts == Set(
      ("a.x.example", "b.y.example"), ("c.x.example", "b.y.example")))
    val keepSelf = Outlinks.hostGraph(links, "page", "outlink",
      dropSelf = false)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(keepSelf.contains(("a.x.example", "a.x.example")))
    val domains = Outlinks.hostGraph(links, "page", "outlink",
      byDomain = true)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // a.x/c.x collapse into x.example; the self-pair drops at domain level
    assert(domains == Set(("x.example", "y.example")), s"got: $domains")
  }

  test("redirectEdges: 3xx+Location only, relative resolution, junk dropped") {
    import spark.implicits._
    val rows = Seq(
      ("https://a.example/old", 301, Map("location" -> "/new")),
      ("https://a.example/x", 302, Map("location" -> "https://b.example/y")),
      ("https://a.example/ok", 200, Map("location" -> "/ignored")),
      ("https://a.example/no", 307, Map("server" -> "s")),
      ("https://a.example/junk", 308, Map("location" -> "mailto:x@y")),
      ("https://a.example/null", 301,
        null.asInstanceOf[Map[String, String]]))
      .toDF("target_uri", "http_status", "http_headers")
    val got = Outlinks.redirectEdges(rows)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(got == Set(
      ("https://a.example/old", "https://a.example/new", 301),
      ("https://a.example/x", "https://b.example/y", 302)), s"got: $got")
  }

  test("resolveRedirectChains: doubling, cycle flagging, min-target dedupe") {
    import spark.implicits._
    val edges = Seq(
      // 5-hop chain: needs 3 doubling rounds, not 5 linear ones
      "c0" -> "c1", "c1" -> "c2", "c2" -> "c3", "c3" -> "c4", "c4" -> "c5",
      // a chain that ENTERS a 2-cycle — the walk never exits
      "x" -> "a", "a" -> "b", "b" -> "a",
      // self-loop
      "s" -> "s",
      // duplicate captures for one source: min target wins
      "m" -> "t2", "m" -> "t1")
      .toDF("redirect_from", "redirect_to")
    val got = Outlinks.resolveRedirectChains(edges)
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(1)), r.getBoolean(2)))).toMap
    assert(got("c0") == ((Some("c5"), false)) &&
      got("c3") == ((Some("c5"), false)), s"$got")
    assert(got("x") == ((None, true)) && got("a") == ((None, true))
      && got("b") == ((None, true)), s"cycle members flag: $got")
    assert(got("s") == ((None, true)), s"self-loop is a cycle: $got")
    assert(got("m") == ((Some("t1"), false)), s"min target dedupe: $got")
    assert(got.size == 10)
  }

  test("sitemapEntries: both shapes, optional fields, malformed degrades") {
    import spark.implicits._
    val urlset =
      """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://s.example/a</loc><lastmod>2026-01-02</lastmod>
        |<changefreq>daily</changefreq><priority>0.8</priority></url>
        |<url><loc>https://s.example/b</loc></url>
        |</urlset>""".stripMargin
    val index =
      """<sitemapindex><sitemap><loc>https://s.example/m1.xml</loc>
        |<lastmod>2026-01-03</lastmod></sitemap></sitemapindex>"""
        .stripMargin
    val df = Seq(urlset, index, "<p>not a sitemap</p>", "torn <url")
      .toDF("xml")
    val got = Outlinks.sitemapEntries(df, "xml").collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getBoolean(4))).toSet
    assert(got == Set(
      ("https://s.example/a", Some("2026-01-02"), Some("daily"),
        Some(0.8), false),
      ("https://s.example/b", None, None, None, false),
      ("https://s.example/m1.xml", Some("2026-01-03"), None, None, true)),
      s"sitemap rows drifted: $got")
  }

  test("urlTemplate: digit/hex/query collapsing, empty path") {
    import spark.implicits._
    val got = Seq(
      "https://h.example/cal/2026/08/16",
      "https://h.example/p?sid=9f86d081a1b2&page=3",
      "https://h.example/s/00000000002a/view",
      "https://h.example",
      "https://h.example/about",
      "https://h.example/a1b2/x" // short mixed run: digits only collapse
    ).toDF("u").select(col("u"),
        graft.operators.Outlinks.urlTemplate(col("u")).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("https://h.example/cal/2026/08/16") == "/cal/#/#/#")
    assert(got("https://h.example/p?sid=9f86d081a1b2&page=3")
      == "/p?sid=*&page=*")
    assert(got("https://h.example/s/00000000002a/view") == "/s/*/view")
    assert(got("https://h.example") == "/")
    assert(got("https://h.example/about") == "/about")
    assert(got("https://h.example/a1b2/x") == "/a#b#/x")
  }

  test("templateStats + containTraps: explosion capped, legit survives") {
    import spark.implicits._
    // trap host: 500 calendar URLs on ONE template + 3 real pages;
    // clean host: 40 pages across 40 distinct templates
    val frontier = (
      (0 until 500).map(i => f"https://t.example/cal/2026/$i%03d") ++
        Seq("https://t.example/about", "https://t.example/contact",
          "https://t.example/pricing") ++
        (0 until 40).map(i => s"https://c.example/sec$i/page")
      ).toDF("frontier_url")
    val stats = graft.operators.Outlinks.templateStats(
        frontier, "frontier_url", trapThreshold = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(stats(("t.example", "/cal/#/#")) == ((500L, true)))
    assert(stats(("t.example", "/about")) == ((1L, false)))
    // c.example's 40 sections share one digit-collapsed template —
    // 40 URLs is real site structure, under the 100 threshold
    assert(stats(("c.example", "/sec#/page")) == ((40L, false)))
    val contained = graft.operators.Outlinks.containTraps(
      frontier, "frontier_url", maxPerTemplate = 100)
    assert(contained.columns.toSeq ==
      Seq("frontier_url", "url_template"))
    val rows = contained.collect().map(_.getString(0))
    assert(rows.length == 100 + 3 + 40, s"got ${rows.length}")
    // the cap keeps the lexicographically first 100 trap URLs; every
    // legitimate page on BOTH hosts survives untouched
    assert(rows.filter(_.contains("/cal/")).sorted.toSeq ==
      (0 until 100).map(i => f"https://t.example/cal/2026/$i%03d"))
    assert(rows.count(_.contains("c.example")) == 40)
    assert(Seq("about", "contact", "pricing").forall(p =>
      rows.contains(s"https://t.example/$p")))
  }

  test("anchorTextIndex: counts, nofollow filter, null texts, tie order") {
    import spark.implicits._
    val anchors = Seq(
      ("https://t/a", "alpha", false), ("https://t/a", "alpha", false),
      ("https://t/a", "beta", false), ("https://t/a", "beta", false),
      ("https://t/a", "gamma", false),
      ("https://t/a", "spam", true), ("https://t/a", "spam", true),
      ("https://t/a", "spam", true), // nofollow: never counts
      ("https://t/a", null, false), // image link: dropped
      ("https://t/b", "only", false))
      .toDF("outlink", "anchor_text", "nofollow")
    val got = Outlinks.anchorTextIndex(anchors, k = 2,
        nofollowCol = Some("nofollow"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    // alpha/beta tie at 2 → text asc breaks it; gamma (1) misses k=2
    assert(got == Set(
      ("https://t/a", "alpha", 2L, 1L),
      ("https://t/a", "beta", 2L, 2L),
      ("https://t/b", "only", 1L, 1L)), s"got: $got")
    // without the nofollow column every edge votes
    val all = Outlinks.anchorTextIndex(anchors, k = 1)
      .filter(col("outlink") === "https://t/a")
      .head()
    assert(all.getString(1) == "spam" && all.getLong(2) == 3L,
      "unfiltered index must count the nofollow edges")
  }

  test("applyCanonical: pass-through, null-target cycles, dup keys, columns kept") {
    import spark.implicits._
    val df = Seq((1, "https://a/x"), (2, "https://a/y"),
      (3, "https://a/z"), (4, "https://a/w")).toDF("id", "url")
    val mapping = Seq(
      ("https://a/x", "https://a/X1"),
      ("https://a/x", "https://a/X0"), // dup key, 1-1 tie → min target
      ("https://a/y", null.asInstanceOf[String]), // cycle → keep
      // conflicting declarations 2-vs-1: the MOST-REFERENCED target
      // wins even though the loser sorts first lexicographically
      ("https://a/w", "https://a/W9"),
      ("https://a/w", "https://a/W9"),
      ("https://a/w", "https://a/W1"))
      .toDF("from", "to")
    val got = Outlinks.applyCanonical(df, "url", mapping, "from", "to")
    assert(got.columns.toSeq == Seq("id", "url"),
      "input column shape must be preserved")
    val rows = got.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows == Map(1 -> "https://a/X0", 2 -> "https://a/y",
      3 -> "https://a/z", 4 -> "https://a/W9"), s"got: $rows")
  }

  test("canonicalMapping: precedence arms + equality with the chained recipe") {
    import spark.implicits._
    // resolved chains: a 2-hop final, a cycle, and a cycle WITH its own
    // declaration; declarations: the landing page composes one step,
    // a redirect source's own declaration loses to the redirect, a
    // self-declaration is an identity no-op, dup keys resolve by
    // reference count (ties take min)
    val chains = Seq(
      ("https://s/r1", "https://s/p1"),            // plain redirect final
      ("https://s/r2", "https://s/land"),          // lands on a declaring page
      ("https://s/cyA", null.asInstanceOf[String]), // cycle, own declaration
      ("https://s/cyB", null.asInstanceOf[String]), // cycle, no declaration
      // duplicated source 2-vs-1: most-referenced final wins over the
      // lexicographically smaller one
      ("https://s/rdup", "https://s/z9"),
      ("https://s/rdup", "https://s/z9"),
      ("https://s/rdup", "https://s/z1"))
      .toDF("redirect_from", "final_target")
    val canon = Seq(
      ("https://s/land", "https://s/K"),   // landing-page declaration
      ("https://s/r1", "https://s/bogus"), // redirect source declares: loses
      ("https://s/cyA", "https://s/ck"),   // cycle source's fallback
      ("https://s/d1", "https://s/D"),     // plain declaration
      ("https://s/d1", "https://s/C"),     // dup key, 1-1 tie → min target
      // conflicting declarations 2-vs-1: count beats lexicographic
      ("https://s/d2", "https://s/B9"),
      ("https://s/d2", "https://s/B9"),
      ("https://s/d2", "https://s/A1"),
      ("https://s/self", "https://s/self")) // identity: dropped
      .toDF("page_uri", "canonical_uri")
    val m = Outlinks.canonicalMapping(chains, canon)
    val got = m.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "https://s/r1" -> "https://s/p1",
      "https://s/r2" -> "https://s/K",
      "https://s/cyA" -> "https://s/ck",
      "https://s/land" -> "https://s/K",
      "https://s/d1" -> "https://s/C",
      "https://s/d2" -> "https://s/B9",
      "https://s/rdup" -> "https://s/z9"), s"got: $got")
    assert(m.count() == 7, "identity and unmapped-cycle rows must drop")
    // the mapping IS the chained recipe: applying it once equals
    // applyCanonical through redirects, then through declarations
    val urls = Seq("https://s/r1", "https://s/r2", "https://s/cyA",
      "https://s/cyB", "https://s/d1", "https://s/d2", "https://s/rdup",
      "https://s/self", "https://s/other")
      .toDF("url")
    val once = Outlinks.applyCanonical(urls, "url", m,
      "alias_url", "canonical_url").as[String].collect().sorted.toSeq
    val chained = Outlinks.applyCanonical(
      Outlinks.applyCanonical(urls, "url",
        chains, "redirect_from", "final_target"),
      "url", canon, "page_uri", "canonical_uri")
      .as[String].collect().sorted.toSeq
    assert(once == chained,
      s"one-mapping application diverged from the chained recipe:\n" +
        s"  once=$once\n  chained=$chained")
  }

  test("collapseEdges: alias votes merge, created self-edges drop") {
    import spark.implicits._
    val mapping = Seq(("https://s/alias", "https://s/P"),
      ("https://s/me2", "https://s/me"))
      .toDF("alias_url", "canonical_url")
    val edges = Seq(
      ("https://s/a", "https://s/alias"), // collapses onto the next row
      ("https://s/a", "https://s/P"),     //   → ONE vote after dedupe
      ("https://s/me", "https://s/me2"),  // alias of self → self-edge: drop
      ("https://s/b", "https://s/alias")) // distinct src: kept
      .toDF("src", "dst")
    val got = Outlinks.collapseEdges(edges, "src", "dst", mapping)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("https://s/a", "https://s/P"),
      ("https://s/b", "https://s/P")), s"got: $got")
    // dropSelf=false keeps the collapsed self-vote; dedupe=false keeps
    // the doubled edge — both arms for consumers with other semantics
    assert(Outlinks.collapseEdges(edges, "src", "dst", mapping,
      dropSelf = false).count() == 3)
    assert(Outlinks.collapseEdges(edges, "src", "dst", mapping,
      dedupe = false).count() == 3)
  }

  test("crawlFrontier: canonical anti-join, scheme filter, domain keys") {
    import spark.implicits._
    val links = Seq(
      "https://A.example/p#frag",     // canonicalizes: lowercase, no frag
      "https://a.example/p",          // duplicate after canonicalization
      "https://b.example:443/q?utm_source=x&k=1", // port+tracking strip
      "ftp://files.example/z",        // non-http(s): dropped
      "https://sub.site.co.uk/r"      // multi-label suffix
    ).toDF("outlink")
    val seen = Seq("https://a.example/p?utm_source=y") // canonical = /p
      .toDF("url")
    val got = Outlinks.crawlFrontier(links, "outlink", seen, "url")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got == Set(
      ("https://b.example/q?k=1", "b.example", "b.example"),
      ("https://sub.site.co.uk/r", "sub.site.co.uk", "site.co.uk")))
  }
}
