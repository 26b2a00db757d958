package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Outlinks, Skew}

/** [[Skew.rankWithinKey]] (range-partitioned full per-group row
  * numbering) and [[Outlinks.fetchPlan]] (robots gate + crawl-delay +
  * per-host fetch sequence): differential equality against the naive
  * group-sized window, skewed-host behavior, and the politeness
  * semantics (delay floor, default-allow, wildcard gate). */
class FetchPlanSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("rankWithinKey equals the naive window, hot key included") {
    // 1 cold key per id + one hot key holding half the rows — forced
    // through MANY more range partitions than any key has rows
    val rows = (0 until 2000).map { i =>
      val k = if (i % 2 == 0) "hot" else s"k${i % 37}"
      (k, f"v$i%05d", i.toLong)
    }
    val df = rows.toDF("k", "v", "payload")
    val got = Skew.rankWithinKey(df, Seq("k"), Seq("v"), "seq",
      numPartitions = 16)
    val naive = df.withColumn("seq",
      row_number().over(Window.partitionBy("k").orderBy("v"))
        .cast("long"))
    assert(got.columns.toSeq ==
      Seq("k", "v", "payload", "seq"))
    assert(got.exceptAll(naive).isEmpty
      && naive.exceptAll(got).isEmpty,
      "two-level range rank must EQUAL the group-sized window")
    // ranks are a 1..n permutation per key
    val perKey = got.groupBy("k")
      .agg(count(lit(1)).as("n"), min("seq").as("lo"),
        max("seq").as("hi"), countDistinct("seq").as("d"))
      .collect()
    perKey.foreach { r =>
      val (n, lo, hi, d) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo == 1 && hi == n && d == n, s"key ${r.getString(0)}")
    }
  }

  test("rankWithinKey: multi-column order and reserved-name guard") {
    val df = Seq(("a", 2, "x"), ("a", 1, "y"), ("a", 1, "x"),
      ("b", 9, "z")).toDF("k", "n", "s")
    val got = Skew.rankWithinKey(df, Seq("k"), Seq("n", "s"), "r")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))
        -> r.getLong(3)).toMap
    assert(got(("a", 1, "x")) == 1 && got(("a", 1, "y")) == 2
      && got(("a", 2, "x")) == 3 && got(("b", 9, "z")) == 1)
    val clash = df.withColumnRenamed("s", "__pid")
    val e = intercept[IllegalArgumentException] {
      Skew.rankWithinKey(clash, Seq("k"), Seq("n"))
    }
    assert(e.getMessage.contains("reserves"))
  }

  test("fetchPlan: gate, delay floor, default-allow, sequence+offset") {
    // hosts a/b have policies; host c none. b's path gate uses a
    // wildcard+anchor; a asks for LESS delay than the floor
    val frontier = Seq(
      "https://a.example/p/1", "https://a.example/p/2",
      "https://a.example/blocked/x",
      "https://b.example/u/10", "https://b.example/u/13", // 13 ends in 3
      "https://c.example/anything").toDF("frontier_url")
    val policies = Seq(
      ("a.example",
        "User-agent: *\nDisallow: /blocked\nCrawl-delay: 0.2"),
      ("b.example", "User-agent: *\nDisallow: /u/*3$\nCrawl-delay: 4"))
      .toDF("host", "robots")
    val got = Outlinks.fetchPlan(frontier, "frontier_url", policies,
      "host", "robots", "graftbot", defaultDelay = 1.0)
      .collect().map(r => r.getAs[String]("frontier_url") ->
        ((r.getAs[String]("url_host"), r.getAs[Double]("crawl_delay"),
          r.getAs[Long]("fetch_seq"), r.getAs[Double]("fetch_offset"))))
      .toMap
    assert(got.size == 4, s"gate must drop 2 of 6: ${got.keys}")
    assert(!got.contains("https://a.example/blocked/x"))
    assert(!got.contains("https://b.example/u/13"))
    // a: 0.2 clamps to the 1.0 floor; lexicographic seq 1,2
    assert(got("https://a.example/p/1") ==
      (("a.example", 1.0, 1L, 0.0)))
    assert(got("https://a.example/p/2") ==
      (("a.example", 1.0, 2L, 1.0)))
    // b: declared 4 s honored
    assert(got("https://b.example/u/10") ==
      (("b.example", 4.0, 1L, 0.0)))
    // c: no policy → default-allow at the floor
    assert(got("https://c.example/anything") ==
      (("c.example", 1.0, 1L, 0.0)))
  }

  test("fetchPlan maxPerHost: keeps the first k in sequence order, per host") {
    val frontier = ((0 until 100).map(i => f"https://hot.example/p/$i%03d")
      ++ Seq("https://small.example/a", "https://small.example/b",
        "https://small.example/c")).toDF("frontier_url")
    val capped = Outlinks.fetchPlan(frontier, "frontier_url",
      Seq.empty[(String, String)].toDF("host", "robots"),
      "host", "robots", "bot", maxPerHost = 10)
      .collect()
    val hot = capped.filter(_.getAs[String]("url_host") == "hot.example")
    assert(hot.length == 10 && capped.length == 13)
    assert(hot.map(_.getAs[String]("frontier_url")).sorted.toSeq
      == (0 until 10).map(i => f"https://hot.example/p/$i%03d"),
      "the cap keeps the lexicographically first k")
    assert(hot.map(_.getAs[Long]("fetch_seq")).sorted.toSeq
      == (1L to 10L), "capped sequence stays dense 1..k")
    assert(capped.filter(_.getAs[String]("url_host") == "small.example")
      .length == 3, "hosts under the cap are untouched")
  }

  test("fetchPlan priorities: (priority desc, url) order, missing scores last") {
    val frontier = Seq(
      "https://p.example/a", "https://p.example/b",
      "https://p.example/c", "https://p.example/d",
      "https://q.example/z").toDF("frontier_url")
    // b outranks a; c ties a (url tiebreak); d unscored → 0.0, last
    val pri = Seq(
      ("https://p.example/a", 2.0), ("https://p.example/b", 7.0),
      ("https://p.example/c", 2.0), ("https://q.example/z", 1.0))
      .toDF("node", "rank")
    val got = Outlinks.fetchPlan(frontier, "frontier_url",
      Seq.empty[(String, String)].toDF("host", "robots"),
      "host", "robots", "bot", priorities = Some(pri))
    assert(got.columns.toSeq == Seq("frontier_url", "url_host",
      "crawl_delay", "priority", "fetch_seq", "fetch_offset"))
    val rows = got.collect().map(r =>
      r.getAs[String]("frontier_url") ->
        ((r.getAs[Double]("priority"), r.getAs[Long]("fetch_seq")))).toMap
    assert(rows("https://p.example/b") == ((7.0, 1L)), s"got $rows")
    assert(rows("https://p.example/a") == ((2.0, 2L)))
    assert(rows("https://p.example/c") == ((2.0, 3L)))
    assert(rows("https://p.example/d") == ((0.0, 4L)))
    assert(rows("https://q.example/z") == ((1.0, 1L)))
  }

  test("fetchPlan priorities + maxPerHost: the TOP-priority URLs survive the cap") {
    // hot host: 200 URLs, scores = reversed url order, so the cap
    // must keep the lexicographically LAST k — the exact opposite of
    // the unranked plan
    val frontier = (0 until 200)
      .map(i => f"https://hot.example/p/$i%03d").toDF("frontier_url")
    val pri = (0 until 200)
      .map(i => (f"https://hot.example/p/$i%03d", i.toDouble))
      .toDF("node", "rank")
    val got = Outlinks.fetchPlan(frontier, "frontier_url",
      Seq.empty[(String, String)].toDF("host", "robots"),
      "host", "robots", "bot", maxPerHost = 10,
      priorities = Some(pri), numPartitions = 16)
      .collect()
    assert(got.length == 10)
    assert(got.map(_.getAs[String]("frontier_url")).sorted.toSeq
      == (190 until 200).map(i => f"https://hot.example/p/$i%03d"),
      "the cap must keep the highest-priority URLs")
    assert(got.map(_.getAs[Long]("fetch_seq")).sorted.toSeq
      == (1L to 10L), "capped sequence stays dense 1..k")
    // differential: the full ranked plan equals the naive descending
    // window, hot host forced across many range partitions
    val full = Outlinks.fetchPlan(frontier, "frontier_url",
      Seq.empty[(String, String)].toDF("host", "robots"),
      "host", "robots", "bot", priorities = Some(pri),
      numPartitions = 16)
      .select("frontier_url", "fetch_seq")
    val naive = frontier
      .join(pri.withColumnRenamed("node", "frontier_url"), "frontier_url")
      .withColumn("fetch_seq", row_number().over(
        Window.partitionBy(lit("hot.example"))
          .orderBy(col("rank").desc, col("frontier_url")))
        .cast("long"))
      .select("frontier_url", "fetch_seq")
    assert(full.exceptAll(naive).isEmpty && naive.exceptAll(full).isEmpty,
      "ranked rankWithinKey must EQUAL the naive descending window")
  }

  test("END TO END: pages → outlinks → URL pageRank → rank-ordered fetch plan") {
    import graft.operators.{LinkGraph, Outlinks}
    // a site with one HUB page every other page links to, plus a long
    // tail of leaf pages: the ranked plan must fetch the hub FIRST
    // even though its URL sorts lexicographically last
    val pages = (0 until 40).map { i =>
      (s"https://s.example/p$i",
        s"""<a href="https://s.example/zhub">hub</a>""" +
          s"""<a href="https://s.example/p${(i + 1) % 40}">next</a>""")
    }.toDF("target_uri", "html")
    val links = Outlinks.extractOutlinks(pages, "html", "target_uri")
    val pr = LinkGraph.pageRank(links.select("target_uri", "outlink"),
      "target_uri", "outlink", iterations = 4)
    val frontier = links.select(col("outlink").as("frontier_url"))
      .distinct()
    val plan = Outlinks.fetchPlan(frontier, "frontier_url",
      Seq.empty[(String, String)].toDF("host", "robots"),
      "host", "robots", "bot", maxPerHost = 5,
      priorities = Some(pr))
      .orderBy("fetch_seq")
      .collect()
    assert(plan.length == 5, "host cap must bound the cycle")
    assert(plan.head.getAs[String]("frontier_url")
      == "https://s.example/zhub",
      s"the hub page must be fetched first: ${plan.toSeq}")
    assert(plan.head.getAs[Long]("fetch_seq") == 1L
      && plan.head.getAs[Double]("fetch_offset") == 0.0)
    // the hub's rank dominates every leaf's
    val hubPr = plan.head.getAs[Double]("priority")
    assert(plan.tail.forall(_.getAs[Double]("priority") < hubPr))
  }

  test("fetchPlan composes on crawlFrontier output (url_host rides)") {
    val links = Seq(
      ("https://d.example/x", 1L), ("https://d.example/y", 1L),
      ("https://e.example/z", 2L)).toDF("outlink", "src")
    val frontier = Outlinks.crawlFrontier(links, "outlink",
      Seq.empty[String].toDF("url"), "url")
    val planned = Outlinks.fetchPlan(frontier, "frontier_url",
      Seq.empty[(String, String)].toDF("host", "robots"),
      "host", "robots", "bot", defaultDelay = 2.0)
    val rows = planned.collect()
    assert(rows.length == 3)
    assert(planned.columns.contains("registered_domain"),
      "frontier columns must pass through")
    val d = rows.filter(_.getAs[String]("url_host") == "d.example")
      .sortBy(_.getAs[Long]("fetch_seq"))
    assert(d.map(_.getAs[Double]("fetch_offset")).toSeq ==
      Seq(0.0, 2.0))
  }

  test("fetchPlan priorities: duplicate URL rows reduce to max, no row fan-out") {
    val frontier = Seq("https://dp.example/a", "https://dp.example/b")
      .toDF("frontier_url")
    // two rows for /a — the join must neither duplicate the frontier
    // row nor pick the weaker score
    val pri = Seq(
      ("https://dp.example/a", 1.0), ("https://dp.example/a", 5.0),
      ("https://dp.example/b", 3.0)).toDF("node", "rank")
    val got = Outlinks.fetchPlan(frontier, "frontier_url",
      Seq.empty[(String, String)].toDF("host", "robots"),
      "host", "robots", "bot", priorities = Some(pri))
    assert(got.count() == 2, "a dup priority key must not fan the plan out")
    val rows = got.collect().map(r =>
      r.getAs[String]("frontier_url") ->
        ((r.getAs[Double]("priority"), r.getAs[Long]("fetch_seq")))).toMap
    assert(rows("https://dp.example/a") == ((5.0, 1L)), s"got $rows")
    assert(rows("https://dp.example/b") == ((3.0, 2L)))
  }

  test("sitemapBoostedPriorities: never-linked sitemap URL outranks a low-rank linked one") {
    val ranks = Seq(
      ("https://sb.example/top", 0.04),   // the best-ranked known page
      ("https://sb.example/low", 0.001),  // a weakly-linked page
      ("https://sb.example/mid", 0.02))
      .toDF("node", "rank")
    val entries = Seq(
      // never linked, priority 1.0 → bootstraps at 1.0 × max(rank)
      ("https://sb.example/fresh", Some(1.0)),
      // never linked, no declared priority → 0.5 × max(rank)
      ("https://sb.example/plain", None),
      // ALSO ranked: the sitemap's self-assessment must be ignored
      ("https://sb.example/low", Some(1.0)))
      .toDF("loc", "priority")
    val pri = Outlinks.sitemapBoostedPriorities(ranks, entries)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pri == Map(
      "https://sb.example/top" -> 0.04,
      "https://sb.example/low" -> 0.001,
      "https://sb.example/mid" -> 0.02,
      "https://sb.example/fresh" -> 0.04,  // 1.0 × 0.04
      "https://sb.example/plain" -> 0.02), s"got: $pri") // 0.5 × 0.04
    // through the plan: the never-linked high-priority sitemap URL
    // schedules AHEAD of every lower-ranked linked URL (url tiebreak
    // puts it after the 0.04 it ties)
    val frontier = pri.keys.toSeq.toDF("frontier_url")
    val seq = Outlinks.fetchPlan(frontier, "frontier_url",
      Seq.empty[(String, String)].toDF("host", "robots"),
      "host", "robots", "bot",
      priorities =
        Some(Outlinks.sitemapBoostedPriorities(ranks, entries)))
      .collect().map(r => r.getAs[String]("frontier_url") ->
        r.getAs[Long]("fetch_seq")).toMap
    assert(seq("https://sb.example/fresh") == 1L
      && seq("https://sb.example/top") == 2L
      && seq("https://sb.example/mid") == 3L
      && seq("https://sb.example/plain") == 4L
      && seq("https://sb.example/low") == 5L, s"got: $seq")
  }

  test("focusedPriorities: topic-matched URLs schedule first, depth decays, unreached drop") {
    // anchor index: /ml is all about the topic at depth 1; /mix is
    // half-vouched at depth 0; /cooking never matches; /far matches
    // but was never reached by the seed BFS
    val anchors = Seq(
      ("https://fc.example/ml", "Machine-Learning notes!", 3L),
      ("https://fc.example/mix", "machine learning", 1L),
      ("https://fc.example/mix", "holiday photos", 1L),
      ("https://fc.example/cooking", "pasta recipes", 9L),
      ("https://fc.example/far", "learning resources", 2L))
      .toDF("outlink", "anchor_text", "n_refs")
    val topics = Seq("Learning", "machine").toDF("term")
    val dists = Seq(
      ("https://fc.example/ml", 1),
      ("https://fc.example/mix", 0),
      ("https://fc.example/cooking", 0)).toDF("node", "depth")
    val pri = Outlinks.focusedPriorities(anchors, topics, dists)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // tokenization: "Machine-Learning notes!" → {machine, learning,
    // notes} — case-folded, punctuation-split — matches both terms
    assert(pri == Map(
      "https://fc.example/ml" -> 0.5,       // 1.0 score × 0.5^1
      "https://fc.example/mix" -> 0.5,      // (1/2 weight) × 0.5^0
      "https://fc.example/cooking" -> 0.0), // no token matches
      s"unreached /far must drop: $pri")
    // through the plan: topic-vouched URLs fetch before the
    // zero-score one; the unreached URL defaults to 0.0 and ties it
    // (url tiebreak)
    val frontier = Seq("https://fc.example/ml", "https://fc.example/mix",
      "https://fc.example/cooking", "https://fc.example/far")
      .toDF("frontier_url")
    val seq = Outlinks.fetchPlan(frontier, "frontier_url",
      Seq.empty[(String, String)].toDF("host", "robots"),
      "host", "robots", "bot",
      priorities = Some(Outlinks.focusedPriorities(anchors, topics, dists)),
      priorityCol = "priority")
      .collect().map(r => r.getAs[String]("frontier_url") ->
        r.getAs[Long]("fetch_seq")).toMap
    assert(seq("https://fc.example/mix") == 1L    // 0.5, "mix" < "ml"
      && seq("https://fc.example/ml") == 2L
      && seq("https://fc.example/cooking") == 3L  // 0.0, url < /far
      && seq("https://fc.example/far") == 4L, s"got: $seq")
  }

  test("sitemapBoostedPriorities: empty rank frame scales by 1.0; dup locs take max") {
    val ranks = Seq.empty[(String, Double)].toDF("node", "rank")
    val entries = Seq(
      ("https://cold.example/a", Some(0.8)),
      ("https://cold.example/a", Some(0.3)),  // dup loc → max
      ("https://cold.example/b", None))
      .toDF("loc", "priority")
    val pri = Outlinks.sitemapBoostedPriorities(ranks, entries)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pri == Map("https://cold.example/a" -> 0.8,
      "https://cold.example/b" -> 0.5), s"got: $pri")
  }
}
