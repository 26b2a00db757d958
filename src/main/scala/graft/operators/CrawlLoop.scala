package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MULTI-CYCLE batch crawl driver — every certified crawl operator
  * composed into one closed loop, the batch twin of the streaming
  * recipe ([[graft.streaming.Streams.crawlFetchPlanSink]] +
  * `crawlDedupArchiveSink`) for crawls that run as discrete cycles
  * (the Common Crawl shape) rather than a continuous tail. Reference
  * behavior: the fetch/parse/schedule loop of
  * /root/reference/01_dbignite_sample.py's ingest stage generalized to
  * a full crawl scheduler; every stage here is the already-certified
  * operator, only the composition is new (pinned by NorthStarSpec's
  * multi-cycle synthetic web).
  *
  * Per cycle:
  *  1. '''Canonical collapse''' — [[Outlinks.canonicalMapping]] from
  *     ALL redirect chains + rel=canonical declarations observed so
  *     far rewrites the pending frontier, so URL aliases stop
  *     double-fetching and rank mass stops splitting (q_t78's
  *     semantics, applied per cycle with the freshest mapping).
  *  2. '''Revisit feed''' — with a `clock`, URLs whose
  *     `next_fetch_epoch` has passed re-enter the frontier as
  *     deliberate refetches (they bypass the seen filter). The
  *     schedule is [[Revisit.fromArchive]] backoff by default
  *     (sitemap `changefreq`/`lastmod` hints apply) or
  *     [[Revisit.rateFromArchive]]'s Poisson-optimal intervals under
  *     `revisitMode = "rate"`; both read the committed archive
  *     batches 0..c-1.
  *  3. '''Robots resolution''' (`fetchRobots`) — frontier hosts with
  *     no fresh policy attempt get `/robots.txt` fetched through the
  *     same callback BEFORE the plan; 200s fold into the policy table
  *     and gate this very cycle, non-200 attempts record as
  *     default-allow until the freshness horizon. With
  *     `fetchSitemaps`, policy-declared sitemaps and index children
  *     fetch next (once each), their urlsets feeding the NEXT cycle's
  *     frontier plus the priority/revisit knowledge below.
  *  4. '''Trap containment''' — [[Outlinks.containTraps]] caps each
  *     (host, URL-template) pattern at `maxPerTemplate`.
  *  5. '''Ranked, polite, budgeted plan''' — [[LinkGraph.pageRank]]
  *     over the canonical-collapsed accumulated link graph (with
  *     `topics`, relevance × authority instead — the FOCUSED-crawl
  *     mode, see the param doc), sitemap priorities bootstrapping
  *     never-linked URLs
  *     ([[Outlinks.sitemapBoostedPriorities]]), then
  *     [[Outlinks.fetchPlan]] (robots gate + freshness, crawl-delay
  *     floor, per-host sequence, `maxPerHost`/`hostBudgets` caps —
  *     all caps apply PER CYCLE: each cycle's plan re-derives them,
  *     so a whole-crawl budget divides by the cycle count).
  *  6. '''Fetch''' — the caller's `fetch(plan, cycle)` callback (a
  *     real fleet in production, a synthetic web in tests) returns
  *     captured pages.
  *  7. '''Dedup archive''' — status-200 pages land via
  *     [[graft.sources.WarcIO.warcDedupSave]] under
  *     `archiveDir/batch=<cycle>` with the prior cycles' `_cdx` as
  *     the cross-batch index: unchanged content archives as `revisit`
  *     records, which IS the change history step 2 reads back.
  *  8. '''Signal extraction''' — outlinks, redirect edges (header and
  *     meta-refresh), and rel=canonical declarations accumulate;
  *     redirect targets join the link feed (a moved page must not be
  *     lost).
  *  9. '''Carry-over''' — planned URLs become seen; frontier rows the
  *     plan did NOT emit (budget-capped, trap-capped, or
  *     robots-disallowed) remain pending and re-derive next cycle —
  *     deliberately including disallowed URLs, because under robots
  *     FRESHNESS a refreshed policy may admit them later (they
  *     re-gate each cycle; nothing is silently lost).
  *
  * Scale shape: every stage is the certified operator's plan (no new
  * shuffle keys); cross-cycle state (seen, pending, accumulated
  * edges/signals) is `localCheckpoint`ed per cycle for plan
  * truncation — at production scale these become tables, and the
  * driver-side actions are the per-cycle counts in [[CycleResult]],
  * bounded by the cycle count.
  */
object CrawlLoop {

  /** One cycle's outcome. `plan` is pinned (localCheckpoint) — safe
    * to inspect after the loop returns. `robotsFetched` /
    * `sitemapsFetched` count the cycle's infrastructure fetches
    * (0 unless `fetchRobots` / `fetchSitemaps` are on). */
  final case class CycleResult(
      cycle: Int,
      frontierSize: Long,
      plannedCount: Long,
      dueRevisits: Long,
      archivedRecords: Long,
      plan: DataFrame,
      robotsFetched: Long = 0L,
      sitemapsFetched: Long = 0L)

  /** @param seeds    seed-URL frame (column `seedCol`)
    * @param fetch    `(plan, cycle) => pages`: pages MUST carry
    *                 `target_uri`, `warc_date` (ISO string),
    *                 `record_id`, `http_content_type`, `payload`
    *                 (binary), `http_status` (int), and `http_headers`
    *                 (map with LOWERCASE keys, as the graft-warc
    *                 reader emits — nullable). A fetcher may return
    *                 fewer rows than planned (timeouts); unreturned
    *                 URLs are still seen (they were attempted).
    * @param archiveDir dedup-archive root; cycle N lands under
    *                 `batch=N` and is read back with a `batch=*` glob
    * @param clock    cycle → epoch seconds; enables the revisit feed
    *                 (None = no refetching, every URL fetched once)
    *                 and, with `fetchedAtCol` and no explicit `asOf`,
    *                 drives robots-policy freshness — each cycle
    *                 judges policy age at its own clock
    * @param sitemaps optional [[Outlinks.sitemapEntries]]-shaped frame:
    *                 urlset locs bootstrap the cycle-0 frontier and
    *                 the priority scale; `changefreq`/`lastmod` feed
    *                 the revisit schedule as hints
    * @return one [[CycleResult]] per cycle, in order */
  def crawlCycles(
      spark: SparkSession,
      seeds: DataFrame, seedCol: String,
      fetch: (DataFrame, Int) => DataFrame,
      archiveDir: String,
      policies: DataFrame, hostCol: String, robotsCol: String,
      agent: String,
      cycles: Int,
      defaultDelay: Double = 1.0,
      maxPerTemplate: Int = 1000,
      /** Cap on planned URLs per host, applied PER CYCLE (0 = off):
        * a cap of k over n cycles admits up to k×n fetches of one
        * host — size a whole-crawl budget by dividing by the cycle
        * count. URLs squeezed out stay pending and re-derive next
        * cycle. ([[Outlinks.fetchPlan]]'s `maxPerHost`, re-applied on
        * each cycle's plan; `maxPerTemplate` is per-cycle the same
        * way.) */
      maxPerHost: Int = 0,
      /** Per-host overrides of `maxPerHost` (columns `budgetHostCol`,
        * `budgetCol`) — the same PER-CYCLE semantics: each cycle's
        * plan re-applies the budget afresh. */
      hostBudgets: Option[DataFrame] = None,
      budgetHostCol: String = "url_host", budgetCol: String = "budget",
      fetchedAtCol: Option[String] = None,
      maxAgeSeconds: Long = 86400L,
      asOf: Option[org.apache.spark.sql.Column] = None,
      sitemaps: Option[DataFrame] = None,
      clock: Option[Int => Double] = None,
      rankIterations: Int = 5,
      /** Make the crawl FOCUSED (Chakrabarti et al., WWW 1999): a
        * topic-term frame (column `topicTermCol`) switches the plan's
        * priority base from raw PageRank to RELEVANCE × AUTHORITY —
        * [[Outlinks.focusedPriorities]] over the accumulated anchor
        * texts ([[Outlinks.anchorTextIndex]], aliases collapsed
        * through the cycle's canonical mapping) and the seed BFS
        * depth ([[LinkGraph.seedDistance]] over the collapsed graph,
        * rooted at the caller's `seeds`), multiplied into the cycle's
        * PageRank by [[Outlinks.focusedRankPriorities]]. Topic-matched
        * URLs then schedule ahead of EVERY off-topic one regardless of
        * raw rank (off-topic and seed-unreached URLs score 0.0);
        * authority orders the topical tier; the sitemap bootstrap
        * ([[Outlinks.sitemapBoostedPriorities]]) rides on the combined
        * frame. Coverage is unchanged — focus reorders the queue, it
        * never drops a URL. Anchor texts (nofollow-filtered, one vote
        * per (page, target, text)) accumulate only while `topics` is
        * supplied — a focused crawl declares itself up front; on
        * resume, re-supply the same frame like every static input. */
      /** Revisit scheduling policy (needs `clock`): `"backoff"` —
        * [[Revisit.fromArchive]]'s exponential backoff on unchanged
        * streaks, sitemap `changefreq`/`lastmod` hints apply — or
        * `"rate"` — [[Revisit.rateFromArchive]]'s Poisson-optimal
        * interval from each URL's ESTIMATED change rate
        * (`revisitStaleRisk`, `revisitMinIntervalSeconds`), so a
        * fast-changing page refetches more often than backoff would
        * and hints don't apply (the estimate IS the cadence signal).
        * Both read the same archive record types: `response` =
        * changed, `revisit` = unchanged. */
      revisitMode: String = "backoff",
      /** Rate mode only: per-fetch staleness risk held — smaller =
        * fetch more eagerly (interval = -ln(1-risk)/λ̂). */
      revisitStaleRisk: Double = 0.5,
      /** Rate mode only: floor on the scheduled interval — a
        * hyperactive page must not starve the crawler. */
      revisitMinIntervalSeconds: Double = 3600.0,
      topics: Option[DataFrame] = None,
      topicTermCol: String = "term",
      /** Per-hop decay of the focus score with seed distance
        * ([[Outlinks.focusedPriorities]]' `decay`). */
      focusDecay: Double = 0.5,
      /** Seed-BFS horizon for the depth signal — URLs deeper than
        * this (or unreached) carry no focus row and fetch last. */
      focusMaxDepth: Int = 16,
      /** Close the robots FETCH loop inside the crawl: before each
        * cycle's plan, frontier hosts with no FRESH policy attempt
        * ([[Robots.robotsFetchList]] semantics at the cycle clock) get
        * their `/robots.txt` fetched through the SAME `fetch`
        * callback (the URLs are distinguishable by path); 200
        * responses fold into the policy table (latest fetch per host
        * wins) and gate THIS cycle's plan, non-200 attempts record as
        * default-allow until the freshness horizon re-surfaces the
        * host. The `policies` parameter then only SEEDS the table —
        * seed rows should carry `fetchedAtCol` stamps (an unstamped
        * row is stale-by-definition and simply refetches through the
        * loop). Requires `clock` (freshness needs a deterministic
        * now). */
      fetchRobots: Boolean = false,
      /** Close the sitemap DISCOVERY loop too (the middle tier:
        * robots.txt → sitemaps → sitemap indexes → urlsets →
        * frontier): each cycle, sitemap URLs declared by the policy
        * table's `Sitemap:` lines or by fetched `<sitemapindex>`
        * children — minus everything already attempted
        * ([[Outlinks.sitemapFetchList]]) — fetch through the same
        * callback; parsed `<urlset>` entries then feed the NEXT
        * cycle's frontier (one-cycle discovery latency, the discrete-
        * cycle analogue of a continuous sitemap tail), the priority
        * bootstrap, and the revisit `changefreq`/`lastmod` hints,
        * exactly like a caller-supplied `sitemaps` frame (the two
        * sources union). Sitemaps fetch once per crawl. */
      fetchSitemaps: Boolean = false,
      /** Warm-start each cycle's PageRank from the PREVIOUS cycle's
        * ranks ([[LinkGraph.pageRank]]'s `initial`): the graph grows
        * incrementally, so last cycle's vector is already near the
        * answer and `rankIterations` buys convergence instead of
        * re-deriving it from uniform — the knob that matters when the
        * accumulated graph is billions of edges. New nodes enter at
        * the uniform prior. Off by default: mid-convergence rank
        * VALUES differ slightly from a cold run's (coverage does not —
        * spec-pinned), so deterministic-replay consumers should opt
        * in deliberately. */
      warmStartRanks: Boolean = false,
      /** Persist the loop's cross-cycle state as parquet under
        * `<stateDir>/cycle=<N>` at the end of every cycle, a commit
        * marker written LAST — a 30-cycle crawl that dies at cycle 20
        * then resumes from durable state instead of refetching the
        * web. Cycle N writes only its DELTAS for the cumulative
        * frames (that cycle's planned URLs, new edges/signals,
        * fetched policies) plus frontier-sized snapshots of
        * `pending`/`ranks`, so state I/O per cycle is O(that cycle's
        * discoveries) and total state size is O(crawl), not
        * O(cycles × crawl); resume re-reduces the committed delta
        * prefix (union+distinct / union+max-per-key — associative, so
        * the reconstruction equals the in-memory accumulation).
        * Static inputs (`seeds`, `policies`, `sitemaps`, every knob)
        * are NOT persisted: re-supply the same configuration on
        * resume. */
      stateDir: Option[String] = None,
      /** Resume from the state `stateDir/cycle=<startCycle-1>`
        * committed by a previous run (same `archiveDir` — the dedup
        * archive's earlier batches are part of the state). 0 = fresh
        * crawl. Every operator in the loop is deterministic, so a
        * resumed run's cycles equal the uninterrupted run's
        * (spec-pinned). */
      startCycle: Int = 0): Seq[CycleResult] = {
    require(cycles >= 1, s"cycles must be >= 1: $cycles")
    require(!fetchRobots || clock.isDefined,
      "fetchRobots needs clock: robots freshness requires the cycle time")
    require(startCycle >= 0 && startCycle < cycles,
      s"startCycle must be in [0, cycles): $startCycle")
    require(startCycle == 0 || stateDir.isDefined,
      "resuming (startCycle > 0) requires stateDir")
    require(revisitMode == "backoff" || revisitMode == "rate",
      s"revisitMode must be backoff|rate: $revisitMode")
    def emptyPairs(c1: String, c2: String): DataFrame =
      spark.range(0).select(lit("").as(c1), lit("").as(c2))
    val smPages = sitemaps.map(
      _.filter(!coalesce(col("is_index"), lit(false)))
        .filter(col("loc").isNotNull))

    val seedFeed = smPages.fold(
      seeds.select(col(seedCol).cast("string").as("__l")))(sm =>
      seeds.select(col(seedCol).cast("string").as("__l"))
        .unionByName(sm.select(col("loc").cast("string").as("__l"))))
    var pending = Outlinks.canonicalLinks(seedFeed, "__l")
      .distinct().localCheckpoint()
    // tiny-loop gate ([[TinyLoop]]): a cycle's frames are bounded by
    // the frontier it plans and the link fan-out of the pages it
    // fetches — all row counts the loop measures anyway (frontierSize,
    // plannedCount) or can count for one cheap cached scan WHILE the
    // crawl is still tiny. The gate starts from the seed count, only
    // ever turns OFF (monotone — a crawl that has grown large never
    // pays accumulator counts again), and payload-bearing frames
    // (fetched pages) are never pinned compacted: rows bound poorly
    // when each row carries a document body.
    var loopTiny = TinyLoop.enabled(spark) &&
      TinyLoop.isTiny(spark, pending.count())
    def gate(counts: Long*): Unit =
      if (loopTiny && !TinyLoop.isTiny(spark, counts: _*)) loopTiny = false
    def pin(df: DataFrame): DataFrame = TinyLoop.pin(df, loopTiny)
    var seen = spark.range(0).select(lit("").as("url")).localCheckpoint()
    var redirAcc =
      emptyPairs("redirect_from", "redirect_to").localCheckpoint()
    var canonAcc =
      emptyPairs("page_uri", "canonical_uri").localCheckpoint()
    var edgesAcc = emptyPairs("src", "dst").localCheckpoint()
    // focused-crawl evidence: one row per (linking page, canonical
    // target, anchor text) — accumulated only when `topics` is given
    var anchorsAcc = spark.range(0)
      .select(lit("").as("page_uri"), lit("").as("outlink"),
        lit("").as("anchor_text"))
      .localCheckpoint()
    // normalized policy table: under fetchRobots it ACCUMULATES the
    // loop's own fetched policies (latest per host); otherwise it is
    // the caller's static frame passed through unchanged
    var policiesAcc =
      if (!fetchRobots) policies
      else policies.select(
          lower(trim(col(hostCol))).as("__ph"),
          col(robotsCol).cast("string").as("__pr"),
          fetchedAtCol.map(cn => col(cn).cast("timestamp"))
            .getOrElse(lit(null).cast("timestamp")).as("__pf"))
        .localCheckpoint()
    // fetch ATTEMPTS per host, status-independent: a host whose
    // robots.txt 404ed is default-allow and must not re-surface on the
    // worklist until the freshness horizon passes
    var robotsAttempts =
      if (!fetchRobots)
        spark.range(0).select(lit("").as("__ah"),
          lit(null).cast("timestamp").as("__af"))
      else policiesAcc.filter(col("__pf").isNotNull)
        .select(col("__ph").as("__ah"), col("__pf").as("__af"))
        .localCheckpoint()
    def normEntries(df: DataFrame): DataFrame = df.select(
      col("loc").cast("string").as("loc"),
      col("lastmod").cast("string").as("lastmod"),
      col("changefreq").cast("string").as("changefreq"),
      col("priority").cast("double").as("priority"),
      col("is_index").cast("boolean").as("is_index"))
    // fetched-and-parsed sitemap entries + attempted sitemap URLs
    var smEntriesAcc = spark.range(0).select(lit("").as("loc"),
        lit("").as("lastmod"), lit("").as("changefreq"),
        lit(0.0).as("priority"), lit(false).as("is_index"))
      .localCheckpoint()
    var smAttempts = spark.range(0)
      .select(lit("").as("sitemap_url")).localCheckpoint()
    var ranksPrev: Option[DataFrame] = None

    // ---- durable state (stateDir): per-cycle DELTAS for the
    // cumulative frames (cycle N writes only cycle N's new rows, so
    // total state I/O is O(crawl size), not O(cycles × crawl size)),
    // full snapshots for the working-set frames (pending, ranks —
    // frontier-sized, not crawl-sized), each cycle committed with a
    // marker written last so a torn cycle dir never resumes. Resume
    // reads the committed delta prefix back and re-reduces: union +
    // distinct for the append-only frames, union + max-per-key for
    // the policy/attempt tables (both reductions associative, so the
    // reconstruction equals the in-memory accumulation). ----
    val stateSchemas: Seq[(String, String)] = Seq(
      "seen" -> "url string",
      "pending" -> "frontier_url string",
      "redir" -> "redirect_from string, redirect_to string",
      "canon" -> "page_uri string, canonical_uri string",
      "edges" -> "src string, dst string",
      "anchors" -> "page_uri string, outlink string, anchor_text string",
      "policies" -> "__ph string, __pr string, __pf timestamp",
      "robots_attempts" -> "__ah string, __af timestamp",
      "sm_entries" -> ("loc string, lastmod string, changefreq string, "
        + "priority double, is_index boolean"),
      "sm_attempts" -> "sitemap_url string",
      "ranks" -> "node string, rank double")
    val stateDdl = stateSchemas.toMap
    def emptyState(name: String): DataFrame = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(stateDdl(name)))
    def marker(c: Int) = new org.apache.hadoop.fs.Path(
      s"${stateDir.get}/cycle=$c/_graft_state_committed")
    def stateFs() = new org.apache.hadoop.fs.Path(stateDir.get)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def saveState(c: Int, frames: Map[String, DataFrame]): Unit = {
      frames.foreach { case (name, df) =>
        df.write.mode("overwrite")
          .parquet(s"${stateDir.get}/cycle=$c/$name")
      }
      val fs = stateFs()
      fs.delete(marker(c), false)
      fs.create(marker(c), true).close()
    }
    if (startCycle > 0) {
      val fs = stateFs()
      (0 until startCycle).foreach { k =>
        require(fs.exists(marker(k)),
          s"no committed crawl state at ${stateDir.get}/cycle=$k " +
            "(crashed mid-save, or never ran) — resume from an " +
            "earlier cycle or start fresh")
      }
      // cumulative frames reconstruct from the committed delta
      // prefix; working-set frames read the LAST cycle's snapshot
      def deltas(name: String): DataFrame =
        (0 until startCycle).map(k => spark.read.schema(stateDdl(name))
            .parquet(s"${stateDir.get}/cycle=$k/$name"))
          .reduce(_ unionByName _)
      def snapshot(name: String): DataFrame =
        spark.read.schema(stateDdl(name))
          .parquet(s"${stateDir.get}/cycle=${startCycle - 1}/$name")
      seen = deltas("seen").distinct().localCheckpoint()
      pending = snapshot("pending").localCheckpoint()
      redirAcc = deltas("redir").distinct().localCheckpoint()
      canonAcc = deltas("canon").distinct().localCheckpoint()
      edgesAcc = deltas("edges").distinct().localCheckpoint()
      anchorsAcc = deltas("anchors").distinct().localCheckpoint()
      if (fetchRobots) {
        policiesAcc = policiesAcc.unionByName(deltas("policies"))
          .groupBy("__ph")
          .agg(max(struct(col("__pf"), col("__pr"))).as("__s"))
          .select(col("__ph"),
            col("__s").getField("__pr").as("__pr"),
            col("__s").getField("__pf").as("__pf"))
          .localCheckpoint()
        robotsAttempts = robotsAttempts
          .unionByName(deltas("robots_attempts"))
          .groupBy("__ah").agg(max(col("__af")).as("__af"))
          .localCheckpoint()
      }
      smEntriesAcc = deltas("sm_entries").distinct().localCheckpoint()
      smAttempts = deltas("sm_attempts").distinct().localCheckpoint()
      if (warmStartRanks) {
        val r = snapshot("ranks")
        ranksPrev = if (r.isEmpty) None else Some(r.localCheckpoint())
      }
      // resumed state has unknown accumulated size; measuring it would
      // cost scans of every reconstructed frame — stay adaptive
      loopTiny = false
    }
    val results = Seq.newBuilder[CycleResult]

    for (c <- startCycle until cycles) {
      // durable-state deltas: only the rows THIS cycle adds (the
      // append-only accumulators re-derive from the delta prefix)
      var robotsDelta = emptyState("robots_attempts")
      var policiesDelta = emptyState("policies")
      var smEntriesDelta = emptyState("sm_entries")
      var smAttemptsDelta = emptyState("sm_attempts")
      val mapping = pin(Outlinks.canonicalMapping(
        Outlinks.resolveRedirectChains(redirAcc), canonAcc))
      def collapse(df: DataFrame): DataFrame =
        Outlinks.applyCanonical(df, "frontier_url", mapping,
          "alias_url", "canonical_url")
      // the cycle's effective sitemap knowledge: the caller's frame
      // unioned with everything the loop itself has fetched so far
      val entriesNow: Option[DataFrame] =
        if (!fetchSitemaps) sitemaps
        else Some(sitemaps.fold(smEntriesAcc)(s0 =>
          normEntries(s0).unionByName(smEntriesAcc)))
      val smPagesNow = entriesNow.map(
        _.filter(!coalesce(col("is_index"), lit(false)))
          .filter(col("loc").isNotNull))
      // deliberate refetches bypass the seen filter; everything else
      // collapses first (an alias may land on an already-seen URL)
      val due = clock match {
        case Some(ep) if c > 0 =>
          // explicit batch list 0..c-1, NOT a batch=* glob: on a resume
          // the glob would also match a TORN batch >= startCycle left by
          // a crash after the archive write but before the state commit
          // marker — cycle c rewrites batch=c (the writer deletes stale
          // parts and overwrites _cdx), and the committed prefix is the
          // only archive state a deterministic resume may read
          val arch = (0 until c).map(i =>
              spark.read.format("graft-warc")
                .load(s"$archiveDir/batch=$i"))
            .reduce(_ unionByName _)
          val sched =
            if (revisitMode == "rate")
              Revisit.rateFromArchive(arch,
                staleRisk = revisitStaleRisk,
                minIntervalSeconds = revisitMinIntervalSeconds)
            else Revisit.fromArchive(arch,
              hints = entriesNow,
              hintLastmodCol = entriesNow.map(_ => "lastmod"))
          collapse(sched
            .filter(col("next_fetch_epoch") <= lit(ep(c)))
            .select(col("url").as("frontier_url"))).distinct()
        case _ => pending.limit(0)
      }
      val frontier = pin(collapse(pending).distinct()
        .join(seen.select(col("url").as("frontier_url")),
          Seq("frontier_url"), "left_anti")
        .unionByName(due)
        .distinct())
      val frontierSize = frontier.count()
      gate(frontierSize)
      val dueCount = if (c > 0 && clock.isDefined) due.count() else 0L

      // robots freshness advances with the crawl's own clock: absent
      // an explicit asOf, cycle c judges policy age at clock(c) — so a
      // policy that was fresh in cycle 0 goes stale mid-crawl and its
      // paths default-allow exactly when RFC 9309 says they must
      val asOfC = asOf.orElse(
        clock.map(ep => lit(ep(c)).cast("timestamp")))

      // the robots FETCH loop: resolve unknown/stale hosts BEFORE this
      // cycle's plan, so a compliant crawler never fetches a host's
      // pages ahead of its policy
      val robotsFetched = if (!fetchRobots) 0L else {
        val worklist = Robots.robotsFetchList(frontier, "frontier_url",
          robotsAttempts, "__ah", fetchedAtCol = Some("__af"),
          maxAgeSeconds = maxAgeSeconds, asOf = asOfC)
        val rplan = pin(Outlinks.fetchPlan(
            worklist.select(col("robots_url").as("frontier_url")),
            "frontier_url", emptyPairs("__h", "__r"), "__h", "__r",
            agent, defaultDelay))
        val n = rplan.count()
        if (n > 0) {
          // PLANNED means ATTEMPTED, stamped with the cycle clock —
          // matching the page semantics (planned URLs become seen even
          // when the fetcher returns no row): a host whose robots.txt
          // fetch times out must not re-enter this worklist every cycle
          // forever; it default-allows until the freshness horizon
          // passes and only then resurfaces
          robotsDelta = rplan.select(
            TextAnalysis.urlHost(col("frontier_url")).as("__ah"),
            lit(clock.get(c)).cast("timestamp").as("__af"))
          robotsAttempts = pin(robotsAttempts.unionByName(robotsDelta)
            .groupBy("__ah").agg(max(col("__af")).as("__af")))
          val rpages = fetch(rplan, c).localCheckpoint()
          policiesDelta = rpages.filter(col("http_status") === 200)
            .select(
              TextAnalysis.urlHost(col("target_uri")).as("__ph"),
              col("payload").cast("string").as("__pr"),
              col("warc_date").cast("timestamp").as("__pf"))
          // plain pin, NEVER compacted: __pr carries full robots.txt
          // BODIES, so row counts bound this frame's bytes poorly —
          // the same payload exemption `pages` gets
          policiesAcc = policiesAcc.unionByName(policiesDelta)
            // latest fetch per host wins (a stamped row beats an
            // unstamped seed — nulls sort first in struct ordering);
            // the dedup also keeps the policy join fan-out-free
            .groupBy("__ph")
            .agg(max(struct(col("__pf"), col("__pr"))).as("__s"))
            .select(col("__ph"),
              col("__s").getField("__pr").as("__pr"),
              col("__s").getField("__pf").as("__pf"))
            .localCheckpoint()
        }
        n
      }
      val (polFrame, polHost, polRobots, polFat) =
        if (fetchRobots) (policiesAcc, "__ph", "__pr", Some("__pf"))
        else (policies, hostCol, robotsCol, fetchedAtCol)

      // the sitemap DISCOVERY loop: policy-declared sitemaps and
      // index children not yet attempted fetch now; their urlset
      // entries feed the NEXT cycle's frontier and this loop's
      // priority/revisit knowledge
      var smNewLocs = pending.limit(0)
      val sitemapsFetched = if (!fetchSitemaps) 0L else {
        val declared = polFrame.select(
          explode(Robots.sitemapUrls(col(polRobots))).as("sitemap_url"))
        val worklist = Outlinks.sitemapFetchList(
          declared, "sitemap_url", smEntriesAcc,
          smAttempts, "sitemap_url")
        val splan = pin(Outlinks.fetchPlan(
            worklist.select(col("sitemap_url").as("frontier_url")),
            "frontier_url", emptyPairs("__h", "__r"), "__h", "__r",
            agent, defaultDelay))
        val n = splan.count()
        if (n > 0) {
          // every PLANNED sitemap records as attempted, status- and
          // return-independent: a 404 sitemap — or one whose fetch
          // times out and returns no row at all — must not refetch
          // forever (sitemaps fetch once per crawl)
          smAttemptsDelta =
            splan.select(col("frontier_url").as("sitemap_url"))
          smAttempts = pin(smAttempts.unionByName(smAttemptsDelta)
            .distinct())
          val spages = fetch(splan, c).localCheckpoint()
          val parsed = Outlinks.sitemapEntries(
            spages.filter(col("http_status") === 200)
              .select(col("payload").cast("string").as("__xml")),
            "__xml")
          smEntriesDelta = normEntries(parsed)
          smEntriesAcc = pin(smEntriesAcc
            .unionByName(smEntriesDelta)
            .distinct())
          smNewLocs = Outlinks.canonicalLinks(
            parsed.filter(!col("is_index"))
              .select(col("loc").as("__l")), "__l").distinct()
        }
        n
      }

      val contained = Outlinks.containTraps(
        frontier, "frontier_url", maxPerTemplate).drop("url_template")
      val collapsedE =
        Outlinks.collapseEdges(edgesAcc, "src", "dst", mapping)
      val ranks = LinkGraph.pageRank(
        collapsedE, "src", "dst", iterations = rankIterations,
        initial = if (warmStartRanks) ranksPrev else None)
      if (warmStartRanks) ranksPrev = Some(pin(ranks))
      // with topics the priority base becomes relevance × authority
      // (see the `topics` param doc); every frame in the product keys
      // on CANONICAL urls — the anchor index rewrites through the
      // mapping, the BFS runs on the collapsed graph from collapsed
      // seed roots, and the frontier was collapsed above
      val baseRanks = topics.fold(ranks) { t =>
        val idx = Outlinks.anchorTextIndex(
          Outlinks.applyCanonical(anchorsAcc, "outlink", mapping,
            "alias_url", "canonical_url"))
        val seedRoots = collapse(Outlinks.canonicalLinks(
          seeds.select(col(seedCol).cast("string").as("__l")), "__l"))
          .distinct()
        val dist = LinkGraph.seedDistance(collapsedE, "src", "dst",
          seedRoots, "frontier_url", maxDepth = focusMaxDepth)
        Outlinks.focusedRankPriorities(ranks,
          Outlinks.focusedPriorities(idx, t, dist,
            termCol = topicTermCol, decay = focusDecay))
      }
      val priorities = smPagesNow.fold(baseRanks)(sm =>
        Outlinks.sitemapBoostedPriorities(baseRanks, sm))
      val plan = pin(Outlinks.fetchPlan(contained, "frontier_url",
          polFrame, polHost, polRobots, agent, defaultDelay,
          maxPerHost = maxPerHost, priorities = Some(priorities),
          fetchedAtCol = polFat, maxAgeSeconds = maxAgeSeconds,
          asOf = asOfC, hostBudgets = hostBudgets,
          budgetHostCol = budgetHostCol, budgetCol = budgetCol))
      val plannedCount = plan.count()
      gate(plannedCount)

      val pages = fetch(plan, c).localCheckpoint()
      val content = pages.filter(col("http_status") === 200)
      val prior = if (c == 0) None
        else Some((0 until c).map(i =>
          spark.read.parquet(s"$archiveDir/batch=$i/_cdx"))
          .reduce(_ unionByName _))
      val archived = graft.sources.WarcIO.warcDedupSave(
        content, s"$archiveDir/batch=$c", priorIndex = prior)

      seen = pin(seen
        .unionByName(plan.select(col("frontier_url").as("url")))
        .distinct())

      val html = content
        .filter(lower(coalesce(col("http_content_type"), lit("")))
          .startsWith("text/html"))
        .select(col("target_uri"),
          CharsetDecode.decodePayload(
            col("payload"), col("http_content_type")).as("text"))
      val anchorLinks = Outlinks.extractOutlinks(
          html, "text", "target_uri")
        .select(col("target_uri").as("src"), col("outlink").as("dst"))
      // focused evidence: nofollow-filtered anchor texts, target in
      // the frontier's canonical form, ONE vote per (page, target,
      // text) — stable under refetch (the distinct absorbs revisits)
      val anchorsDelta = topics.fold(emptyState("anchors")) { _ =>
        Outlinks.extractAnchors(html, "text", "target_uri")
          .filter(!coalesce(col("nofollow"), lit(false)))
          .filter(col("anchor_text").isNotNull)
          .select(col("target_uri").as("page_uri"),
            TextAnalysis.canonicalUrl(col("outlink")).as("outlink"),
            col("anchor_text"))
          .filter(col("outlink").isNotNull
            && col("outlink").rlike("^https?://"))
      }
      if (topics.isDefined)
        anchorsAcc = pin(anchorsAcc.unionByName(anchorsDelta)
          .distinct())
      val redirE = Outlinks.redirectEdges(pages)
        .select(col("redirect_from").cast("string"),
          col("redirect_to").cast("string"))
      val refreshE = Outlinks.metaRefreshEdges(html, "text", "target_uri")
        .select(col("refresh_from").cast("string").as("redirect_from"),
          col("refresh_to").cast("string").as("redirect_to"))
      val canonE = Outlinks.canonicalLinkEdges(html, "text", "target_uri")
        .select(col("page_uri").cast("string"),
          col("canonical_uri").cast("string"))
      redirAcc = pin(redirAcc.unionByName(redirE).unionByName(refreshE)
        .distinct())
      canonAcc = pin(canonAcc.unionByName(canonE)
        .distinct())
      // anchor links only vote in the graph — redirects are aliases
      // (the mapping collapses them), and double-counting them as
      // edges would let every moved page vote twice
      edgesAcc = pin(edgesAcc.unionByName(anchorLinks)
        .distinct())
      // accumulated frames grow by per-page link fan-out, which no
      // per-cycle count predicts — while tiny, re-measure them (cheap
      // single-partition cached scans) so the NEXT pins see growth
      if (loopTiny)
        gate(seen.count(), edgesAcc.count(), redirAcc.count(),
          canonAcc.count(), smEntriesAcc.count(),
          (if (topics.isDefined) anchorsAcc.count() else 0L))

      // redirect targets AND declared canonical URIs join the feed: a
      // moved page's destination and a variant's canonical form are
      // both pages the crawl should hold under their true URL
      val linkFeed = anchorLinks.select(col("dst").as("__l"))
        .unionByName(redirE.select(col("redirect_to").as("__l")))
        .unionByName(refreshE.select(col("redirect_to").as("__l")))
        .unionByName(canonE.select(col("canonical_uri").as("__l")))
      pending = pin(frontier
        .join(plan.select("frontier_url"), Seq("frontier_url"),
          "left_anti")
        .unionByName(Outlinks.canonicalLinks(linkFeed, "__l")
          .unionByName(smNewLocs)
          .join(seen.select(col("url").as("frontier_url")),
            Seq("frontier_url"), "left_anti"))
        .distinct())

      stateDir.foreach { _ =>
        saveState(c, Map(
          // deltas: only this cycle's new rows (O(cycle), not O(crawl))
          "seen" -> plan.select(col("frontier_url").as("url")),
          "redir" -> redirE.unionByName(refreshE),
          "canon" -> canonE,
          "edges" -> anchorLinks,
          "anchors" -> anchorsDelta,
          "policies" -> policiesDelta,
          "robots_attempts" -> robotsDelta,
          "sm_entries" -> smEntriesDelta,
          "sm_attempts" -> smAttemptsDelta,
          // working-set snapshots: frontier-sized, rewritten per cycle
          "pending" -> pending,
          "ranks" -> ranksPrev.getOrElse(emptyState("ranks"))))
      }

      results += CycleResult(c, frontierSize, plannedCount, dueCount,
        archived, plan, robotsFetched, sitemapsFetched)
    }
    results.result()
  }
}
