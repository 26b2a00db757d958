package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlink extraction + crawl-frontier derivation — the tail of the
  * crawl loop: fetch → extract → OUTLINKS → FRONTIER → fetch. Both
  * operators are plain narrow/shuffle-once DataFrame transforms:
  * extraction is a per-row regex + explode (no state, no shuffle), and
  * the frontier is one distinct + one anti-join, both hashing on the
  * canonical URL — high-cardinality, skew-free keys at any corpus
  * size.
  *
  * Reference framing: the public crawl pipelines this engine models
  * (WARC → WET → curation) all regenerate their fetch frontier from
  * anchor hrefs; see ISO 28500 for the archive side. */
object Outlinks {

  /** RFC 3986 §5 reference resolution as a scalar kernel. A grouped
    * stateful parse with dot-segment normalization has no public
    * Column formulation (same rationale as [[Robots]]'s evaluator);
    * `java.net.URI` implements the RFC algorithm exactly. Returns
    * null for unresolvable/junk refs — a frontier must never enqueue
    * half-parsed garbage. */
  private[graft] def resolveRef(base: String, ref: String): String = {
    if (base == null || ref == null) return null
    val r = ref.trim
    if (r.isEmpty || r.startsWith("#")) return null // same-document
    val lower = r.toLowerCase
    if (lower.startsWith("javascript:") || lower.startsWith("mailto:")
      || lower.startsWith("data:") || lower.startsWith("tel:")) return null
    // crawl hrefs carry literal spaces often enough to matter
    val cleaned = r.replace(" ", "%20")
    // query-only reference: RFC 3986 §5.3 keeps the BASE path, but
    // java.net.URI (RFC 2396 lineage) drops the final path segment —
    // splice onto the base directly, then VALIDATE the splice (junk
    // bytes in the query must null out, same as everywhere else)
    if (cleaned.startsWith("?")) {
      val b = base.trim
      val q = b.indexOf('?'); val f = b.indexOf('#')
      val cut = math.min(if (q >= 0) q else b.length,
        if (f >= 0) f else b.length)
      val rf = cleaned.indexOf('#')
      val candidate = b.substring(0, cut) +
        (if (rf >= 0) cleaned.substring(0, rf) else cleaned)
      return try {
        if (new java.net.URI(candidate).isAbsolute) candidate else null
      } catch { case _: Exception => null }
    }
    try {
      val resolved = new java.net.URI(base.trim).resolve(
        new java.net.URI(cleaned)).normalize()
      // authority required: an opaque absolute URI (`urn:x`, or a
      // junk `V:a` ref the fuzzer produced) has no host to fetch
      // from — a frontier key must be hierarchical
      if (!resolved.isAbsolute || resolved.getRawAuthority == null) null
      else {
        var s = resolved.toString
        // drop the fragment: a frontier key never includes one
        val h = s.indexOf('#')
        if (h >= 0) s = s.substring(0, h)
        // java.net.URI keeps excess '..' above the root; RFC 3986
        // remove_dot_segments drops them — fix on the string (multi-arg
        // URI constructors would double-encode existing escapes)
        val prefix = resolved.getScheme + "://" + resolved.getRawAuthority
        if (s.startsWith(prefix + "/..")) {
          var rest = s.substring(prefix.length)
          while (rest.startsWith("/../")) rest = rest.substring(3)
          if (rest == "/..") rest = "/"
          s = prefix + rest
        }
        s
      }
    } catch { case _: Exception => null }
  }

  private val resolveUdf = udf(resolveRef _)

  /** Absolute resolved URL (fragment-stripped) of one href against one
    * base, null when the ref is same-document, non-fetchable
    * (javascript:/mailto:/data:/tel:) or unparseable. */
  def resolveUri(base: Column, ref: Column): Column = resolveUdf(base, ref)

  /** Anchor hrefs of an HTML column, raw (pre-resolution): both quote
    * styles; HTML character references in the URL decoded (`&amp;` is
    * the norm inside real hrefs). Unquoted hrefs — vanishingly rare in
    * post-2000 markup — are not matched; the extraction is a curation
    * signal, not a validator. */
  private def rawHrefs(html: Column): Column =
    transform(
      regexp_extract_all(html,
        lit("(?i)<a\\b[^>]*?\\bhref\\s*=\\s*[\"']([^\"']*)[\"']"), lit(1)),
      h => TextAnalysis.decodeHtmlEntities(h))

  private val resolveAllUdf = udf(
    (base: String, refs: Seq[String]) =>
      if (refs == null) Seq.empty[String]
      else refs.map(r => resolveRef(base, r)).filter(_ != null))

  /** ALL resolved outlinks of one page as an `array<string>` — the
    * per-page (non-exploded) form WAT-style metadata records embed;
    * one kernel invocation per page, order = document order,
    * non-fetchables dropped. */
  def pageLinks(html: Column, base: Column): Column =
    resolveAllUdf(base, rawHrefs(html))

  /** The page `<title>` — first title element's text, HTML character
    * references decoded, whitespace runs collapsed, null when absent
    * or empty: the WAT metadata field ([[graft.sources.WarcIO
    * .watPayload]]) and a curation signal in its own right. Codegen'd
    * end to end (regexp + entity decode), narrow per-row. */
  def htmlTitle(html: Column): Column = {
    val raw = regexp_extract(html,
      "(?is)<title[^>]*>(.*?)</title>", 1)
    val cleaned = trim(regexp_replace(
      TextAnalysis.decodeHtmlEntities(raw), "\\s+", " "))
    when(length(cleaned) > 0, cleaned)
  }

  /** One output row per (page row, outlink): every input column plus
    * `outCol` holding the ABSOLUTE resolved URL. Pages with no
    * resolvable link emit nothing (the frontier shape); rows explode
    * narrowly — no shuffle, no driver state. Resolution happens after
    * the explode so the RFC 3986 kernel runs on a plain column. */
  def extractOutlinks(
      df: DataFrame, html: String, baseUri: String,
      outCol: String = "outlink"): DataFrame =
    df.withColumn(outCol, explode(rawHrefs(col(html))))
      .withColumn(outCol, resolveUri(col(baseUri), col(outCol)))
      .filter(col(outCol).isNotNull)

  /** Outlinks WITH their anchor text — the classic relevance signal a
    * URL-priority classifier trains on (the linking page describes the
    * target). One output row per CLOSED `<a href=…>…</a>` element:
    * every input column plus `outCol` (absolute resolved URL, same
    * resolution as [[extractOutlinks]]), `textCol` (the anchor's
    * inner text: nested tags stripped, entities decoded, whitespace
    * collapsed; null when empty — an image link), and `nofollow`
    * (true when the anchor's rel tokens include `nofollow` — filter
    * these before feeding [[LinkGraph]], they are links the page
    * explicitly declined to vouch for). Unterminated anchors
    * emit nothing here — the inner-text pattern refuses to cross the
    * NEXT `<a`, so a torn anchor cannot swallow its well-formed
    * neighbor (they still surface in [[extractOutlinks]], which
    * matches on the opening tag alone); like the rest of this module,
    * a curation signal, not a validator.
    *
    * Shape: href and inner text come from TWO `regexp_extract_all`
    * passes over the SAME pattern (one group each — the engine's
    * multi-group form returns one group per call), zipped positionally;
    * identical pattern ⇒ identical match sequence, so the zip cannot
    * misalign. Narrow per-row work, then one explode — no shuffle. */
  def extractAnchors(
      df: DataFrame, html: String, baseUri: String,
      outCol: String = "outlink",
      textCol: String = "anchor_text"): DataFrame = {
    val pat =
      "(?is)<a\\b([^>]*?)\\bhref\\s*=\\s*[\"']([^\"']*)[\"']([^>]*)>" +
        "((?:(?!<a\\b).)*?)</a\\s*>"
    def grp(i: Int) = regexp_extract_all(col(html), lit(pat), lit(i))
    val cleanedText = {
      val noTags = regexp_replace(col(textCol), "(?s)<[^>]*>", " ")
      val decoded = TextAnalysis.decodeHtmlEntities(noTags)
      val collapsed = trim(regexp_replace(decoded, "\\s+", " "))
      when(length(collapsed) > 0, collapsed)
    }
    // rel token scan across BOTH attribute slices (href may sit
    // between rel and the tag end): a nofollow edge must not vote in
    // LinkGraph.pageRank/hits
    val attrs = concat(col("__a.0"), lit(" "), col("__a.2"))
    val noFollow = attrs.rlike(
      "(?i)\\brel\\s*=\\s*[\"']?[^\"'>]*\\bnofollow\\b")
    df.withColumn("__a",
        explode(arrays_zip(grp(1), grp(2), grp(3), grp(4))))
      .withColumn(outCol, resolveUri(col(baseUri),
        TextAnalysis.decodeHtmlEntities(col("__a.1"))))
      .withColumn(textCol, col("__a.3"))
      .filter(col(outCol).isNotNull)
      .withColumn(textCol, cleanedText)
      .withColumn("nofollow", noFollow)
      .drop("__a")
  }

  /** Anchor-text INDEX — the classic IR signal (Brin & Page 1998 §2.2:
    * the linking pages describe the target better than the target
    * does): per target URL, the `k` most common anchor texts across
    * the corpus with their reference counts. Feeds URL-priority
    * classifiers, query-independent relevance, and seed expansion.
    * Input is [[extractAnchors]] output (or any (url, text) frame);
    * null texts (image-only anchors) drop, and `nofollowCol` — pass
    * `Some("nofollow")` for extractAnchors frames — drops the links
    * pages explicitly declined to vouch for, exactly as [[LinkGraph]]
    * consumers should.
    *
    * Scale shape: one hash aggregation on the (url, text) pair
    * (maximally high-cardinality), then [[Skew.topKPerGroup]] for the
    * per-URL top-k by `(count desc, text)` — salted two-level rank, so
    * one hugely-referenced target (every site's home page) never pins
    * a task. `(count, text)` is a total order per URL: deterministic,
    * re-derivable.
    *
    * @return `outCol`, `textCol`, `n_refs`, `text_rank` (1..k) */
  def anchorTextIndex(
      anchors: DataFrame, outCol: String = "outlink",
      textCol: String = "anchor_text", k: Int = 5,
      nofollowCol: Option[String] = None,
      salts: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val followed = nofollowCol.fold(anchors)(c =>
      anchors.filter(!coalesce(col(c), lit(false))))
    val counts = followed
      .filter(col(textCol).isNotNull)
      .groupBy(col(outCol), col(textCol))
      .agg(count(lit(1)).as("n_refs"))
    Skew.topKPerGroup(counts, Seq(outCol),
        Seq(col("n_refs").desc, col(textCol)), k,
        col(textCol), salts)
      .withColumnRenamed("rank", "text_rank")
  }

  /** FOCUSED-CRAWL frontier priorities — the classic recipe
    * (Chakrabarti et al., "Focused crawling", WWW 1999): what the
    * crawl's own signals say a URL is ABOUT ([[anchorTextIndex]] —
    * the linking pages describe the target) crossed with how far it
    * sits from a curated seed set ([[LinkGraph.seedDistance]] — depth
    * is a quality prior). Feed the result straight to [[fetchPlan]]'s
    * `priorities` (or through [[sitemapBoostedPriorities]]).
    *
    * Pinned semantics (q_t80 + FetchPlanSpec):
    *  - anchor texts tokenize by lowercasing and splitting on
    *    non-alphanumeric runs (the [[TextAnalysis]] word convention);
    *    a text MATCHES when any token equals a topic term
    *    (terms compared lowercased/trimmed);
    *  - topic score per URL = Σ weight over matching texts ÷ Σ weight
    *    over all its texts — the fraction of references that vouch
    *    for the topic, in [0, 1];
    *  - `priority = score × decay^depth`: depth 0 (a seed) keeps its
    *    full score, each hop multiplies by `decay`;
    *  - the distance join is INNER: a URL the seed BFS never reached
    *    gets NO row — downstream [[fetchPlan]] scores it 0.0, after
    *    every topic-scored URL (deep-tail territory is where traps
    *    live). Duplicate distance rows reduce to MIN depth.
    * Input contract: one row per (url, text) pair, exactly what
    * [[anchorTextIndex]] emits.
    *
    * Scale shape: the token explode is bounded by anchor-text length
    * (short by construction); topic terms broadcast into a semi-join
    * on the token; then one URL-hashed aggregation and one URL-hashed
    * join — no window, no driver action.
    *
    * @return `node`, `priority` — [[fetchPlan]]'s priority shape */
  def focusedPriorities(
      anchorIndex: DataFrame, topics: DataFrame, distances: DataFrame,
      urlCol: String = "outlink", textCol: String = "anchor_text",
      weightCol: String = "n_refs", termCol: String = "term",
      nodeCol: String = "node", depthCol: String = "depth",
      decay: Double = 0.5): DataFrame = {
    require(decay > 0 && decay <= 1, s"decay must be in (0,1]: $decay")
    val a = anchorIndex
      .select(col(urlCol).cast("string").as("__u"),
        col(textCol).cast("string").as("__t"),
        col(weightCol).cast("double").as("__w"))
      .filter(col("__t").isNotNull)
    val toks = a.select(col("__u"), col("__t"),
      explode(array_distinct(org.apache.spark.sql.functions.filter(
        split(lower(col("__t")), "[^\\p{L}\\p{Nd}]+"),
        t => length(t) > 0))).as("__tok"))
    val terms = topics
      .select(lower(trim(col(termCol))).as("__tok"))
      .filter(col("__tok").isNotNull).distinct()
    val matched = toks
      .join(broadcast(terms), Seq("__tok"), "left_semi")
      .select("__u", "__t").distinct()
      .withColumn("__m", lit(true))
    val scored = a.join(matched, Seq("__u", "__t"), "left")
      .groupBy(col("__u"))
      .agg((sum(when(col("__m"), col("__w")).otherwise(lit(0.0)))
        / sum(col("__w"))).as("__score"))
    val dist = distances
      .select(col(nodeCol).cast("string").as("__u"),
        col(depthCol).cast("int").as("__d"))
      .groupBy("__u").agg(min(col("__d")).as("__d"))
    scored.join(dist, Seq("__u"))
      .select(col("__u").as("node"),
        (col("__score") * pow(lit(decay), col("__d"))).as("priority"))
  }

  /** RELEVANCE × AUTHORITY — the pinned combination rule that turns a
    * ranked crawl into a FOCUSED crawl: [[focusedPriorities]]' topical
    * score (what the linking pages say a URL is about, seed-depth
    * decayed) multiplied into [[LinkGraph.pageRank]]'s authority, as
    * one `node`/`rank` frame ready for [[fetchPlan]]'s `priorities`
    * (or [[sitemapBoostedPriorities]] on the way there — the sitemap
    * bootstrap then scales by the best COMBINED score).
    *
    * Pinned semantics (q_t82 + NorthStarSpec's focused cycle test):
    *  - `rank = pagerank × focus` via an INNER join on the node: a
    *    URL missing from EITHER side gets NO row, so downstream
    *    [[fetchPlan]] scores it 0.0 — off-topic URLs (focus 0) and
    *    seed-unreached URLs (no focus row) fetch after every
    *    topic-matched one REGARDLESS of raw rank, which is the whole
    *    point of focusing; among the topical, authority still orders
    *    the queue;
    *  - duplicate rows per node on either side reduce to MAX first
    *    (defensive, same as [[sitemapBoostedPriorities]]).
    * Scale shape: two hash aggregations + one equi-join, all on the
    * URL — no window, no driver action.
    *
    * @return `node`, `rank` — [[fetchPlan]]'s default priority shape */
  def focusedRankPriorities(
      ranks: DataFrame, focused: DataFrame,
      nodeCol: String = "node", rankCol: String = "rank",
      focusNodeCol: String = "node", focusCol: String = "priority")
      : DataFrame = {
    val r = ranks
      .select(col(nodeCol).cast("string").as("node"),
        col(rankCol).cast("double").as("__r"))
      .groupBy("node").agg(max(col("__r")).as("__r"))
    val f = focused
      .select(col(focusNodeCol).cast("string").as("node"),
        col(focusCol).cast("double").as("__f"))
      .groupBy("node").agg(max(col("__f")).as("__f"))
    r.join(f, Seq("node"))
      .select(col("node"), (col("__r") * col("__f")).as("rank"))
  }

  /** Meta-refresh redirect targets — the in-markup redirect class HTTP
    * headers never see (`<meta http-equiv="refresh"
    * content="5;url=/next">`): one row per page whose HTML declares
    * one, with the delay seconds and the target RESOLVED against the
    * page URI. Crawlers treat these as soft redirects; a frontier that
    * ignores them loses the same pages a Location-dropping crawler
    * would. Narrow per-row regex, no shuffle. */
  /** The raw `<meta http-equiv=refresh>` content value of an HTML
    * column, "" when none. Per-quote-style captures: a double-quoted
    * content value may carry single quotes inside
    * (content="0; URL='/x'") and vice versa. BOTH attribute orders
    * match (http-equiv before content and content before http-equiv —
    * HTML attribute order is not semantic, and real markup uses
    * both), as does an unquoted content value (content=5;url=/x —
    * legal while it carries no whitespace or quotes). */
  private def metaRefreshContent(html: Column): Column = {
    // one alternation covers all three value forms per attribute
    // order (the quotes ride into the capture and are stripped below —
    // a double-quoted value may carry single quotes inside and vice
    // versa, so the strip only peels the OUTER pair)
    val value = "(\"[^\"]*\"|'[^']*'|[^\\s\"'>]+)"
    val heFirst =
      "(?is)<meta\\b[^>]*http-equiv\\s*=\\s*[\"']?refresh[\"']?[^>]*" +
        "\\bcontent\\s*=\\s*" + value
    val contentFirst =
      "(?is)<meta\\b[^>]*\\bcontent\\s*=\\s*" + value +
        "[^>]*http-equiv\\s*=\\s*[\"']?refresh[\"']?"
    def ext(pat: String) =
      nullif(regexp_extract(html, pat, 1), lit(""))
    // cheap pre-gate: every variant requires the literal token
    // `refresh`, and the overwhelming majority of pages never contain
    // it — one linear scan spares them the pattern coalesce
    val raw = when(html.rlike("(?i)refresh"),
      coalesce(ext(heFirst), ext(contentFirst), lit("")))
      .otherwise(lit(""))
    regexp_replace(raw, "^[\"']|[\"']$", "")
  }

  /** The RESOLVED meta-refresh target of one page as a Column (null
    * when the page declares none) — the scalar form
    * [[graft.streaming.Streams.crawlFrontierStream]] folds into its
    * single-scan link projection; [[metaRefreshEdges]] is the
    * DataFrame form with the delay attached. */
  def metaRefreshTarget(html: Column, uri: Column): Column = {
    val content = metaRefreshContent(html)
    val target = regexp_extract(content,
      "(?i)url\\s*=\\s*['\"]?([^'\"\\s;]+)", 1)
    when(length(content) > 0 && length(target) > 0,
      resolveUri(uri, TextAnalysis.decodeHtmlEntities(target)))
  }

  def metaRefreshEdges(
      df: DataFrame, html: String, uriCol: String): DataFrame = {
    val content = metaRefreshContent(col(html))
    val delay = regexp_extract(content, "^\\s*(\\d+)", 1)
    val target = regexp_extract(content,
      "(?i)url\\s*=\\s*['\"]?([^'\"\\s;]+)", 1)
    df.filter(length(content) > 0 && length(target) > 0)
      .select(col(uriCol).as("refresh_from"),
        resolveUri(col(uriCol),
          TextAnalysis.decodeHtmlEntities(target)).as("refresh_to"),
        coalesce(nullif(delay, lit("")).cast("int"), lit(0))
          .as("refresh_delay"))
      .filter(col("refresh_to").isNotNull)
  }

  /** `rel=canonical` declarations — the dedup/canonicalization signal
    * the page itself publishes (`<link rel="canonical" href=…>`): one
    * row per page declaring one, with the canonical target resolved
    * against the page URI. A curation pipeline collapses URL variants
    * onto this target before content dedup ever runs. Both attribute
    * orders match (rel-then-href and href-then-rel). Narrow per-row
    * regex, no shuffle. */
  def canonicalLinkEdges(
      df: DataFrame, html: String, uriCol: String): DataFrame = {
    val href = coalesce(
      nullif(regexp_extract(col(html),
        "(?is)<link\\b[^>]*rel\\s*=\\s*[\"']?canonical[\"']?[^>]*" +
          "\\bhref\\s*=\\s*[\"']([^\"']*)[\"']", 1), lit("")),
      nullif(regexp_extract(col(html),
        "(?is)<link\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"']*)[\"']" +
          "[^>]*rel\\s*=\\s*[\"']?canonical[\"']?", 1), lit("")))
    df.filter(href.isNotNull)
      .select(col(uriCol).as("page_uri"),
        resolveUri(col(uriCol),
          TextAnalysis.decodeHtmlEntities(href)).as("canonical_uri"))
      .filter(col("canonical_uri").isNotNull)
  }

  /** Redirect edges of a crawl frame — the OTHER frontier feed HTTP
    * itself emits: one row per 3xx response carrying a `Location`
    * header, with `redirect_from` (the capture URI), `redirect_to`
    * (the Location value RESOLVED against the capture URI — RFC 7231
    * §7.1.2 allows relative references), and the `http_status`
    * (301/302/303/307/308 are permanence signals a canonicalizer
    * consumes). A crawler that drops these loses every moved page:
    * union `redirect_to` into [[crawlFrontier]]'s link feed alongside
    * anchor outlinks and sitemap locs. Narrow per-row work on the
    * `http_headers` map (keys arrive lowercased from the reader) —
    * no shuffle. */
  def redirectEdges(
      df: DataFrame, uriCol: String = "target_uri"): DataFrame =
    df.filter(col("http_status").between(300, 399)
        && col("http_headers").getItem("location").isNotNull)
      .select(col(uriCol).as("redirect_from"),
        resolveUri(col(uriCol), col("http_headers").getItem("location"))
          .as("redirect_to"),
        col("http_status"))
      .filter(col("redirect_to").isNotNull)

  /** The RESOLVED redirect target of one capture as a Column (null
    * when not a Location-bearing 3xx) — the scalar form
    * [[graft.streaming.Streams.crawlFrontierStream]] folds into its
    * single-scan link projection; [[redirectEdges]] is the DataFrame
    * form with the status attached. */
  def redirectTarget(
      status: Column, headers: Column, uri: Column): Column =
    when(status.between(300, 399)
        && headers.getItem("location").isNotNull,
      resolveUri(uri, headers.getItem("location")))

  /** Resolve redirect CHAINS to their final targets — the
    * canonicalization step after [[redirectEdges]]: a page that moved
    * twice (A→B→C) should dedup, join, and frontier under C, not B.
    * Pointer doubling (the [[ConnectedComponents]] mechanism applied
    * to a functional graph): each round every source adopts its
    * target's target, so an L-hop chain resolves in ⌈log2 L⌉ rounds of
    * one self-equi-join each — `maxIters = 16` covers chains of 65k
    * hops, far beyond any real redirect depth. No driver state beyond
    * the loop counter; frames localCheckpoint per round (plan
    * truncation, as everywhere iterative here).
    *
    * Pinned semantics:
    *  - one edge per source: multiple captured Locations for the same
    *    URL reduce to the MIN target (deterministic, no fan-out);
    *  - `final_target` = the first URL along the walk that is not
    *    itself a redirect source;
    *  - a walk that never exits (a redirect CYCLE — A→B→A) yields
    *    `final_target` null and `is_cycle` true: a crawler must not
    *    fetch into a loop, and a silent self-pick would be a wrong
    *    canonical.
    *
    * @return one row per redirect source: `redirect_from`,
    *         `final_target`, `is_cycle` */
  def resolveRedirectChains(
      redirects: DataFrame, fromCol: String = "redirect_from",
      toCol: String = "redirect_to", maxIters: Int = 16): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1: $maxIters")
    val base = redirects
      .groupBy(col(fromCol).cast("string").as("__from"))
      .agg(min(col(toCol).cast("string")).as("__to"))
      .localCheckpoint()
    // a redirect CYCLE never converges under the `changed` probe (its
    // targets orbit every round), so without a data-derived cap every
    // cycle-bearing input pays all `maxIters` rounds. A non-cycle walk
    // visits distinct sources, so its hop distance is < n and pointer
    // doubling resolves it within ceil(log2 n) rounds — everything
    // still moving after that is provably orbiting a cycle. `base` is
    // already materialized, so the count is a cheap local scan.
    val n = base.count()
    val enough = math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n)))
    val rounds = math.min(maxIters, enough)
    // tiny-loop gate ([[TinyLoop]]): every round frame is exactly one
    // row per source, so the already-paid-for count covers the loop
    val tiny = TinyLoop.isTiny(redirects.sparkSession, n)
    var labels = base
    var iter = 0
    var changed = n > 0
    while (changed && iter < rounds) {
      // doubling: jump through the CURRENT compressed map, not the
      // one-hop base — each round squares the stride
      val hop = labels.select(col("__from").as("__hf"),
        col("__to").as("__ht"))
      // the convergence probe rides the materialization as an observed
      // metric ([[TinyLoop.pinCounted]], the [[ConnectedComponents]]
      // trick) instead of a second per-round job over the pinned frame:
      // __prev is already on the join, so the changed-count is free,
      // and converged inputs still stop looping early (cycles never
      // converge: they keep orbiting until the ⌈log2 n⌉ cap)
      val (next, nChanged) = TinyLoop.pinCounted(labels
        .join(hop, labels("__to") === hop("__hf"), "left")
        .select(col("__from"), col("__to").as("__prev"),
          coalesce(col("__ht"), col("__to")).as("__to")),
        tiny, s"graft_redir_changed_$iter",
        sum(when(col("__to") =!= col("__prev"), 1L).otherwise(0L)))
      changed = nChanged > 0
      labels = next.select("__from", "__to")
      iter += 1
    }
    // a target still in the source domain after ⌈log2 65k⌉ doublings
    // is walking a cycle, not a long chain
    val srcs = base.select(col("__from").as("__cyc_from"))
    labels.join(srcs, labels("__to") === srcs("__cyc_from"), "left")
      .select(col("__from").as(fromCol),
        when(col("__cyc_from").isNull, col("__to")).as("final_target"),
        col("__cyc_from").isNotNull.as("is_cycle"))
  }

  /** REWRITE a URL column through a canonicalization mapping — the
    * consumer side of the signals this module extracts: redirect
    * chains ([[resolveRedirectChains]]'s `redirect_from →
    * final_target`) and page-declared canonicals
    * ([[canonicalLinkEdges]]'s `page_uri → canonical_uri`). One left
    * equi-join on the URL; unmapped URLs — and mapped rows whose
    * target is NULL, i.e. redirect CYCLES — keep their original value
    * (a crawler must not canonicalize into a loop). Chain one call
    * per signal class (redirect finals first, then declared
    * canonicals — the declaration lives on the page the redirect
    * lands on). Duplicate mapping keys reduce to the MOST-REFERENCED
    * non-null target (count desc, then min target — deterministic):
    * when a key's observations disagree — one capture declared B,
    * three declared C — the weight of evidence wins, as a crawler
    * resolves conflicting declarations in practice; a well-formed
    * mapping has one target per key and is unaffected. Rows are
    * NOT deduplicated — two URLs collapsing onto one canonical is
    * exactly what downstream `distinct`/dedup keys on.
    *
    * Scale shape: one join hashing on the URL (maximally
    * high-cardinality; broadcast when the mapping is small) plus a
    * narrow coalesce; the conflict reduction
    * ([[mostReferencedTarget]]) is mapping-side only. */
  def applyCanonical(
      df: DataFrame, urlCol: String,
      mapping: DataFrame, fromCol: String, toCol: String): DataFrame = {
    val inCols = df.columns.toSeq
    val m = mostReferencedTarget(
      mapping, col(fromCol), col(toCol), urlCol, "__canon")
    df.join(m, Seq(urlCol), "left")
      .withColumn(urlCol, coalesce(col("__canon"), col(urlCol)))
      .select(inCols.map(col): _*)
  }

  /** One row per key holding its most-REFERENCED non-null target
    * (count desc, then min target — a deterministic total order): the
    * conflict-resolution rule shared by [[applyCanonical]] and
    * [[canonicalMapping]]. Feed UNREDUCED observation rows (one per
    * capture/declaration) and the weight of evidence decides; a
    * pre-deduplicated frame degrades gracefully to the min-target
    * tiebreak. Keys with no non-null target are ABSENT (callers
    * needing them — cycle fallbacks — left-join back on the key set).
    * Two hash aggregations, no join: the second pass takes
    * `min(struct(-count, target))`, whose field-ordered struct
    * comparison IS "count desc, then target asc" in one reduction —
    * mapping-side work, broadcastable when small. */
  private def mostReferencedTarget(
      df: DataFrame, key: Column, target: Column,
      keyName: String, valName: String): DataFrame = {
    val w = df
      .select(key.cast("string").as(keyName),
        target.cast("string").as(valName))
      .filter(col(valName).isNotNull)
      .groupBy(keyName, valName).agg(count(lit(1)).as("__n"))
    w.groupBy(keyName)
      .agg(min(struct((-col("__n")).as("__negn"),
        col(valName).as("__v"))).as("__s"))
      .select(col(keyName), col("__s").getField("__v").as(valName))
  }

  /** ONE alias→canonical mapping from the crawl loop's OWN signals —
    * the frame [[applyCanonical]]/[[collapseEdges]]/
    * [[graft.streaming.Streams.crawlFrontierStream]] consume, built
    * from resolved redirect chains ([[resolveRedirectChains]] output:
    * `redirect_from → final_target`, null on cycles) and page-declared
    * canonicals ([[canonicalLinkEdges]] output: `page_uri →
    * canonical_uri`). Without it the two signal classes are dead code
    * from the loop's perspective: URL aliases split rank mass in the
    * link graph and double-fetch in the frontier.
    *
    * PRECEDENCE (pinned by OutlinksSpec and q_t78): the mapping is
    * defined to equal chaining [[applyCanonical]] twice — redirect
    * finals FIRST, then declared canonicals:
    *  - a redirect source maps to its chain's final target, and when
    *    that LANDING page itself declares a canonical, composes one
    *    step further onto it (the declaration lives on the page the
    *    redirect lands on);
    *  - a page that both redirects AND declares a canonical maps by
    *    the REDIRECT: a 3xx means the declaring markup was never
    *    served from that URL, so the server-level signal wins;
    *  - a redirect-CYCLE source falls back to its own declared
    *    canonical when it has one (the chain gave no answer), else
    *    stays unmapped — never canonicalize into a loop;
    *  - a non-redirecting page with a declaration maps onto it.
    * Declared-canonical chains (A declares B, B declares C) resolve
    * ONE level per crawl cycle by design — a page declaring a
    * canonical that itself declares another is self-inconsistent
    * markup, and the next cycle's mapping picks up the rest. Identity
    * rows (a page declaring itself canonical — the common case) are
    * dropped: they are no-ops under [[applyCanonical]] and would only
    * bloat the mapping's build side. Duplicate keys reduce to the
    * MOST-REFERENCED non-null target within each signal class (count
    * desc, then min — deterministic; feed unreduced observation rows
    * and the weight of evidence resolves conflicting declarations).
    *
    * Scale shape: two hash aggregations (one per signal class), two
    * equi-joins + one anti-join, all hashing on the URL — maximally
    * high-cardinality keys, broadcast when the declaration side is
    * small.
    *
    * @return `alias_url`, `canonical_url` — one row per alias */
  def canonicalMapping(
      chains: DataFrame, canonicals: DataFrame,
      fromCol: String = "redirect_from", toCol: String = "final_target",
      pageCol: String = "page_uri", canonCol: String = "canonical_uri")
      : DataFrame = {
    val c = mostReferencedTarget(
      canonicals, col(pageCol), col(canonCol), "__cp", "__cc")
    // the same count-desc-then-min struct reduction, with a
    // nulls-last flag leading the struct: a duplicated source with
    // one cycle row and one resolved row keeps the resolved target
    // (any non-null beats every null), while an all-null (pure-cycle)
    // source KEEPS its null __rt row — it falls through to its own
    // declared canonical below. Two hash aggs, no join.
    val rw = chains
      .select(col(fromCol).cast("string").as("alias_url"),
        col(toCol).cast("string").as("__rt"))
      .groupBy("alias_url", "__rt").agg(count(lit(1)).as("__n"))
    val r = rw.groupBy("alias_url")
      .agg(min(struct(col("__rt").isNull.as("__nl"),
        (-col("__n")).as("__negn"), col("__rt").as("__v"))).as("__s"))
      .select(col("alias_url"), col("__s").getField("__v").as("__rt"))
    val landing = c.select(col("__cp").as("__lp"), col("__cc").as("__lc"))
    val self = c.select(col("__cp").as("__sp"), col("__cc").as("__sc"))
    val viaRedirect = r
      .join(landing, r("__rt") === col("__lp"), "left")
      .join(self, r("alias_url") === col("__sp"), "left")
      .select(col("alias_url"),
        when(col("__rt").isNotNull, coalesce(col("__lc"), col("__rt")))
          .otherwise(col("__sc")).as("canonical_url"))
    val declOnly = c
      .join(r.select("alias_url"), c("__cp") === col("alias_url"),
        "left_anti")
      .select(col("__cp").as("alias_url"), col("__cc").as("canonical_url"))
    viaRedirect.unionByName(declOnly)
      .filter(col("canonical_url").isNotNull
        && col("canonical_url") =!= col("alias_url"))
  }

  /** Collapse a link-graph EDGE list through a canonical mapping —
    * what [[LinkGraph.pageRank]]/[[hostGraph]] consumers run before
    * ranking, so URL aliases stop splitting rank mass: both endpoints
    * rewrite through [[applyCanonical]], self-edges the collapse
    * CREATES (a page linking to an alias of itself) drop by default
    * (they would be a navigation self-vote, the same reason
    * [[hostGraph]] drops intra-host edges), and multi-aliases
    * collapsing onto one edge dedupe to a single vote. Two URL-hashed
    * joins + one distinct; no new shuffle keys beyond what ranking
    * itself needs. */
  def collapseEdges(
      edges: DataFrame, srcCol: String, dstCol: String,
      mapping: DataFrame,
      fromCol: String = "alias_url", toCol: String = "canonical_url",
      dropSelf: Boolean = true, dedupe: Boolean = true): DataFrame = {
    val a = applyCanonical(
      applyCanonical(edges, srcCol, mapping, fromCol, toCol),
      dstCol, mapping, fromCol, toCol)
    val b = if (dropSelf) a.filter(col(srcCol) =!= col(dstCol)) else a
    if (dedupe) b.distinct() else b
  }

  /** The HOST graph of a resolved link frame — what [[LinkGraph
    * .pageRank]] ranks for frontier prioritization: one `src`/`dst`
    * edge per distinct (linking host, target host) pair, intra-host
    * edges dropped by default (navigation chrome would otherwise give
    * every big site a self-vote). `byDomain` aggregates at eTLD+1
    * instead of the full host. Plan shape: two narrow host
    * extractions + one distinct — a single hash aggregation on the
    * edge pair. */
  def hostGraph(
      links: DataFrame, pageUriCol: String, linkCol: String,
      byDomain: Boolean = false, dropSelf: Boolean = true): DataFrame = {
    def key(c: Column): Column = {
      val h = TextAnalysis.urlHost(c)
      if (byDomain) TextAnalysis.registeredDomain(h) else h
    }
    val edges = links
      .select(key(col(pageUriCol)).as("src"), key(col(linkCol)).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    (if (dropSelf) edges.filter(col("src") =!= col("dst")) else edges)
      .distinct()
  }

  /** `<urlset>` sitemap shape: repeated `<url>` children. Values stay
    * strings except priority (the protocol's only numeric). */
  private val UrlsetSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("url",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("loc",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("lastmod",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("changefreq",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("priority",
            org.apache.spark.sql.types.DoubleType))))) ))

  /** `<sitemapindex>` shape: repeated `<sitemap>` children. */
  private val IndexSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("sitemap",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("loc",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("lastmod",
            org.apache.spark.sql.types.StringType))))) ))

  /** Sitemap entries — the OTHER frontier feed (sitemaps.org protocol):
    * one output row per `<url>` of a `<urlset>` (columns `loc`,
    * `lastmod`, `changefreq`, `priority`, `is_index=false`) or per
    * `<sitemap>` of a `<sitemapindex>` (`is_index=true` — the loc is
    * another sitemap to fetch, not a page). Parsing is Spark's native
    * `from_xml` (codegen'd, per-row, no shuffle); a payload matching
    * neither shape emits nothing — malformed sitemaps degrade to
    * silence, not errors, exactly like a crawler treats them. Feed the
    * `is_index=false` locs to [[crawlFrontier]] alongside anchor
    * outlinks. */
  def sitemapEntries(df: DataFrame, xml: String): DataFrame = {
    val u = from_xml(col(xml), UrlsetSchema)
    val i = from_xml(col(xml), IndexSchema)
    val urls = df
      .withColumn("_e", explode(u.getField("url")))
      .select(col("_e.loc").as("loc"), col("_e.lastmod").as("lastmod"),
        col("_e.changefreq").as("changefreq"),
        col("_e.priority").as("priority"), lit(false).as("is_index"))
      .filter(col("loc").isNotNull)
    val maps = df
      .withColumn("_e", explode(i.getField("sitemap")))
      .select(col("_e.loc").as("loc"), col("_e.lastmod").as("lastmod"),
        lit(null).cast("string").as("changefreq"),
        lit(null).cast("double").as("priority"), lit(true).as("is_index"))
      .filter(col("loc").isNotNull)
    urls.unionByName(maps)
  }

  /** The SITEMAP fetch worklist — the discovery loop's middle tier
    * (robots.txt → sitemaps → sitemap indexes → urlsets → frontier):
    * sitemap URLs a crawler has DISCOVERED but not yet fetched, from
    * two feeds — the robots `Sitemap:` directives ([[Robots
    * .sitemapUrls]], pass the exploded frame) and `<sitemapindex>`
    * children already parsed from fetched sitemaps
    * ([[sitemapEntries]]'s `is_index = true` rows; its urlset rows are
    * pages, not sitemaps, and are ignored here). Non-absolute and
    * non-http(s) locs drop (the protocol requires absolute URLs). One
    * distinct + one anti-join, both hashing on the sitemap URL.
    *
    * @return one `sitemap_url` per undiscovered sitemap */
  def sitemapFetchList(
      discovered: DataFrame, urlCol: String,
      entries: DataFrame,
      fetched: DataFrame, fetchedCol: String): DataFrame =
    discovered.select(col(urlCol).cast("string").as("sitemap_url"))
      .union(entries.filter(col("is_index"))
        .select(col("loc").cast("string").as("sitemap_url")))
      .filter(col("sitemap_url").isNotNull
        && col("sitemap_url").rlike("(?i)^https?://"))
      .distinct()
      .join(fetched
        .select(col(fetchedCol).cast("string").as("sitemap_url"))
        .distinct(),
        Seq("sitemap_url"), "left_anti")

  /** Link-graph ranks UNIONED with sitemap-declared priorities into
    * the ONE `priorities` frame [[fetchPlan]] takes — the composition
    * that lets a sitemap bootstrap URLs the crawl has never linked
    * without ever overriding the crawl's own evidence.
    *
    * Combination rule (pinned by q_t79 + FetchPlanSpec):
    *  - a URL WITH a link-graph rank keeps it unchanged — the
    *    observed graph outranks the site's self-assessment, so a
    *    sitemap priority on an already-ranked URL is ignored;
    *  - a sitemap URL the graph never ranked BOOTSTRAPS at
    *    `coalesce(priority, 0.5) × max(rank)`: the sitemaps.org
    *    default 0.5 lands mid-scale, a priority-1.0 never-linked URL
    *    ties the best-ranked known page (URL tiebreak — so it
    *    schedules ahead of every lower-ranked linked URL, which is
    *    the point of trusting a sitemap at all), and declared
    *    priorities order the bootstrap tier among themselves;
    *  - an empty rank frame scales by 1.0 — sitemap priorities then
    *    stand alone (the cold-start crawl);
    *  - duplicate rank rows per URL reduce to MAX, duplicate sitemap
    *    locs (the same URL in several sitemaps) to their MAX declared
    *    priority (an all-null dup set still defaults to 0.5).
    * Feed [[sitemapEntries]]' `is_index = false` rows — index rows
    * are sitemaps to fetch, not pages to score.
    *
    * Scale shape: two hash aggregations + one anti-join, all on the
    * URL; the rank maximum rides in-plan as a broadcast one-row frame
    * (no driver action).
    *
    * @return `node`, `rank` — [[fetchPlan]]'s default priority shape */
  def sitemapBoostedPriorities(
      ranks: DataFrame, entries: DataFrame,
      nodeCol: String = "node", rankCol: String = "rank",
      locCol: String = "loc", priCol: String = "priority"): DataFrame = {
    val r = ranks
      .select(col(nodeCol).cast("string").as("node"),
        col(rankCol).cast("double").as("rank"))
      .groupBy("node").agg(max(col("rank")).as("rank"))
    val scale = r.agg(coalesce(max(col("rank")), lit(1.0)).as("__scale"))
    val boot = entries
      .select(col(locCol).cast("string").as("node"),
        col(priCol).cast("double").as("__sp"))
      .filter(col("node").isNotNull)
      .groupBy("node").agg(max(col("__sp")).as("__sp"))
      .join(r.select("node"), Seq("node"), "left_anti")
      .crossJoin(broadcast(scale))
      .select(col("node"),
        (coalesce(col("__sp"), lit(0.5)) * col("__scale")).as("rank"))
    r.unionByName(boot)
  }

  /** Next fetch frontier from extracted outlinks: canonicalize
    * ([[TextAnalysis.canonicalUrl]]), keep http(s), drop everything the
    * crawl has already seen (left-anti join on the canonical form), and
    * emit one row per NEW canonical URL with its host and registered
    * domain — the politeness/partitioning keys a scheduler shards by.
    * Plan shape: one hash aggregate (distinct) + one anti-join, both on
    * the canonical URL; the seen side streams — at 100 TB the seen set
    * is a table, not a broadcast. */
  def crawlFrontier(
      links: DataFrame, linkCol: String,
      seen: DataFrame, seenCol: String): DataFrame =
    politenessKeys(
      canonicalLinks(links, linkCol).distinct()
        .join(canonicalSeen(seen, seenCol), Seq("frontier_url"),
          "left_anti"))

  /** Fetchable canonical forms of a link column, as `frontier_url`. */
  private[graft] def canonicalLinks(
      links: DataFrame, linkCol: String): DataFrame =
    links
      .select(TextAnalysis.canonicalUrl(col(linkCol)).as("frontier_url"))
      .filter(col("frontier_url").isNotNull
        && col("frontier_url").rlike("^https?://"))

  private[graft] def canonicalSeen(
      seen: DataFrame, seenCol: String): DataFrame =
    seen.select(TextAnalysis.canonicalUrl(col(seenCol))
      .as("frontier_url"))
      .filter(col("frontier_url").isNotNull)

  /** Host + eTLD+1 — the scheduler's politeness/sharding keys. */
  private[graft] def politenessKeys(df: DataFrame): DataFrame =
    df.select(col("frontier_url"),
      TextAnalysis.urlHost(col("frontier_url")).as("url_host"))
      .withColumn("registered_domain",
        TextAnalysis.registeredDomain(col("url_host")))

  /** URL path TEMPLATE — the crawl-trap detection key: the URL's
    * path + query with the unbounded-cardinality runs collapsed, so a
    * calendar grid (`/cal/2026/08/16`), a session-id permutation
    * (`/p?sid=9f86d081a1b2c3d4`), or a faceted-search explosion all
    * land on ONE template per pattern while structurally distinct
    * pages keep distinct templates. Collapsing rules (deterministic,
    * mirrored by the q_t66 oracle):
    *   - hex runs of 8+ chars → `*` (session ids, digests — an 8+
    *     digit run is all hex, so long numeric ids collapse here too);
    *   - remaining digit runs → `#` (dates, page numbers, short ids);
    *   - query VALUES → `*` (each `k=v` becomes `k=*`; keys are the
    *     structure, values are the explosion);
    *   - an empty path is `/`; the fragment never participates
    *     (frontier URLs carry none).
    * Pure codegen'd regexp work, narrow per-row. */
  def urlTemplate(url: Column): Column = {
    val path0 = regexp_extract(url, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val path = when(length(path0) === 0, lit("/")).otherwise(path0)
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val tpl = regexp_replace(
      regexp_replace(path, "[0-9a-fA-F]{8,}", "*"), "[0-9]+", "#")
    concat(tpl,
      when(length(query) > 0,
        concat(lit("?"), regexp_replace(query, "=[^&]*", "=*")))
        .otherwise(lit("")))
  }

  /** Per-(host, template) frontier cardinality — the crawl-trap
    * SIGNAL: one row per (url_host, [[urlTemplate]]) pair with its
    * URL count and an `is_trap` flag at `trapThreshold`. A host whose
    * single template holds a million URLs is exploding a pattern, not
    * publishing a million pages; feed the flags to monitoring, or let
    * [[containTraps]] act on them directly. One hash aggregation on
    * the (host, template) pair — high-cardinality, skew-safe. */
  def templateStats(
      frontier: DataFrame, urlCol: String,
      trapThreshold: Int = 1000): DataFrame = {
    require(trapThreshold >= 1,
      s"trapThreshold must be >= 1: $trapThreshold")
    frontier
      .select(TextAnalysis.urlHost(col(urlCol)).as("url_host"),
        urlTemplate(col(urlCol)).as("url_template"))
      .groupBy("url_host", "url_template")
      .agg(count(lit(1)).as("n_urls"))
      .withColumn("is_trap", col("n_urls") > trapThreshold)
  }

  /** Crawl-trap CONTAINMENT — the frontier filter in front of
    * [[fetchPlan]]: templates holding more than `maxPerTemplate` URLs
    * on one host are capped to their lexicographically first
    * `maxPerTemplate` (deterministic — a re-derived frontier keeps
    * the same survivors), while every template at-or-under the cap
    * passes whole. `maxPerHost` alone cannot do this: a calendar trap
    * fills the per-host budget with near-identical URLs BEFORE the
    * host cap bites, starving the host's legitimate pages; capping
    * per (host, template) spends the budget across patterns.
    *
    * Input rows are assumed distinct URLs ([[crawlFrontier]]'s
    * contract — duplicates would make the lexicographic tiebreak
    * partition-dependent). Scale shape: one hash aggregation for the
    * per-(host, template) counts, one join back (the counts side is
    * one row per distinct template — AQE broadcasts it when small),
    * and the cap runs [[Skew.topKPerGroup]] — salted two-level rank,
    * so no task ever sorts a whole exploding template.
    *
    * @return the input columns plus `url_template` */
  def containTraps(
      frontier: DataFrame, urlCol: String, maxPerTemplate: Int,
      salts: Int = 64): DataFrame = {
    require(maxPerTemplate >= 1,
      s"maxPerTemplate must be >= 1: $maxPerTemplate")
    val inCols = frontier.columns.toSeq
    val t = frontier
      .withColumn("url_template", urlTemplate(col(urlCol)))
      .withColumn("__th", TextAnalysis.urlHost(col(urlCol)))
    val counts = t.groupBy("__th", "url_template")
      .agg(count(lit(1)).as("__n"))
    val joined = t.join(counts, Seq("__th", "url_template"))
    val pass = joined.filter(col("__n") <= maxPerTemplate).drop("__n")
    val capped = Skew.topKPerGroup(
      joined.filter(col("__n") > maxPerTemplate).drop("__n"),
      Seq("__th", "url_template"), Seq(col(urlCol)), maxPerTemplate,
      col(urlCol), salts)
      .drop("rank")
    pass.unionByName(capped)
      .select((inCols.map(col) :+ col("url_template")): _*)
  }

  /** Politeness-aware FETCH PLAN — the operator a crawler actually
    * consumes: frontier URLs × per-host robots policies → the allowed
    * URLs, each with its host's effective crawl delay, a per-host
    * fetch sequence number, and the earliest offset (seconds into the
    * host's fetch window) at which fetching it honors that delay:
    * `fetch_offset = (fetch_seq - 1) * crawl_delay`.
    *
    * Semantics:
    *   - a URL whose host has NO stored policy passes (default-allow,
    *     same as [[Robots.gateByPolicy]]) at `defaultDelay`;
    *   - a URL whose policy disallows its path (merged-group
    *     longest-match, [[Robots.decide]]) is dropped;
    *   - the effective delay is `max(policy crawl-delay,
    *     defaultDelay)` — the default is a floor, not a fallback: a
    *     host asking for LESS politeness than the crawler's own
    *     minimum still gets the minimum;
    *   - `fetch_seq` is the 1-based rank of the URL among its host's
    *     allowed URLs — ordered lexicographically by default, or by
    *     `(priority desc, url)` when a priority frame is given —
    *     deterministic either way, so a re-derived plan is
    *     byte-identical;
    *   - with a `priorities` frame (e.g. [[LinkGraph.pageRank]] over
    *     the URL graph), each frontier URL left-joins its score
    *     (missing URLs score 0.0 — fetched after every scored URL)
    *     and the per-host sequence fetches the HIGHEST-value pages
    *     first: the order a budget-bound crawler wants, and what makes
    *     `maxPerHost` keep the top-priority URLs instead of the
    *     alphabetically early ones. The output then carries the joined
    *     `priority` column; URL stays the tiebreak, so the
    *     no-priorities plan is the priorities-of-all-zero plan.
    *     Duplicate URL rows in the frame reduce to their MAX score
    *     before the join (a dup must not duplicate a frontier row);
    *   - with `fetchedAtCol`/`maxAgeSeconds` ([[Robots.gateByPolicy]]
    *     semantics), a policy row older than `maxAgeSeconds` at `asOf`
    *     — or with a NULL timestamp, which cannot demonstrate
    *     freshness — is treated as ABSENT: RFC 9309 §2.4 caps robots
    *     caching at ~24 h, so a stale policy must not keep gating;
    *     feed the same arguments to [[Robots.robotsFetchList]] to
    *     surface those hosts for refetch.
    *
    * Scale shape: the crawl-delay is per (host, agent), so it is
    * parsed ONCE per host on the policy side (one narrow projection
    * over the small build side) — only the per-path allow/deny runs
    * per URL row. The join hashes on the host (the canonical skew
    * key — broadcast the policy table when it fits; AQE skew-split
    * covers the shuffle case); the priority join hashes on the URL
    * itself (maximally high-cardinality); and the per-host sequence
    * comes from [[Skew.rankWithinKey]] — no task ever sorts a whole
    * host's URLs, no matter how hot the host.
    *
    * @param frontier frame with a URL column ([[crawlFrontier]]'s
    *                 output or any URL list)
    * @param maxPerHost cap a host's plan at this many URLs per cycle
    *                 (0 = unlimited): a million-page host would
    *                 otherwise occupy a polite fetcher for 11 days at
    *                 1 req/s. The cap keeps the FIRST `maxPerHost` in
    *                 sequence order (deterministic — the rank is
    *                 already computed, the cap is a filter on it);
    *                 capped URLs are NOT seen/fetched, so the caller's
    *                 crawl loop re-derives them next cycle — and the
    *                 streaming sink ([[graft.streaming.Streams
    *                 .crawlFetchPlanSink]]), whose frontier emits each
    *                 URL only once, carries them over explicitly via
    *                 its sibling `-deferred/` directories.
    * @param priorities optional per-URL score frame (`priorityUrlCol`,
    *                 `priorityCol`); higher fetches earlier
    * @param fetchedAtCol optional timestamp column on `policies`
    *                 recording when each robots.txt was fetched
    * @param maxAgeSeconds policy freshness horizon (RFC 9309 §2.4's
    *                 24 h default); only consulted with `fetchedAtCol`
    * @param asOf     the "now" freshness is judged against (a literal
    *                 for reproducible plans; None = current_timestamp)
    * @return frontier columns (url_host re-derived) plus `crawl_delay`,
    *         [`priority` when a priority frame is given,] `fetch_seq`,
    *         `fetch_offset` */
  /** Per-host fetch LIMIT as a column (`__limit`): each host's budget
    * from `hostBudgets` when listed, else the uniform `maxPerHost`
    * fallback (0 = unlimited). Shared by [[fetchPlan]]'s cap filter
    * and [[graft.streaming.Streams.crawlFetchPlanSink]]'s
    * kept/deferred split so the two can never disagree. Defensive min
    * on duplicate budget rows — a dup must not fan the join out. */
  private[graft] def withFetchLimit(
      df: DataFrame, maxPerHost: Int,
      hostBudgets: Option[DataFrame], budgetHostCol: String,
      budgetCol: String): DataFrame = {
    val fallback = if (maxPerHost > 0) lit(maxPerHost.toLong)
      else lit(Long.MaxValue)
    hostBudgets match {
      case None => df.withColumn("__limit", fallback)
      case Some(hb) =>
        val b = hb.select(
            lower(trim(col(budgetHostCol))).as("url_host"),
            col(budgetCol).cast("long").as("__budget"))
          .groupBy("url_host").agg(min(col("__budget")).as("__budget"))
        df.join(b, Seq("url_host"), "left")
          .withColumn("__limit", coalesce(col("__budget"), fallback))
          .drop("__budget")
    }
  }

  def fetchPlan(
      frontier: DataFrame, urlCol: String,
      policies: DataFrame, hostCol: String, robotsCol: String,
      agent: String, defaultDelay: Double = 1.0,
      numPartitions: Int = 0, maxPerHost: Int = 0,
      priorities: Option[DataFrame] = None,
      priorityUrlCol: String = "node", priorityCol: String = "rank",
      fetchedAtCol: Option[String] = None,
      maxAgeSeconds: Long = 86400L,
      asOf: Option[Column] = None,
      /** optional per-HOST budget frame (`budgetHostCol`,
        * `budgetCol`): a rank-aware scheduler gives its high-value
        * hosts more slots per cycle than its long tail. A listed
        * host keeps its top `budget` URLs (`<= 0` excludes the host
        * this cycle); unlisted hosts fall back to `maxPerHost`. */
      hostBudgets: Option[DataFrame] = None,
      budgetHostCol: String = "url_host",
      budgetCol: String = "budget"): DataFrame = {
    require(defaultDelay > 0, s"defaultDelay must be > 0: $defaultDelay")
    require(maxPerHost >= 0, s"maxPerHost must be >= 0: $maxPerHost")
    val pol = Robots.freshOnly(policies, fetchedAtCol, maxAgeSeconds,
        asOf)
      .select(
        lower(trim(col(hostCol))).as("url_host"),
        col(robotsCol).as("__robots"),
        // delay is path-independent — parse once per host, build-side
        Robots.robotsVerdict(col(robotsCol), lit(agent), lit("/"))
          .getField("crawl_delay").as("__host_delay"))
    val path = coalesce(
      nullif(regexp_extract(col(urlCol),
        "^[^:/?#]+://[^/?#]*([/?][^#]*)?", 1), lit("")),
      lit("/"))
    val inCols = frontier.columns.toSeq.filterNot(_ == "url_host")
    val gated = frontier
      .withColumn("url_host", TextAnalysis.urlHost(col(urlCol)))
      .join(pol, Seq("url_host"), "left")
      .filter(col("__robots").isNull
        || Robots.robotsAllows(col("__robots"), lit(agent), path))
      .withColumn("crawl_delay", greatest(
        coalesce(col("__host_delay"), lit(defaultDelay)),
        lit(defaultDelay)))
      .drop("__robots", "__host_delay")
    val (scored, orderCols, outExtra) = priorities match {
      case Some(p) =>
        // defensive max on duplicate URL rows — the same reason
        // withFetchLimit min-aggregates budgets: a dup key must not fan
        // the frontier join out (a duplicated frontier row would break
        // rankWithinKey's total-order contract and make fetch_seq
        // partition-dependent). Max, not min: of two scores for one
        // URL, the stronger claim schedules it.
        val pri = p.select(col(priorityUrlCol).cast("string").as(urlCol),
            col(priorityCol).cast("double").as("priority"))
          .groupBy(urlCol).agg(max(col("priority")).as("priority"))
        // negated score as the rank key: rankWithinKey orders
        // ascending, and (-priority, url) ascending IS
        // (priority desc, url asc)
        (gated.join(pri, Seq(urlCol), "left")
          .withColumn("priority", coalesce(col("priority"), lit(0.0)))
          .withColumn("__prio_ord", -col("priority")),
          Seq("__prio_ord", urlCol), Seq(col("priority")))
      case None => (gated, Seq(urlCol), Nil)
    }
    scored
      .transform(Skew.rankWithinKey(_, Seq("url_host"), orderCols,
        "fetch_seq", numPartitions))
      .transform(df =>
        if (maxPerHost > 0 || hostBudgets.isDefined)
          withFetchLimit(df, maxPerHost, hostBudgets, budgetHostCol,
            budgetCol)
            .filter(col("fetch_seq") <= col("__limit"))
            .drop("__limit")
        else df)
      .withColumn("fetch_offset",
        (col("fetch_seq") - 1).cast("double") * col("crawl_delay"))
      .select((inCols.map(col) ++ Seq(col("url_host"),
        col("crawl_delay")) ++ outExtra ++
        Seq(col("fetch_seq"), col("fetch_offset"))): _*)
  }
}
