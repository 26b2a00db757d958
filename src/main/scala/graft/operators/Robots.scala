package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** RFC 9309 robots.txt evaluation — the fetch-policy half of crawl
  * curation: given an archived `robots.txt` payload, an agent product
  * token, and a request path, decide whether the crawl may fetch the
  * path (and what crawl delay the group asks for). A training-data
  * pipeline reaches for this when re-filtering an archive against
  * CURRENT policy, or when auditing what fraction of a corpus came
  * from now-disallowed paths.
  *
  * Semantics (RFC 9309 + the de-facto extensions every large crawler
  * honors):
  *   - groups start at `User-agent:` lines; consecutive agent lines
  *     share one group; a rule line closes the agent run
  *   - the evaluated group set is the one matching the agent token
  *     case-insensitively, else the `*` groups; matching groups MERGE
  *     (RFC 9309 §2.2.1)
  *   - `Allow`/`Disallow` values are path patterns with `*` wildcards
  *     and a `$` end anchor; empty `Disallow:` permits everything
  *   - precedence is LONGEST PATTERN wins; on a tie `Allow` wins
  *     (§2.2.2); no matching rule → allowed
  *   - `Crawl-delay` is taken from the same merged group (first value
  *     that parses)
  *   - comments (`#…`) strip anywhere; keys are case-insensitive;
  *     unknown keys are ignored inside a group per the RFC
  *
  * The evaluator is a deliberate scalar UDF: a grouped, stateful parse
  * with longest-match precedence has no public Column formulation (the
  * same rationale as the Bloom `mightContain` wrappers); the kernel is
  * allocation-light, one pass over the lines plus one pass over the
  * merged rules, no regex compilation (`*`/`$` match via a hand
  * two-pointer walk). At 100 TB the call sits in a narrow projection —
  * per-row CPU, no shuffle, no state. */
object Robots {

  /** One parsed rule: allow?, raw pattern. */
  private[graft] final case class Rule(allow: Boolean, pattern: String)

  /** Merged view of the groups that apply to an agent. */
  private[graft] final case class Applicable(
      rules: List[Rule], crawlDelay: Option[Double])

  /** Percent-encoding normalization applied to BOTH rule patterns and
    * request paths before matching — RFC 9309 §2.2.2 matching operates
    * on percent-encoding-normalized octets, so `Disallow: /a%20b` must
    * match the path `/a b` and vice versa. Chosen normalization
    * (documented because the RFC leaves latitude):
    *   - a valid `%XX` escape whose octet is UNRESERVED per RFC 3986
    *     (`A-Z a-z 0-9 - . _ ~`) or a space decodes to the raw char;
    *   - every other valid escape is preserved, canonicalized to
    *     uppercase hex. That keeps `%2F` distinct from the real path
    *     separator `/`, and never injects the `*`/`$` metacharacters
    *     (`%2A`/`%24`) or a new `%` (`%25`) into a pattern;
    *   - an invalid escape (`%` not followed by two hex digits) passes
    *     through verbatim, matching literally;
    *   - raw chars are untouched, so a raw space normalizes to itself
    *     and matches a decoded `%20`. Raw non-ASCII text and its
    *     UTF-8 escape sequence intentionally stay distinct (the same
    *     choice Google's open-source matcher makes). */
  private[graft] def normalizePct(s: String): String = {
    var i = 0
    var changed = false
    val n = s.length
    // fast path: scan for '%' first — most patterns/paths have none
    while (i < n && s.charAt(i) != '%') i += 1
    if (i == n) return s
    val sb = new java.lang.StringBuilder(n)
    sb.append(s, 0, i)
    def hex(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n
          && hex(s.charAt(i + 1)) >= 0 && hex(s.charAt(i + 2)) >= 0) {
        val b = (hex(s.charAt(i + 1)) << 4) | hex(s.charAt(i + 2))
        val ch = b.toChar
        val unreserved = (ch >= 'A' && ch <= 'Z') ||
          (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9') ||
          ch == '-' || ch == '.' || ch == '_' || ch == '~' || ch == ' '
        if (unreserved) { sb.append(ch); changed = true }
        else {
          sb.append('%')
          val u1 = Character.toUpperCase(s.charAt(i + 1))
          val u2 = Character.toUpperCase(s.charAt(i + 2))
          if (u1 != s.charAt(i + 1) || u2 != s.charAt(i + 2))
            changed = true
          sb.append(u1).append(u2)
        }
        i += 3
      } else { sb.append(c); i += 1 }
    }
    if (changed) sb.toString else s
  }

  /** Wildcard path match: `*` spans any run, `$` (only meaningful at
    * pattern end) anchors to path end. Iterative two-pointer walk with
    * single-star backtracking — no regex, no allocation. */
  private[graft] def pathMatches(pattern: String, path: String)
      : Boolean = {
    if (pattern.isEmpty) return true
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1)
      else pattern
    var p = 0; var s = 0
    var starP = -1; var starS = -1
    while (s < path.length) {
      if (p < pat.length && (pat.charAt(p) == path.charAt(s))) {
        p += 1; s += 1
      } else if (p < pat.length && pat.charAt(p) == '*') {
        starP = p; starS = s; p += 1
      } else if (starP >= 0) {
        starS += 1; s = starS; p = starP + 1
      } else return false
      if (p == pat.length && !anchored) return true // prefix matched
    }
    while (p < pat.length && pat.charAt(p) == '*') p += 1
    p == pat.length // consumed the whole pattern at path end
  }

  /** Per-executor memo of parsed policies: a host's robots.txt is one
    * row build-side but gates MILLIONS of page rows, and re-running the
    * full line parse per page is pure wasted CPU (narrow, no shuffle —
    * a constant factor, not a scale hazard, but a large one). Keyed by
    * the (robots text, agent) pair itself so a hash collision can never
    * swap policies; access-ordered LRU capped at 128 entries (robots
    * files are small — crawlers cap fetches around 512 KB — so the
    * worst-case footprint is tens of MB, typical is KBs). */
  private val ParseCacheMax = 128
  private val parseCache =
    new java.util.LinkedHashMap[(String, String), Applicable](
        ParseCacheMax, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), Applicable])
          : Boolean = size() > ParseCacheMax
    }

  /** Parse + select the merged applicable group for `agent`, memoized
    * per executor (see [[parseCache]]; differential-tested against
    * [[applicableUncached]] in RobotsSpec). */
  private[graft] def applicable(robots: String, agent: String)
      : Applicable = {
    if (robots == null) return Applicable(Nil, None)
    val key = (robots, if (agent == null) "*" else agent)
    parseCache.synchronized {
      val hit = parseCache.get(key)
      if (hit != null) return hit
    }
    val parsed = applicableUncached(robots, agent)
    parseCache.synchronized { parseCache.put(key, parsed) }
    parsed
  }

  /** The raw (unmemoized) parse — rule patterns come out
    * percent-normalized via [[normalizePct]] so [[decide]] matches in
    * normalized space on both sides. */
  private[graft] def applicableUncached(robots: String, agent: String)
      : Applicable = {
    if (robots == null) return Applicable(Nil, None)
    val agentLc = if (agent == null) "*" else agent.trim.toLowerCase
    // one pass: collect (groupAgents, rules, delay) triples
    final case class Group(
        agents: scala.collection.mutable.ArrayBuffer[String],
        rules: scala.collection.mutable.ArrayBuffer[Rule],
        var delay: Option[Double])
    val groups = scala.collection.mutable.ArrayBuffer[Group]()
    var cur: Group = null
    var agentRun = false // true while consecutive User-agent lines
    robots.linesIterator.foreach { raw =>
      val noComment = {
        val i = raw.indexOf('#')
        if (i >= 0) raw.substring(0, i) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!agentRun || cur == null) {
              cur = Group(scala.collection.mutable.ArrayBuffer(),
                scala.collection.mutable.ArrayBuffer(), None)
              groups += cur
            }
            cur.agents += value.toLowerCase
            agentRun = true
          case "allow" | "disallow" =>
            agentRun = false
            if (cur != null && value.nonEmpty)
              cur.rules += Rule(key == "allow", normalizePct(value))
            // empty Disallow: permits everything — representable as no
            // rule at all (nothing to match keeps the allowed default)
          case "crawl-delay" =>
            agentRun = false
            if (cur != null && cur.delay.isEmpty)
              cur.delay = value.toDoubleOption
          case _ => agentRun = false // unknown key: ignored, closes run
        }
      }
    }
    def merged(p: Group => Boolean): Option[Applicable] = {
      val g = groups.filter(p)
      if (g.isEmpty) None
      else Some(Applicable(g.flatMap(_.rules).toList,
        g.flatMap(_.delay).headOption))
    }
    merged(_.agents.contains(agentLc))
      .orElse(merged(_.agents.contains("*")))
      .getOrElse(Applicable(Nil, None))
  }

  /** Pure decision kernel: (allowed, crawlDelay). */
  private[graft] def decide(robots: String, agent: String,
      path: String): (Boolean, Option[Double]) = {
    val app = applicable(robots, agent)
    val p = normalizePct(
      if (path == null || path.isEmpty) "/" else path)
    var bestLen = -1
    var bestAllow = true // no matching rule → allowed
    app.rules.foreach { r =>
      if (pathMatches(r.pattern, p)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len; bestAllow = r.allow
        }
      }
    }
    (bestAllow, app.crawlDelay)
  }

  private val verdictUdf = udf(
    (robots: String, agent: String, path: String) => {
      val (allowed, delay) = decide(robots, agent, path)
      (allowed, delay.map(java.lang.Double.valueOf).orNull)
    })

  /** Column form: struct<allowed boolean, crawl_delay double> for one
    * (robots.txt text, agent token, path) triple per row. */
  /** `Sitemap:` directives of a robots.txt column (RFC 9309 §2.2.4
    * treats them as an extension line; sitemaps.org pins the
    * semantics) — an `array<string>` of the declared absolute sitemap
    * URLs, in file order. Group-independent per both specs: a Sitemap
    * line applies regardless of which user-agent group surrounds it,
    * so this is a flat line scan, codegen'd, no parse state. Feed the
    * results to [[Outlinks.sitemapEntries]] after fetching — the
    * robots file is where a crawler DISCOVERS the sitemaps. */
  def sitemapUrls(robots: Column): Column =
    org.apache.spark.sql.functions.filter(
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.regexp_extract_all(robots,
          org.apache.spark.sql.functions.lit(
            "(?im)^[ \\t]*sitemap[ \\t]*:[ \\t]*(\\S+)"),
          org.apache.spark.sql.functions.lit(1)),
        u => org.apache.spark.sql.functions.trim(u)),
      // RFC 3986 §3.1: scheme comparison is case-insensitive — an
      // uppercase HTTPS:// sitemap is valid (downstream fetch layers
      // normalize the case)
      u => u.rlike("(?i)^https?://"))

  /** Drop policy rows whose `fetchedAtCol` timestamp is older than
    * `maxAgeSeconds` at `asOf` — the RFC 9309 §2.4 freshness gate
    * shared by [[gateByPolicy]], [[Outlinks.fetchPlan]], and
    * [[robotsFetchList]]: the RFC allows caching a robots.txt for at
    * most ~24 h, so a STALE stored policy must behave exactly like an
    * absent one (default-allow downstream, host surfaced for refetch).
    * `fetchedAtCol = None` (the historical signature) keeps every row:
    * the policy table is then treated as eternally fresh. A NULL
    * `fetchedAtCol` value also counts as stale/absent — a policy row
    * with no fetch timestamp cannot demonstrate freshness, so its host
    * default-allows downstream and [[robotsFetchList]] surfaces it for
    * refetch (the conservative-for-politeness direction: refetch the
    * policy rather than trust an unstamped one forever). `asOf`
    * defaults to `current_timestamp()`; pass a literal for
    * reproducible plans (the same reason WARC writers pin dates).
    * Narrow build-side filter — no plan-shape change. */
  private[graft] def freshOnly(
      policies: org.apache.spark.sql.DataFrame,
      fetchedAtCol: Option[String], maxAgeSeconds: Long,
      asOf: Option[Column]): org.apache.spark.sql.DataFrame = {
    require(maxAgeSeconds > 0, s"maxAgeSeconds must be > 0: $maxAgeSeconds")
    fetchedAtCol match {
      case None => policies
      case Some(c) =>
        import org.apache.spark.sql.functions.{
          col, current_timestamp, lit}
        val now = asOf.getOrElse(current_timestamp())
        policies.filter(col(c).isNotNull &&
          col(c).cast("timestamp").cast("long") >=
            now.cast("timestamp").cast("long") - lit(maxAgeSeconds))
    }
  }

  /** The robots FETCH WORKLIST: frontier hosts with NO FRESH stored
    * policy, as one `/robots.txt` fetch URL per host — what the
    * crawler must fetch BEFORE it may politely fetch those hosts'
    * pages ([[gateByPolicy]]/[[Outlinks.fetchPlan]] default-allow
    * unknown hosts, but a compliant crawler resolves the unknown
    * first). With `fetchedAtCol`, a policy older than `maxAgeSeconds`
    * at `asOf` counts as absent ([[freshOnly]]) — so a site that
    * tightened its robots.txt gets refetched instead of being crawled
    * forever under the old rules. One distinct + one anti-join, both
    * hashing on the host. */
  def robotsFetchList(
      frontier: org.apache.spark.sql.DataFrame, urlCol: String,
      policies: org.apache.spark.sql.DataFrame, hostCol: String,
      fetchedAtCol: Option[String] = None,
      maxAgeSeconds: Long = 86400L,
      asOf: Option[Column] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, lit, lower, trim}
    frontier
      .select(TextAnalysis.urlHost(col(urlCol)).as("url_host"))
      .filter(col("url_host").isNotNull)
      .distinct()
      .join(freshOnly(policies, fetchedAtCol, maxAgeSeconds, asOf)
        .select(lower(trim(col(hostCol))).as("url_host"))
        .distinct(),
        Seq("url_host"), "left_anti")
      .select(col("url_host"),
        concat(lit("https://"), col("url_host"), lit("/robots.txt"))
          .as("robots_url"))
  }

  def robotsVerdict(robots: Column, agent: Column, path: Column): Column =
    verdictUdf(robots, agent, path).cast(
      "struct<allowed: boolean, crawl_delay: double>")

  /** Convenience boolean: may `agent` fetch `path` under `robots`? */
  def robotsAllows(robots: Column, agent: Column, path: Column): Column =
    robotsVerdict(robots, agent, path).getField("allowed")

  /** Gate a page frame by per-HOST policy — the shape a real pipeline
    * runs: robots.txt lives once per host, pages join to it on the
    * lowercased host of their URL, and each page's path+query is
    * evaluated under its host's policy. Pages whose host has NO stored
    * policy pass (the web's default-allow); pages with one pass iff
    * the merged applicable group allows their path. With
    * `fetchedAtCol`, a policy older than `maxAgeSeconds` at `asOf` —
    * or carrying a NULL timestamp, which cannot demonstrate
    * freshness — is treated as absent ([[freshOnly]] — RFC 9309
    * §2.4): its pages default-allow, and [[robotsFetchList]] with the
    * same arguments surfaces the host for refetch. Returns the
    * surviving rows unchanged.
    *
    * Plan shape: one equi-join hashing on the host. Host popularity is
    * the canonical skew key (one giant host can dominate a crawl), but
    * the BUILD side is one small row per distinct host — broadcast it
    * when the policy table fits, and AQE's skew split covers the
    * shuffle case; the verdict itself is a narrow projection after the
    * join. */
  def gateByPolicy(
      pages: org.apache.spark.sql.DataFrame, uriCol: String,
      policies: org.apache.spark.sql.DataFrame, hostCol: String,
      robotsCol: String, agent: String,
      fetchedAtCol: Option[String] = None,
      maxAgeSeconds: Long = 86400L,
      asOf: Option[Column] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{
      coalesce, col, lit, lower, regexp_extract}
    val keyed = freshOnly(policies, fetchedAtCol, maxAgeSeconds, asOf)
      .select(
      lower(org.apache.spark.sql.functions.trim(col(hostCol)))
        .as("_gate_host"),
      col(robotsCol).as("_gate_robots"))
    val withHost = pages.withColumn("_gate_host",
      TextAnalysis.urlHost(col(uriCol)))
    val path = coalesce(
      org.apache.spark.sql.functions.nullif(
        regexp_extract(col(uriCol),
          "^[^:/?#]+://[^/?#]*([/?][^#]*)?", 1), lit("")),
      lit("/"))
    withHost.join(keyed, Seq("_gate_host"), "left")
      .filter(col("_gate_robots").isNull // no stored policy: default-allow
        || robotsAllows(col("_gate_robots"), lit(agent), path))
      .drop("_gate_host", "_gate_robots")
  }
}
