package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Revisit scheduling — the freshness half of a continual crawl: given
  * the observed fetch HISTORY of each URL (when it was fetched and
  * whether its content changed — the `q_s24` server-not-modified
  * records are exactly the changed=false signal) plus optional sitemap
  * HINTS (`changefreq`/`lastmod`, [[Outlinks.sitemapEntries]]'s
  * columns), compute when each URL is next due. The policy is the one
  * production crawlers converge on (e.g. the adaptive revisit
  * literature around Cho & Garcia-Molina, "Effective Page Refresh
  * Policies for Web Crawlers", TODS 2003): exponential backoff while a
  * page keeps NOT changing, immediate reset when it changes, and the
  * site's own declared cadence as the starting interval.
  *
  * Pinned semantics (mirrored by the q_t68 oracle):
  *   - `unchanged_streak` = fetches strictly AFTER the URL's last
  *     changed fetch (all of them when it never changed; a null
  *     `changed` counts as unchanged — absence of evidence of change);
  *   - base interval = the sitemap `changefreq` mapped to seconds
  *     (hourly/always → 3600, daily → 86400, weekly → 604800,
  *     monthly → 2 592 000, yearly → 31 536 000, never →
  *     `maxIntervalSeconds`), else `defaultIntervalSeconds`;
  *     conflicting hints for one URL take the SHORTEST;
  *   - `interval_seconds` = min(base · 2^min(streak, maxDoublings),
  *     `maxIntervalSeconds`);
  *   - `next_fetch_epoch` = `last_fetch_epoch` + interval — EXCEPT
  *     when a hint's `lastmod` postdates the last fetch: the site says
  *     the page already changed, so it is due immediately
  *     (interval 0). Times are epoch SECONDS as doubles (timestamp
  *     columns cast transparently): arithmetic stays engine-portable.
  *
  * Scale shape: two hash aggregations on the URL (the last-fetch/
  * last-change pass and the streak count) plus one join between them
  * and one left join to the per-URL hint aggregate — all keyed by the
  * URL itself, maximally high-cardinality, no window over a group of
  * unbounded size, no driver state. */
object Revisit {

  /** `changefreq` token → seconds, per the pinned mapping. */
  private def freqSeconds(f: Column, maxIntervalSeconds: Double,
      defaultIntervalSeconds: Double): Column = {
    val t = lower(trim(f))
    when(t === "always" || t === "hourly", 3600.0)
      .when(t === "daily", 86400.0)
      .when(t === "weekly", 604800.0)
      .when(t === "monthly", 2592000.0)
      .when(t === "yearly", 31536000.0)
      .when(t === "never", maxIntervalSeconds)
      .otherwise(defaultIntervalSeconds)
  }

  /** @param history  fetch-history frame: one row per (URL, fetch)
    * @param urlCol   URL column
    * @param timeCol  fetch time (timestamp, or epoch-seconds numeric)
    * @param changedCol whether THIS fetch observed changed content
    * @param hints    optional sitemap-entry frame keyed by
    *                 `hintUrlCol` with `hintFreqCol` (and optionally
    *                 `hintLastmodCol`, timestamp or epoch numeric)
    * @return one row per URL: `url`, `last_fetch_epoch`,
    *         `unchanged_streak`, `interval_seconds`,
    *         `next_fetch_epoch` */
  def revisitSchedule(
      history: DataFrame, urlCol: String, timeCol: String,
      changedCol: String,
      hints: Option[DataFrame] = None,
      hintUrlCol: String = "loc",
      hintFreqCol: String = "changefreq",
      hintLastmodCol: Option[String] = None,
      defaultIntervalSeconds: Double = 86400.0,
      maxIntervalSeconds: Double = 2592000.0,
      maxDoublings: Int = 16): DataFrame = {
    require(defaultIntervalSeconds > 0 && maxIntervalSeconds > 0,
      "intervals must be > 0")
    require(maxDoublings >= 0, s"maxDoublings must be >= 0: $maxDoublings")
    def epoch(c: Column): Column =
      c.cast("timestamp").cast("double")
    val h = history.select(col(urlCol).cast("string").as("url"),
      epoch(col(timeCol)).as("__t"),
      col(changedCol).cast("boolean").as("__chg"))
    val lastSeen = h.groupBy("url").agg(
      max(col("__t")).as("last_fetch_epoch"),
      max(when(col("__chg"), col("__t"))).as("__last_chg"))
    val streak = h.join(lastSeen, "url")
      .filter(col("__last_chg").isNull || col("__t") > col("__last_chg"))
      .groupBy("url")
      .agg(count(lit(1)).as("unchanged_streak"))
    val base = lastSeen
      .join(streak, Seq("url"), "left")
      .withColumn("unchanged_streak",
        coalesce(col("unchanged_streak"), lit(0L)))
    val hinted = hints match {
      case None =>
        base.withColumn("__base", lit(defaultIntervalSeconds))
          .withColumn("__lastmod", lit(null).cast("double"))
      case Some(ht) =>
        val perUrl = ht.groupBy(
            col(hintUrlCol).cast("string").as("url"))
          .agg(
            min(freqSeconds(col(hintFreqCol), maxIntervalSeconds,
              defaultIntervalSeconds)).as("__base"),
            hintLastmodCol.map(c => max(epoch(col(c))))
              .getOrElse(max(lit(null).cast("double")))
              .as("__lastmod"))
        base.join(perUrl, Seq("url"), "left")
          .withColumn("__base",
            coalesce(col("__base"), lit(defaultIntervalSeconds)))
    }
    val backoff = least(
      col("__base") * pow(lit(2.0),
        least(col("unchanged_streak"), lit(maxDoublings.toLong))
          .cast("double")),
      lit(maxIntervalSeconds))
    val dueNow = col("__lastmod").isNotNull &&
      col("__lastmod") > col("last_fetch_epoch")
    hinted
      .withColumn("interval_seconds",
        when(dueNow, lit(0.0)).otherwise(backoff))
      .withColumn("next_fetch_epoch",
        col("last_fetch_epoch") + col("interval_seconds"))
      .select("url", "last_fetch_epoch", "unchanged_streak",
        "interval_seconds", "next_fetch_epoch")
  }

  /** Per-URL CHANGE-RATE estimate — the statistical upgrade over
    * [[revisitSchedule]]'s backoff heuristic: assuming page changes
    * are Poisson (the standard web-dynamics model), the estimator of
    * Cho & Garcia-Molina ("Estimating Frequency of Change", TOIT
    * 2003, §4.2 — the bias-corrected form) recovers the change rate
    * λ from REVISIT observations:
    *
    *   λ̂ = -ln((n̄ - X + 0.5) / (n̄ + 0.5)) / Δ̄
    *
    * where n̄ = revisit count (fetches - 1), X = revisits that found
    * the page changed, Δ̄ = mean revisit interval. A scheduler then
    * sets each URL's revisit interval ∝ 1/λ̂ instead of doubling
    * blindly. Pinned semantics (mirrored by the q_t75 oracle): the
    * FIRST fetch is first-sight, not a change observation, so X
    * counts `changed` fetches strictly after the earliest fetch;
    * URLs with one fetch (n̄ = 0) or a zero time span report null.
    * Output rate is per DAY (per-second λ times 86 400 — web change
    * rates read naturally in days).
    *
    * Scale shape: identical to [[revisitSchedule]]'s two hash
    * aggregations on the URL plus one join — no windows, no state.
    *
    * @return `url`, `n_fetches` (long), `n_changed` (long, the X
    *         above), `lambda_per_day` (double, null when
    *         unestimable) */
  def changeRates(
      history: DataFrame, urlCol: String, timeCol: String,
      changedCol: String): DataFrame =
    changeRatesSpanned(history, urlCol, timeCol, changedCol)
      .select("url", "n_fetches", "n_changed", "lambda_per_day")

  /** [[changeRates]] KEEPING the span bounds (`__t0`/`__tl`) in the
    * output — `__tl` IS each URL's last-fetch epoch (max over the same
    * doubles), so [[rateSchedule]] reuses it instead of re-scanning the
    * history a third time for a separate last-fetch aggregation. */
  private def changeRatesSpanned(
      history: DataFrame, urlCol: String, timeCol: String,
      changedCol: String): DataFrame = {
    def epoch(c: Column): Column = c.cast("timestamp").cast("double")
    val h = history.select(col(urlCol).cast("string").as("url"),
      epoch(col(timeCol)).as("__t"),
      col(changedCol).cast("boolean").as("__chg"))
    val spans = h.groupBy("url").agg(
      count(lit(1)).as("n_fetches"),
      min(col("__t")).as("__t0"),
      max(col("__t")).as("__tl"))
    val x = h.join(spans, "url")
      .filter(col("__chg") && col("__t") > col("__t0"))
      .groupBy("url")
      .agg(count(lit(1)).as("n_changed"))
    val n = (col("n_fetches") - 1).cast("double")
    val xd = col("n_changed").cast("double")
    val meanGap = (col("__tl") - col("__t0")) / n
    spans.join(x, Seq("url"), "left")
      .withColumn("n_changed", coalesce(col("n_changed"), lit(0L)))
      .withColumn("lambda_per_day",
        when(n > 0 && col("__tl") > col("__t0"),
          -log((n - xd + 0.5) / (n + 0.5)) / meanGap * 86400.0))
      .select("url", "n_fetches", "n_changed", "lambda_per_day",
        "__t0", "__tl")
  }

  /** Poisson-optimal revisit schedule from the [[changeRates]]
    * estimates — the statistical alternative to [[revisitSchedule]]'s
    * doubling: under the Poisson change model, fetching a page
    * `interval` after its last fetch leaves it stale with probability
    * 1 - e^(-λ·interval), so holding staleness risk at `staleRisk`
    * means `interval = -ln(1 - staleRisk) / λ̂`. URLs whose rate is
    * unestimable (single fetch, zero span, or X = 0 — nothing ever
    * changed, λ̂ = 0) fall back to `defaultIntervalSeconds`; all
    * intervals clamp into [`minIntervalSeconds`,
    * `maxIntervalSeconds`] (a hyperactive page must not starve the
    * crawler, a dead one must still be re-checked eventually).
    *
    * Same two-aggregation scale shape as [[changeRates]] plus one
    * narrow projection.
    *
    * @return `url`, `n_fetches`, `n_changed`, `lambda_per_day`,
    *         `interval_seconds`, `next_fetch_epoch` */
  def rateSchedule(
      history: DataFrame, urlCol: String, timeCol: String,
      changedCol: String,
      staleRisk: Double = 0.5,
      defaultIntervalSeconds: Double = 86400.0,
      minIntervalSeconds: Double = 3600.0,
      maxIntervalSeconds: Double = 2592000.0): DataFrame = {
    require(staleRisk > 0 && staleRisk < 1,
      s"staleRisk must be in (0,1): $staleRisk")
    require(minIntervalSeconds > 0
      && minIntervalSeconds <= maxIntervalSeconds,
      "need 0 < minIntervalSeconds <= maxIntervalSeconds")
    val lambdaSec = col("lambda_per_day") / 86400.0
    val raw = when(
      col("lambda_per_day").isNotNull && col("lambda_per_day") > 0,
      lit(-math.log1p(-staleRisk)) / lambdaSec)
      .otherwise(defaultIntervalSeconds)
    // last_fetch_epoch = the span aggregate's max(__t) — same column,
    // same doubles; a separate last-fetch aggregation would scan the
    // history a third time and pay one more join for a value the
    // change-rate pass already computed.
    changeRatesSpanned(history, urlCol, timeCol, changedCol)
      .withColumn("last_fetch_epoch", col("__tl"))
      .withColumn("interval_seconds",
        least(greatest(raw, lit(minIntervalSeconds)),
          lit(maxIntervalSeconds)))
      .withColumn("next_fetch_epoch",
        col("last_fetch_epoch") + col("interval_seconds"))
      .select("url", "n_fetches", "n_changed", "lambda_per_day",
        "interval_seconds", "next_fetch_epoch")
  }

  /** Revisit schedule straight from a DEDUP ARCHIVE — no separate
    * history table: a [[graft.sources.WarcIO.warcDedupSave]] archive
    * already encodes change detection in its record types. A full
    * `response` record means the crawl stored NEW bytes (the content
    * changed — or was seen for the first time); a `revisit` record
    * (either profile: `identical-payload-digest` from the dedup
    * writer, `server-not-modified` from a conditional GET — the
    * q_s24 records) means the content did NOT change. So
    * (`target_uri`, `warc_date`, warc_type = response) IS the
    * (url, time, changed) history [[revisitSchedule]] consumes.
    * Compose: `fromArchive(spark.read.format("graft-warc")
    * .load(dir), hints)` — the scan prunes to the envelope columns
    * (no payload read), and everything downstream is the certified
    * schedule arithmetic (q_t70 pins this composition end to end). */
  /** [[rateSchedule]] straight from a DEDUP ARCHIVE — the
    * Poisson-optimal twin of [[fromArchive]], reading the same change
    * signal from the record types (`response` = new bytes = changed,
    * `revisit` = unchanged, either profile): compose
    * `rateFromArchive(spark.read.format("graft-warc").load(dir))` and
    * each URL's revisit interval follows its ESTIMATED change rate
    * instead of doubling blindly. Sitemap hints do not apply — the
    * rate estimate IS the cadence signal. Same envelope-only pruned
    * scan; q_t83 pins this composition end to end. */
  def rateFromArchive(
      archive: DataFrame,
      staleRisk: Double = 0.5,
      defaultIntervalSeconds: Double = 86400.0,
      minIntervalSeconds: Double = 3600.0,
      maxIntervalSeconds: Double = 2592000.0): DataFrame =
    rateSchedule(
      archive
        .filter(col("warc_type") === "response"
          || col("warc_type") === "revisit")
        .select(col("target_uri").as("url"),
          col("warc_date").as("ft"),
          (col("warc_type") === "response").as("chg")),
      "url", "ft", "chg", staleRisk, defaultIntervalSeconds,
      minIntervalSeconds, maxIntervalSeconds)

  def fromArchive(
      archive: DataFrame,
      hints: Option[DataFrame] = None,
      hintUrlCol: String = "loc",
      hintFreqCol: String = "changefreq",
      hintLastmodCol: Option[String] = None,
      defaultIntervalSeconds: Double = 86400.0,
      maxIntervalSeconds: Double = 2592000.0,
      maxDoublings: Int = 16): DataFrame =
    revisitSchedule(
      archive
        .filter(col("warc_type") === "response"
          || col("warc_type") === "revisit")
        .select(col("target_uri").as("url"),
          col("warc_date").as("ft"),
          (col("warc_type") === "response").as("chg")),
      "url", "ft", "chg", hints, hintUrlCol, hintFreqCol,
      hintLastmodCol, defaultIntervalSeconds, maxIntervalSeconds,
      maxDoublings)
}
