package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.TextAnalysis._

/** Text-analysis operators over the documents corpus, oracle-certified:
  * token/char counts, quality scoring, language ID, fingerprints. */
object Text {

  val qT1Stats = Q(
    "q_t1_text_stats",
    """SELECT doc_id,
      |       CAST(length(text) AS BIGINT) AS n_chars_calc,
      |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |         AS n_uniq,
      |       CAST(len(regexp_extract_all(text,
      |              '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
      |         AS n_words_re
      |FROM documents""".stripMargin) { (s, d) =>
    documents(s, d).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_calc"),
      tokenCount(col("text")).as("n_tokens"),
      uniqueTokenCount(col("text")).as("n_uniq"),
      regexTokenCount(col("text")).as("n_words_re"))
  }

  val qT2Quality = Q(
    "q_t2_quality",
    """WITH t AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |           AS u,
      |         CAST(len(list_filter(string_split(text, ' '),
      |                w -> w IN ('the','a','of','and','to'))) AS DOUBLE)
      |           AS st
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(n AS BIGINT) AS n_tokens,
      |       CAST(st AS BIGINT) AS stop_cnt,
      |       0.4 * least(1.0, n / 80.0) + 0.3 * (u / n)
      |         + 0.3 * least(1.0, (st / n) * 5.0) AS quality
      |FROM t""".stripMargin) { (s, d) =>
    documents(s, d).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      stopwordCount(col("text"), EnglishStopwords).as("stop_cnt"),
      qualityScore(col("text")).as("quality"))
  }

  val qT3LangId = Q(
    "q_t3_langid",
    """WITH t AS (
      |  SELECT doc_id, lang,
      |   len(list_filter(string_split(text,' '),
      |     w -> w IN ('the','a','of','and','to'))) AS en,
      |   len(list_filter(string_split(text,' '),
      |     w -> w IN ('el','la','los','que','y'))) AS es,
      |   len(list_filter(string_split(text,' '),
      |     w -> w IN ('der','die','das','und','ist'))) AS de,
      |   len(list_filter(string_split(text,' '),
      |     w -> w IN ('le','les','des','et','est'))) AS fr
      |  FROM documents)
      |SELECT doc_id, lang,
      |  CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
      |       WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
      |       WHEN de > 0 AND de >= fr THEN 'de'
      |       WHEN fr > 0 THEN 'fr'
      |       ELSE 'und' END AS pred_lang
      |FROM t""".stripMargin) { (s, d) =>
    documents(s, d).select(
      col("doc_id"), col("lang"), langId(col("text")).as("pred_lang"))
  }

  val qT4Fingerprint = Q(
    "q_t4_fingerprint",
    """SELECT doc_id,
      |       md5(text) AS fp_raw,
      |       md5(array_to_string(list_sort(list_distinct(
      |             string_split(text, ' '))), ' ')) AS fp_content
      |FROM documents""".stripMargin) { (s, d) =>
    documents(s, d).select(
      col("doc_id"),
      fingerprintRaw(col("text")).as("fp_raw"),
      fingerprintContent(col("text")).as("fp_content"))
  }

  /** Overlapping token-window chunking (32-token windows, stride 16). */
  val qT5Chunks = Q(
    "q_t5_chunks",
    """SELECT doc_id,
      |       CAST(start // 16 AS BIGINT) AS chunk_id,
      |       array_to_string(t[start+1 : start+32], ' ') AS chunk,
      |       CAST(least(32, len(t) - start) AS BIGINT) AS n_chunk_tokens
      |FROM (SELECT doc_id, t, unnest(range(0, len(t), 16)) AS start
      |      FROM (SELECT doc_id, string_split(text, ' ') AS t
      |            FROM documents))""".stripMargin) { (s, d) =>
    graft.operators.Chunking.chunk(documents(s, d), "doc_id", "text")
  }

  /** The composed curation pipeline: drop near-duplicate losers (keep the
    * smallest doc id of each pair), keep docs above the quality threshold,
    * carry the predicted language. Exercises dedup + scoring + langid as
    * one plan; the oracle recomputes the identical composition. */
  val qT6Curation = Q(
    "q_t6_curation",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |tg AS (SELECT DISTINCT doc_id, tg FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE [array_to_string(t, ' ')] END) AS tg
      |  FROM toks)),
      |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
      |       FROM tg GROUP BY doc_id),
      |sh AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |              CAST(count(*) AS BIGINT) AS shared
      |       FROM tg a JOIN tg b
      |         ON a.tg = b.tg AND a.doc_id < b.doc_id
      |       GROUP BY 1, 2),
      |losers AS (SELECT DISTINCT doc_b AS doc_id
      |           FROM sh JOIN sz x ON doc_a = x.doc_id
      |                   JOIN sz y ON doc_b = y.doc_id
      |           WHERE CAST(shared AS DOUBLE) / (x.n + y.n - shared) >= 0.8),
      |q AS (SELECT doc_id, lang,
      |        0.4 * least(1.0, nn / 80.0) + 0.3 * (u / nn)
      |          + 0.3 * least(1.0, (st / nn) * 5.0) AS quality
      |      FROM (SELECT doc_id, lang,
      |              CAST(len(string_split(text, ' ')) AS DOUBLE) AS nn,
      |              CAST(len(list_distinct(string_split(text, ' ')))
      |                   AS DOUBLE) AS u,
      |              CAST(len(list_filter(string_split(text, ' '),
      |                     w -> w IN ('the','a','of','and','to')))
      |                   AS DOUBLE) AS st
      |            FROM documents))
      |SELECT doc_id, lang, quality FROM q
      |WHERE quality >= 0.5
      |  AND doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin) {
    (s, d) =>
      val docs = documents(s, d)
      val losers = graft.operators.Dedup
        .minHashLshPairs(docs, "doc_id", "text", 0.8)
        .select(col("doc_b").as("doc_id")).distinct()
      docs
        .join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"),
          qualityScore(col("text")).as("quality"))
        .filter(col("quality") >= 0.5)
  }

  /** Deterministic dataset splits: hash-bucketed, reproducible across
    * engines (pure md5 string ops — no RNG). */
  val qT7Split = Q(
    "q_t7_det_split",
    """WITH s AS (
      |  SELECT doc_id,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
      |           BETWEEN '0' AND 'b' THEN 'train'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
      |           BETWEEN 'c' AND 'd' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents)
      |SELECT split, CAST(count(*) AS BIGINT) AS cnt,
      |       min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM s GROUP BY split""".stripMargin) { (s, d) =>
    documents(s, d)
      .select(col("doc_id"), deterministicSplit(col("doc_id")).as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("cnt"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
  }

  /** Benchmark decontamination: corpus docs containing ≥50% of a probe
    * (doc_id < 10 stand in for the benchmark suite) doc's distinct
    * trigrams. The oracle reuses q_t6's trigram construction. */
  val qT8Decontam = Q(
    "q_t8_decontam",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |tg AS (SELECT DISTINCT doc_id, tg FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE [array_to_string(t, ' ')] END) AS tg
      |  FROM toks)),
      |probe AS (SELECT doc_id AS probe_id, tg FROM tg WHERE doc_id < 10),
      |psz AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS probe_n
      |        FROM probe GROUP BY 1),
      |corp AS (SELECT doc_id, tg FROM tg WHERE doc_id >= 10),
      |ov AS (SELECT c.doc_id, p.probe_id, CAST(count(*) AS BIGINT) AS overlap
      |       FROM corp c JOIN probe p USING (tg) GROUP BY 1, 2)
      |SELECT doc_id, probe_id, overlap,
      |       CAST(overlap AS DOUBLE) / probe_n AS containment
      |FROM ov JOIN psz USING (probe_id)
      |WHERE CAST(overlap AS DOUBLE) / probe_n >= 0.5""".stripMargin) {
    (s, d) =>
      graft.operators.Decontaminate.contamination(
        documents(s, d), "doc_id", "text",
        probePred = col("doc_id") < 10, minContainment = 0.5)
  }

  /** Bloom-pre-screened decontamination: exact-by-construction (no false
    * negatives; false positives die in the hash-keyed verify join), so
    * the oracle is q_t8's EXACT recomputation verbatim — certifying the
    * equivalence claim cross-engine, not just cross-path. */
  val qT28DecontamBloom = Q(
    "q_t28_decontam_bloom",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |tg AS (SELECT DISTINCT doc_id, tg FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE [array_to_string(t, ' ')] END) AS tg
      |  FROM toks)),
      |probe AS (SELECT doc_id AS probe_id, tg FROM tg WHERE doc_id < 10),
      |psz AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS probe_n
      |        FROM probe GROUP BY 1),
      |corp AS (SELECT doc_id, tg FROM tg WHERE doc_id >= 10),
      |ov AS (SELECT c.doc_id, p.probe_id, CAST(count(*) AS BIGINT) AS overlap
      |       FROM corp c JOIN probe p USING (tg) GROUP BY 1, 2)
      |SELECT doc_id, probe_id, overlap,
      |       CAST(overlap AS DOUBLE) / probe_n AS containment
      |FROM ov JOIN psz USING (probe_id)
      |WHERE CAST(overlap AS DOUBLE) / probe_n >= 0.5""".stripMargin) {
    (s, d) =>
      graft.operators.Decontaminate.contaminationBloomed(
        documents(s, d), "doc_id", "text",
        probePred = col("doc_id") < 10, minContainment = 0.5,
        expectedProbeShingles = 2000L)
  }

  /** Wide-shingle decontamination: the published-recipe shape (8-gram
    * collision, vs q_t8's trigram containment) through the generalized
    * `n` parameter — wider shingles kill spurious matches, so the
    * threshold drops to 0.2 to keep true long-span leaks visible. Same
    * probe/corpus split as q_t8; oracle rebuilds the 8-gram sets with the
    * same whole-text fallback below 8 tokens. */
  val qT23Decontam8 = Q(
    "q_t23_decontam8",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |tg AS (SELECT DISTINCT doc_id, tg FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 8
      |    THEN list_transform(range(1, len(t) - 6),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
      |                t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' ||
      |                t[i+6] || ' ' || t[i+7])
      |    ELSE [array_to_string(t, ' ')] END) AS tg
      |  FROM toks) WHERE len(tg) > 0),
      |probe AS (SELECT doc_id AS probe_id, tg FROM tg WHERE doc_id < 10),
      |psz AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS probe_n
      |        FROM probe GROUP BY 1),
      |corp AS (SELECT doc_id, tg FROM tg WHERE doc_id >= 10),
      |ov AS (SELECT c.doc_id, p.probe_id, CAST(count(*) AS BIGINT) AS overlap
      |       FROM corp c JOIN probe p USING (tg) GROUP BY 1, 2)
      |SELECT doc_id, probe_id, overlap,
      |       CAST(overlap AS DOUBLE) / probe_n AS containment
      |FROM ov JOIN psz USING (probe_id)
      |WHERE CAST(overlap AS DOUBLE) / probe_n >= 0.2""".stripMargin) {
    (s, d) =>
      graft.operators.Decontaminate.contamination(
        documents(s, d), "doc_id", "text",
        probePred = col("doc_id") < 10, minContainment = 0.2, n = 8)
  }

  /** One-pass corpus report ("data card" numbers): doc/token mass, exact
    * duplicate rate via distinct content fingerprints, the KMV
    * approximate-distinct twin riding the same aggregation (certified by
    * the q_a13 replay pattern over the fingerprint strings — portable
    * md5 hash, unsigned order statistic, exact IEEE estimator tree),
    * stable-sum mean quality, language share — one aggregation, every
    * formula shared term-for-term with q_t2/t3/t4's oracles. */
  val qT24CorpusReport = Q(
    "q_t24_corpus_report",
    """WITH t AS (
      |  SELECT doc_id, text,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS u,
      |    CAST(len(list_filter(string_split(text,' '),
      |      w -> w IN ('the','a','of','and','to'))) AS DOUBLE) AS st,
      |    len(list_filter(string_split(text,' '),
      |      w -> w IN ('el','la','los','que','y'))) AS es,
      |    len(list_filter(string_split(text,' '),
      |      w -> w IN ('der','die','das','und','ist'))) AS de,
      |    len(list_filter(string_split(text,' '),
      |      w -> w IN ('le','les','des','et','est'))) AS fr
      |  FROM documents),
      |q AS (SELECT doc_id, n,
      |        0.4 * least(1.0, n / 80.0) + 0.3 * (u / n)
      |          + 0.3 * least(1.0, (st / n) * 5.0) AS quality,
      |        CASE WHEN st > 0 AND st >= es AND st >= de AND st >= fr
      |               THEN 'en'
      |             WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
      |             WHEN de > 0 AND de >= fr THEN 'de'
      |             WHEN fr > 0 THEN 'fr'
      |             ELSE 'und' END AS pred_lang,
      |        md5(array_to_string(list_sort(list_distinct(
      |          string_split(text, ' '))), ' ')) AS fp
      |      FROM t),
      |hfp AS (
      |  SELECT DISTINCT
      |    (hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END)
      |      * 4294967296 + lo AS h
      |  FROM (SELECT
      |      CAST(('0x' || substring(md5(fp), 1, 8)) AS BIGINT) AS hi,
      |      CAST(('0x' || substring(md5(fp), 9, 8)) AS BIGINT) AS lo
      |    FROM q)),
      |rfp AS (
      |  SELECT h, row_number() OVER (
      |      ORDER BY CASE WHEN h >= 0 THEN 0 ELSE 1 END, h) AS rn
      |  FROM hfp),
      |efp AS (
      |  SELECT CASE WHEN (SELECT count(*) FROM hfp) < 64
      |    THEN (SELECT CAST(count(*) AS DOUBLE) FROM hfp)
      |    ELSE 63.0 / (SELECT CAST(h AS DOUBLE) / 18446744073709551616.0
      |                    + CASE WHEN h < 0 THEN 1.0 ELSE 0.0 END
      |                  FROM rfp WHERE rn = 64)
      |    END AS est)
      |SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CAST(n AS BIGINT)) AS BIGINT) AS n_tokens,
      |       CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_content,
      |       (SELECT est FROM efp) AS est_distinct_content,
      |       sum(CAST(round(quality * 100) AS BIGINT)) / 100.0 / count(*)
      |         AS mean_quality,
      |       CAST(sum(CASE WHEN pred_lang = 'en' THEN 1 ELSE 0 END)
      |              AS DOUBLE) / count(*) AS pct_lang
      |FROM q""".stripMargin) {
    (s, d) =>
      graft.operators.TextAnalysis.corpusReport(documents(s, d),
        "doc_id", "text",
        sketchHash = graft.operators.Dedup.md5Hash64)
  }

  /** Per-source corpus card ([[graft.operators.TextAnalysis.sourceCard]]):
    * doc/token mass plus KMV approximate distinct hosts and registered
    * domains per source — the q_a14 per-group replay pattern (portable
    * md5 hash, per-source unsigned order statistic, exact-count branch
    * below k) over q_t41's closed-form synthesized messy URLs, whose
    * ground-truth host/domain strings the oracle states directly. One
    * groupBy pass in the engine, no distinct shuffle. k = 8 here (not
    * the operator's default 64) because the fixture holds ≤15 distinct
    * hosts per source — the small k keeps the ESTIMATOR branch live at
    * every SF instead of certifying only the exact-count fallback. */
  val qT44SourceCard = Q(
    "q_t44_source_card",
    """WITH u AS (
      |  SELECT source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |         CASE WHEN doc_id % 6 = 5
      |              THEN '192.168.' || CAST(doc_id % 8 AS VARCHAR) || '.9'
      |              ELSE 'www.site' || CAST(doc_id % 50 AS VARCHAR) ||
      |                   CASE doc_id % 6
      |                     WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com'
      |                     WHEN 2 THEN '.org'   WHEN 3 THEN '.com.au'
      |                     ELSE '.io' END
      |         END AS host,
      |         CASE WHEN doc_id % 6 = 5
      |              THEN '192.168.' || CAST(doc_id % 8 AS VARCHAR) || '.9'
      |              ELSE 'site' || CAST(doc_id % 50 AS VARCHAR) ||
      |                   CASE doc_id % 6
      |                     WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com'
      |                     WHEN 2 THEN '.org'   WHEN 3 THEN '.com.au'
      |                     ELSE '.io' END
      |         END AS dom
      |  FROM documents),
      |hh AS (
      |  SELECT DISTINCT source,
      |    (hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END)
      |      * 4294967296 + lo AS h
      |  FROM (SELECT source,
      |      CAST(('0x' || substring(md5(host), 1, 8)) AS BIGINT) AS hi,
      |      CAST(('0x' || substring(md5(host), 9, 8)) AS BIGINT) AS lo
      |    FROM u)),
      |rh AS (
      |  SELECT source, h,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY CASE WHEN h >= 0 THEN 0 ELSE 1 END, h) AS rn,
      |    count(*) OVER (PARTITION BY source) AS nd
      |  FROM hh),
      |eh AS (
      |  SELECT source,
      |    CASE WHEN max(nd) < 8 THEN CAST(max(nd) AS DOUBLE)
      |         ELSE 7.0 / max(CASE WHEN rn = 8
      |           THEN CAST(h AS DOUBLE) / 18446744073709551616.0
      |              + CASE WHEN h < 0 THEN 1.0 ELSE 0.0 END END)
      |    END AS est_distinct_hosts
      |  FROM rh GROUP BY source),
      |hd AS (
      |  SELECT DISTINCT source,
      |    (hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END)
      |      * 4294967296 + lo AS h
      |  FROM (SELECT source,
      |      CAST(('0x' || substring(md5(dom), 1, 8)) AS BIGINT) AS hi,
      |      CAST(('0x' || substring(md5(dom), 9, 8)) AS BIGINT) AS lo
      |    FROM u)),
      |rd AS (
      |  SELECT source, h,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY CASE WHEN h >= 0 THEN 0 ELSE 1 END, h) AS rn,
      |    count(*) OVER (PARTITION BY source) AS nd
      |  FROM hd),
      |ed AS (
      |  SELECT source,
      |    CASE WHEN max(nd) < 8 THEN CAST(max(nd) AS DOUBLE)
      |         ELSE 7.0 / max(CASE WHEN rn = 8
      |           THEN CAST(h AS DOUBLE) / 18446744073709551616.0
      |              + CASE WHEN h < 0 THEN 1.0 ELSE 0.0 END END)
      |    END AS est_distinct_domains
      |  FROM rd GROUP BY source),
      |base AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(n) AS BIGINT) AS n_tokens
      |  FROM u GROUP BY source)
      |SELECT base.source, n_docs, n_tokens,
      |       est_distinct_hosts, est_distinct_domains
      |FROM base JOIN eh USING (source) JOIN ed USING (source)"""
      .stripMargin) { (s, d) =>
    val id = col("doc_id")
    val host = when(id % 6 === 5,
      concat(lit("192.168."), (id % 8).cast("string"), lit(".9")))
      .otherwise(concat(lit("WWW.SiTe"), (id % 50).cast("string"),
        when(id % 6 === 0, ".Co.UK").when(id % 6 === 1, ".COM")
          .when(id % 6 === 2, ".org").when(id % 6 === 3, ".com.AU")
          .otherwise(".Io")))
    val url = concat(lit("https://"),
      when(id % 4 === 0, "User:Pw@").otherwise(""),
      host,
      when(id % 3 === 1, ":8443").otherwise(""),
      lit("/p"))
    graft.operators.TextAnalysis.sourceCard(documents(s, d),
      "source", "text", url,
      sketchK = 8, sketchHash = graft.operators.Dedup.md5Hash64)
  }

  /** Deterministic corpus shuffle: epoch order = ascending md5(seed‖id),
    * hex-prefix shards (certified — key, shard, and per-shard position all
    * recomputed independently by the oracle). */
  val qT25Shuffle = Q(
    "q_t25_shuffle",
    """WITH k AS (SELECT doc_id,
      |             md5('ep0' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      |           FROM documents)
      |SELECT doc_id, shuffle_key,
      |       substr(shuffle_key, 1, 2) AS shard,
      |       CAST(row_number() OVER (
      |         PARTITION BY substr(shuffle_key, 1, 2)
      |         ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
      |FROM k""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.deterministicShuffle(documents(s, d),
      "doc_id", seed = "ep0")
  }

  /** PII redaction: deterministic synthetic PII (email + SSN derived from
    * doc_id) is injected on BOTH sides, then redacted — certifying that the
    * redaction regexes behave identically across engines. */
  val qT9Redact = Q(
    "q_t9_redact",
    """WITH inj AS (
      |  SELECT doc_id,
      |         text || ' contact user' || CAST(doc_id AS VARCHAR)
      |              || '@mail.com id '
      |              || printf('%03d-%02d-%04d', doc_id % 1000,
      |                        doc_id % 100, doc_id % 10000) AS it
      |  FROM documents)
      |SELECT doc_id,
      |       regexp_replace(regexp_replace(it,
      |         '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
      |         '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS redacted,
      |       CAST(len(regexp_extract_all(it, '[a-z0-9]+@[a-z]+\.[a-z]+'))
      |          + len(regexp_extract_all(
      |              regexp_replace(it, '[a-z0-9]+@[a-z]+\.[a-z]+',
      |                             '<EMAIL>', 'g'),
      |              '[0-9]{3}-[0-9]{2}-[0-9]{4}'))
      |         AS BIGINT) AS n_pii
      |FROM inj""".stripMargin) { (s, d) =>
    val injected = concat(
      col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.com id "),
      format_string("%03d-%02d-%04d",
        col("doc_id") % 1000, col("doc_id") % 100, col("doc_id") % 10000))
    documents(s, d)
      .select(col("doc_id"), injected.as("it"))
      .select(col("doc_id"),
        redact(col("it")).as("redacted"),
        piiCount(col("it")).as("n_pii"))
  }

  /** Gopher-style repetition screen: the most frequent bigram's share of
    * all bigrams, with a keep/drop verdict. Aggregation-shaped (explode →
    * hash-count → max), not per-row HOF: the HOF form is O(unique·total)
    * per document and measured 160× slower on multi-KB docs. */
  val qT10Repetition = Q(
    "q_t10_repetition",
    """WITH g AS (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 2
      |           THEN list_transform(range(1, len(t)),
      |                  i -> t[i] || ' ' || t[i+1])
      |           ELSE [] END) AS gm
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |c AS (SELECT doc_id, gm, CAST(count(*) AS BIGINT) AS cnt
      |      FROM g GROUP BY 1, 2),
      |m AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
      |             max(cnt) AS top
      |      FROM c GROUP BY 1)
      |SELECT doc_id, n_bigrams,
      |       CAST(top AS DOUBLE) / n_bigrams AS top_bigram_frac,
      |       CASE WHEN CAST(top AS DOUBLE) / n_bigrams >= 0.05
      |            THEN 'drop' ELSE 'keep' END AS verdict
      |FROM m""".stripMargin) { (s, d) =>
    repetitionScreen(documents(s, d), "doc_id", "text")
  }

  /** Greedy sequence packing into ~1000-token shards per source. */
  val qT11Pack = Q(
    "q_t11_pack",
    """WITH t AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (SELECT doc_id, source, n_tokens,
      |        COALESCE(sum(n_tokens) OVER (PARTITION BY source
      |                    ORDER BY doc_id) - n_tokens, 0) AS start_tok
      |      FROM t)
      |SELECT doc_id, source, n_tokens,
      |       CAST(floor(start_tok / 1000) AS BIGINT) AS shard_id
      |FROM c""".stripMargin) { (s, d) =>
    packShards(documents(s, d), "doc_id", "text", "source",
      budgetTokens = 1000L)
  }

  /** Deterministic stratified sampling: per-language keep rates via md5
    * thresholds, reported as per-stratum totals. */
  val StratRates = Map("en" -> 0.8, "zh" -> 0.25)
  val StratDefault = 0.5

  val qT12Stratified = Q(
    "q_t12_stratified",
    """WITH k AS (
      |  SELECT lang,
      |         substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
      |           CASE lang WHEN 'en' THEN 'cccc'
      |                     WHEN 'zh' THEN '4000'
      |                     ELSE '8000' END AS keep
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS total,
      |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept
      |FROM k GROUP BY lang""".stripMargin) { (s, d) =>
    documents(s, d)
      .select(col("lang"),
        stratifiedKeep(col("doc_id"), col("lang"), StratRates, StratDefault)
          .as("keep"))
      .groupBy("lang")
      .agg(count(lit(1)).as("total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
  }

  /** Distinctive terms per document: top-3 by rational tf-idf
    * (tf·(N+1)/(df+1) — exact IEEE arithmetic both engines reproduce;
    * see TextAnalysis.tfidfTopTerms for why not log-idf). */
  val qT13TfIdf = Q(
    "q_t13_tfidf_terms",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |       FROM tok GROUP BY 1, 2),
      |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |s AS (SELECT t.doc_id, t.term, t.tf, d.df,
      |             CAST(t.tf AS DOUBLE) * (n.n_docs + 1) / (d.df + 1)
      |               AS score
      |      FROM tf t, df d, n WHERE t.term = d.term),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |                  ORDER BY score DESC, term) AS rank
      |      FROM s)
      |SELECT doc_id, term, tf, df, score, CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 3""".stripMargin) { (s, d) =>
    tfidfTopTerms(documents(s, d), "doc_id", "text", k = 3)
  }

  /** Target token mixture for q_t14 (sources outside the map are weight 0
    * and drop out of the sampled corpus). */
  val MixWeights = Map(
    "src0" -> 0.30, "src1" -> 0.30, "src2" -> 0.20, "src3" -> 0.20)

  /** Domain-mixture sampling: per-source keep rates derived from the
    * target token mixture (budget bound by the scarcest source), applied
    * via the deterministic md5 threshold; reported per source. */
  val qT14Mixture = Q(
    "q_t14_mixture",
    """WITH t AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
      |        FROM t GROUP BY 1),
      |ww AS (SELECT source, src_tokens,
      |         CASE source WHEN 'src0' THEN 0.30 WHEN 'src1' THEN 0.30
      |                     WHEN 'src2' THEN 0.20 WHEN 'src3' THEN 0.20
      |         END AS w
      |       FROM tot
      |       WHERE source IN ('src0', 'src1', 'src2', 'src3')),
      |b AS (SELECT min(CAST(src_tokens AS DOUBLE) / w) AS budget FROM ww),
      |r AS (SELECT source, w * budget / src_tokens AS rate FROM ww, b),
      |k AS (SELECT t.doc_id, t.source, t.n_tokens, r.rate,
      |        substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 4) <
      |          CASE WHEN rate >= 1 THEN 'g000'
      |               ELSE printf('%04x', least(
      |                      CAST(floor(rate * 65536.0) AS BIGINT),
      |                      65535)) END
      |          AS keep
      |      FROM t JOIN r ON t.source = r.source)
      |SELECT source, rate, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
      |         AS kept_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
      |         AS kept_tokens
      |FROM k GROUP BY 1, 2""".stripMargin) { (s, d) =>
    mixtureSample(documents(s, d), "doc_id", "text", "source", MixWeights)
      .groupBy("source", "rate")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L))
          .as("kept_tokens"))
  }

  /** Corpus-level frequent n-grams: top-20 bigrams by occurrence count
    * with document frequency — the boilerplate/stop-phrase list builder.
    * Deterministic tie-break on the gram so both engines cut the top-k
    * identically. */
  val qT15TopNgrams = Q(
    "q_t15_top_ngrams",
    """WITH g AS (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 2
      |           THEN list_transform(range(1, len(t)),
      |                  i -> t[i] || ' ' || t[i+1])
      |           ELSE [] END) AS gram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY 1, 2),
      |t AS (SELECT gram, CAST(sum(n) AS BIGINT) AS n_occurrences,
      |             CAST(count(*) AS BIGINT) AS n_docs
      |      FROM c GROUP BY 1),
      |r AS (SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, gram)
      |               AS rank
      |      FROM t)
      |SELECT gram, n_occurrences, n_docs, CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 20""".stripMargin) { (s, d) =>
    topNgrams(documents(s, d), "doc_id", "text", k = 20)
  }

  /** Same miner at n=3: certifies the generalized n-gram path (the n=2
    * default is pinned by q_t15 above) against an independent trigram
    * construction in the oracle. */
  val qT21TopTrigrams = Q(
    "q_t21_top_trigrams",
    """WITH g AS (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      |           THEN list_transform(range(1, len(t) - 1),
      |                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |           ELSE [] END) AS gram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY 1, 2),
      |t AS (SELECT gram, CAST(sum(n) AS BIGINT) AS n_occurrences,
      |             CAST(count(*) AS BIGINT) AS n_docs
      |      FROM c GROUP BY 1),
      |r AS (SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, gram)
      |               AS rank
      |      FROM t)
      |SELECT gram, n_occurrences, n_docs, CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 20""".stripMargin) { (s, d) =>
    topNgrams(documents(s, d), "doc_id", "text", k = 20, n = 3)
  }

  /** Linear quality-classifier inference: literal weights over five
    * handcrafted features, label = sign of the linear score (same decision
    * as thresholding the logistic probability at 0.5, but pure rational
    * arithmetic → hash-certifiable). */
  val qT16Classifier = Q(
    "q_t16_classifier",
    """WITH f AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |           AS u,
      |         CAST(len(list_filter(string_split(text, ' '),
      |                w -> w IN ('the','a','of','and','to'))) AS DOUBLE)
      |           AS st,
      |         CAST(length(text) AS DOUBLE) AS ch,
      |         CAST(len(list_filter(string_split(text, ' '),
      |                w -> length(w) >= 8)) AS DOUBLE) AS lt
      |  FROM documents),
      |s AS (SELECT doc_id,
      |        -2.0 + least(1.0, n / 256.0) * 1.2
      |             + (u / n) * 1.5
      |             + least(1.0, (st / n) * 5.0) * 1.8
      |             + least(1.0, (ch / n) / 8.0) * 0.6
      |             + (lt / n) * -0.4 AS score
      |      FROM f)
      |SELECT doc_id, score,
      |       CASE WHEN score >= 0 THEN 'keep' ELSE 'drop' END AS label
      |FROM s""".stripMargin) { (s, d) =>
    documents(s, d).select(
      col("doc_id"),
      qualityClassifier(col("text")).as("score"),
      when(qualityClassifier(col("text")) >= 0, lit("keep"))
        .otherwise(lit("drop")).as("label"))
  }

  /** The FULL curation pipeline as one certified plan — every screen the
    * suite certifies individually, composed the way a production
    * training-data pass runs them: repetition screen → near-dup removal
    * (keep the smallest doc id) → quality threshold → language filter →
    * PII redaction → deterministic split assignment. One corpus, six
    * stages, one DuckDB oracle recomputing the identical composition.
    * Narrow screens stay fused in the scan stage; the only exchanges are
    * the dedup path's band-bucket join and the two semi/anti joins. */
  val qT17Pipeline = Q(
    "q_t17_pipeline",
    """WITH g AS (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 2
      |           THEN list_transform(range(1, len(t)),
      |                  i -> t[i] || ' ' || t[i+1])
      |           ELSE [] END) AS gm
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |cg AS (SELECT doc_id, gm, CAST(count(*) AS BIGINT) AS cnt
      |       FROM g GROUP BY 1, 2),
      |rep AS (SELECT doc_id FROM (
      |          SELECT doc_id, CAST(max(cnt) AS DOUBLE)
      |                           / CAST(sum(cnt) AS BIGINT) AS frac
      |          FROM cg GROUP BY 1)
      |        WHERE frac < 0.05),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |         FROM documents),
      |tg AS (SELECT DISTINCT doc_id, tg FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE [array_to_string(t, ' ')] END) AS tg
      |  FROM toks)),
      |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
      |       FROM tg GROUP BY doc_id),
      |sh AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |              CAST(count(*) AS BIGINT) AS shared
      |       FROM tg a JOIN tg b
      |         ON a.tg = b.tg AND a.doc_id < b.doc_id
      |       GROUP BY 1, 2),
      |losers AS (SELECT DISTINCT doc_b AS doc_id
      |           FROM sh JOIN sz x ON doc_a = x.doc_id
      |                   JOIN sz y ON doc_b = y.doc_id
      |           WHERE CAST(shared AS DOUBLE) / (x.n + y.n - shared) >= 0.8),
      |q AS (SELECT doc_id, lang,
      |        0.4 * least(1.0, nn / 80.0) + 0.3 * (u / nn)
      |          + 0.3 * least(1.0, (st / nn) * 5.0) AS quality,
      |        CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr
      |               THEN 'en'
      |             WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
      |             WHEN de > 0 AND de >= fr THEN 'de'
      |             WHEN fr > 0 THEN 'fr'
      |             ELSE 'und' END AS pred_lang
      |      FROM (SELECT doc_id, lang,
      |              CAST(len(string_split(text, ' ')) AS DOUBLE) AS nn,
      |              CAST(len(list_distinct(string_split(text, ' ')))
      |                   AS DOUBLE) AS u,
      |              CAST(len(list_filter(string_split(text, ' '),
      |                     w -> w IN ('the','a','of','and','to')))
      |                   AS DOUBLE) AS st,
      |              len(list_filter(string_split(text,' '),
      |                w -> w IN ('the','a','of','and','to'))) AS en,
      |              len(list_filter(string_split(text,' '),
      |                w -> w IN ('el','la','los','que','y'))) AS es,
      |              len(list_filter(string_split(text,' '),
      |                w -> w IN ('der','die','das','und','ist'))) AS de,
      |              len(list_filter(string_split(text,' '),
      |                w -> w IN ('le','les','des','et','est'))) AS fr
      |            FROM documents)),
      |clean AS (SELECT doc_id,
      |            regexp_replace(regexp_replace(text,
      |              '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
      |              '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS clean_text
      |          FROM documents),
      |split AS (SELECT doc_id,
      |            CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
      |                   BETWEEN '0' AND 'b' THEN 'train'
      |                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
      |                   BETWEEN 'c' AND 'd' THEN 'val'
      |                 ELSE 'test' END AS split
      |          FROM documents)
      |SELECT q.doc_id, q.pred_lang, q.quality, split.split,
      |       clean.clean_text
      |FROM q JOIN rep ON q.doc_id = rep.doc_id
      |       JOIN clean ON q.doc_id = clean.doc_id
      |       JOIN split ON q.doc_id = split.doc_id
      |WHERE q.quality >= 0.5 AND q.pred_lang = 'en'
      |  AND q.doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin) {
    (s, d) =>
      graft.operators.Curation
        .pipeline(documents(s, d), "doc_id", "text").df
  }

  /** Subword vocabulary for q_t18: frequent corpus words, some split
    * subwords, and the ASCII letters/digits as the fallback alphabet (so
    * clean text segments fully; [UNK] marks genuinely foreign chars). */
  val WpVocab: Seq[String] =
    Seq("table", "hash", "join", "scan", "value", "filter", "window",
      "merge", "group", "order", "batch", "query", "row", "key", "agg",
      "ta", "ble", "jo", "in", "sc", "an", "val", "ue", "er", "ing") ++
      ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString)

  /** DuckDB arm of [[WpVocab]]'s greedy longest-match step: the vocab is
    * compile-time fixed, so "longest piece matching at cursor i" is a
    * static CASE over piece lengths descending — generated from the SAME
    * Seq the Spark expression carries, so the two can never drift. */
  private def wpMatchCase: String =
    WpVocab.groupBy(_.length).toSeq.sortBy(-_._1).map { case (l, vs) =>
      s"WHEN substr(w, i, $l) IN (${vs.map(v => s"'$v'").mkString(", ")})" +
        s" THEN $l"
    }.mkString("CASE ", " ", " ELSE 0 END")

  /** Per-word greedy segmentation replayed as a recursive CTE: state
    * (word, cursor, pieces, unks) advances by the longest vocab match or
    * one [UNK] character — exactly [[graft.functions.WordpieceTokens]]'s
    * loop, which is deterministic, so both engines walk identical chains.
    * Runs over DISTINCT words only (vocabulary-sized, not corpus-sized);
    * docs re-join their words afterwards. */
  private def wpSegCte: String =
    s"""words AS (
       |  SELECT DISTINCT w
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0),
       |seg AS (
       |  SELECT w, 1 AS i, 0 AS pieces, 0 AS unks FROM words
       |  UNION ALL
       |  SELECT w, i + CASE WHEN m = 0 THEN 1 ELSE m END, pieces + 1,
       |         unks + CASE WHEN m = 0 THEN 1 ELSE 0 END
       |  FROM (SELECT w, i, pieces, unks, $wpMatchCase AS m
       |        FROM seg WHERE i <= length(w)) t),
       |wp AS (SELECT w, pieces, unks FROM seg WHERE i > length(w))""".stripMargin

  /** Subword tokenization budget: greedy longest-match wordpiece count
    * vs the whitespace count — the number sequence packing and mixture
    * sampling SHOULD budget with once a real tokenizer vocab drops in.
    * Certified: the greedy MaxMatch walk is deterministic and all-integer,
    * so [[wpSegCte]] replays it per distinct word and the doc totals are
    * exact sums (NorthStarSpec additionally pins the expression against an
    * independent implementation plus character conservation). */
  val qT18Wordpiece = Q(
    "q_t18_wordpiece",
    s"""WITH RECURSIVE $wpSegCte,
       |docw AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws
       |  FROM documents),
       |j AS (
       |  SELECT d.doc_id, coalesce(p.pieces, 0) AS p,
       |         coalesce(p.unks, 0) AS u, d.n_ws
       |  FROM docw d LEFT JOIN wp p ON d.w = p.w)
       |SELECT doc_id, CAST(sum(p) AS BIGINT) AS n_pieces,
       |       CAST(sum(u) AS BIGINT) AS n_unk,
       |       any_value(n_ws) AS n_whitespace_tokens
       |FROM j GROUP BY doc_id""".stripMargin) { (s, d) =>
    val pieces = graft.functions.GraftFunctions
      .wordpieceTokens(col("text"), WpVocab)
    documents(s, d).select(
      col("doc_id"),
      size(pieces).cast("long").as("n_pieces"),
      size(filter(pieces, p => p === "[UNK]")).cast("long").as("n_unk"),
      tokenCount(col("text")).as("n_whitespace_tokens"))
  }

  /** Sequence packing budgeted in SUBWORD tokens: the same greedy
    * per-source pack as q_t11, but every document's budget is its
    * wordpiece piece count (q_t18's counter) instead of the whitespace
    * count — the form a real training pipeline runs, since context
    * windows are measured in tokenizer pieces. Certified: piece counts
    * replay via [[wpSegCte]] and the pack itself is q_t11's certified
    * floor-of-prefix-sum. */
  val qT20SubwordPack = Q(
    "q_t20_subword_pack",
    s"""WITH RECURSIVE $wpSegCte,
       |docw AS (
       |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |t AS (
       |  SELECT d.doc_id, any_value(d.source) AS source,
       |         CAST(sum(coalesce(p.pieces, 0)) AS BIGINT) AS n_tokens
       |  FROM docw d LEFT JOIN wp p ON d.w = p.w
       |  GROUP BY d.doc_id),
       |c AS (
       |  SELECT doc_id, source, n_tokens,
       |         COALESCE(sum(n_tokens) OVER (PARTITION BY source
       |                     ORDER BY doc_id) - n_tokens, 0) AS start_tok
       |  FROM t)
       |SELECT doc_id, source, n_tokens,
       |       CAST(floor(start_tok / 2048) AS BIGINT) AS shard_id
       |FROM c""".stripMargin) { (s, d) =>
    packShards(documents(s, d), "doc_id", "text", "source",
      budgetTokens = 2048L,
      counter = t => size(
        graft.functions.GraftFunctions.wordpieceTokens(t, WpVocab)))
  }

  /** Frequent-word mining (n=1 of the miner family; the vocabulary-
    * derivation input): top-50 words by occurrence with doc frequency,
    * word tie-break. Certified — word exchange is vocabulary-shaped, so
    * no hash indirection is needed (see topWords scaladoc). */
  val qT22TopWords = Q(
    "q_t22_top_words",
    """WITH c AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |           FROM documents),
      |g AS (SELECT doc_id, word, count(*) AS n FROM c GROUP BY 1, 2),
      |t AS (SELECT word, CAST(sum(n) AS BIGINT) AS n_occurrences,
      |             CAST(count(*) AS BIGINT) AS n_docs
      |      FROM g GROUP BY 1),
      |r AS (SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, word)
      |               AS rank
      |      FROM t)
      |SELECT word, n_occurrences, n_docs, CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 50""".stripMargin) { (s, d) =>
    topWords(documents(s, d), "doc_id", "text", k = 50)
  }

  /** Epochs-style mixture resampling: target = 1.5× the weighted token
    * mass at 50/30/20 — the half-weight source upsamples past 2 epochs
    * while the others downsample, all from one deterministic rule. */
  val EpochWeights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)

  val qT19MixtureEpochs = Q(
    "q_t19_mixture_epochs",
    """WITH t AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
      |        FROM t GROUP BY 1),
      |ww AS (SELECT source, src_tokens,
      |         CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3
      |                     WHEN 'src2' THEN 0.2 END AS w
      |       FROM tot WHERE source IN ('src0', 'src1', 'src2')),
      |tgt AS (SELECT CAST(sum(src_tokens) AS BIGINT) * 1.5 AS target
      |        FROM ww),
      |f AS (SELECT source, w * target / src_tokens AS factor FROM ww, tgt),
      |c AS (SELECT t.doc_id, t.source, t.n_tokens, f.factor,
      |        CAST(floor(f.factor) AS BIGINT) +
      |        CASE WHEN substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 4) <
      |               printf('%04x', least(CAST(floor(
      |                 (f.factor - floor(f.factor)) * 65536.0) AS BIGINT),
      |                 65535))
      |             THEN 1 ELSE 0 END AS n_copies
      |      FROM t JOIN f ON t.source = f.source)
      |SELECT source, factor, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_copies) AS BIGINT) AS emitted_docs,
      |       CAST(sum(n_copies * n_tokens) AS BIGINT) AS emitted_tokens
      |FROM c GROUP BY 1, 2""".stripMargin) { (s, d) =>
    mixtureResample(documents(s, d), "doc_id", "text", "source",
      EpochWeights, totalMultiple = 1.5)
      .groupBy("source", "factor")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_copies")).as("emitted_docs"),
        sum(col("n_copies") * col("n_tokens")).as("emitted_tokens"))
  }

  /** CCNet-style bigram-LM cross-entropy scoring, trained on the corpus
    * itself with the LM pruned at minCount=2 (exercising the prune path).
    * The oracle retrains and rescores the whole model independently at
    * the string level; Spark runs it hash-keyed — equal up to xxhash64
    * collisions (~1e-8 here). The Σ −ln P is a fixed-point stable sum so
    * partial-aggregation order can never flip a bit. */
  val qT26LmScore = Q(
    "q_t26_lm_score",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |tr AS (SELECT doc_id, t[u.i] AS w1, t[u.i + 1] AS w2
      |       FROM toks, unnest(range(1, len(t))) AS u(i)),
      |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      |        FROM tr GROUP BY 1, 2),
      |ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
      |        FROM big GROUP BY 1),
      |vv AS (SELECT count(DISTINCT w) AS v
      |       FROM (SELECT unnest(t) AS w FROM toks) uw),
      |lm AS (SELECT * FROM big WHERE c12 >= 2),
      |sc AS (SELECT tr.doc_id,
      |         CAST(coalesce(lm.c12, 0) + 1 AS DOUBLE) /
      |           CAST(ctx.c1 + vv.v AS DOUBLE) AS p
      |       FROM tr
      |       JOIN ctx USING (w1)
      |       LEFT JOIN lm ON tr.w1 = lm.w1 AND tr.w2 = lm.w2
      |       CROSS JOIN vv)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trans,
      |       sum(CAST(round(-ln(p) * 1000000) AS BIGINT)) / 1000000.0
      |         / count(*) AS xent
      |FROM sc GROUP BY 1""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.lmScore(documents(s, d), "doc_id", "text",
      minCount = 2L)
  }

  /** Gopher heuristic rule filter (Rae et al. Table A1 core): every rule
    * number and the keep/drop verdict recomputed independently by the
    * oracle — word bounds, mean word length, '#'/'...' symbol ratio,
    * alphabetic-word ratio, 8-stopword presence probe. */
  val qT27GopherRules = Q(
    "q_t27_gopher_rules",
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS t
      |           FROM documents),
      |m AS (SELECT doc_id,
      |        CAST(len(t) AS BIGINT) AS n_words,
      |        CAST(list_sum(list_transform(t, w -> length(w))) AS DOUBLE)
      |          / len(t) AS mean_word_len,
      |        CAST(CAST(length(text) - length(replace(text, '#', ''))
      |               AS BIGINT)
      |             + CAST((length(text)
      |                     - length(replace(text, '...', ''))) / 3
      |               AS BIGINT) AS DOUBLE) / len(t) AS symbol_ratio,
      |        CAST(len(list_filter(t,
      |               w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
      |          / len(t) AS alpha_word_ratio,
      |        CAST((CASE WHEN list_contains(t, 'the') THEN 1 ELSE 0 END)
      |           + (CASE WHEN list_contains(t, 'be') THEN 1 ELSE 0 END)
      |           + (CASE WHEN list_contains(t, 'to') THEN 1 ELSE 0 END)
      |           + (CASE WHEN list_contains(t, 'of') THEN 1 ELSE 0 END)
      |           + (CASE WHEN list_contains(t, 'and') THEN 1 ELSE 0 END)
      |           + (CASE WHEN list_contains(t, 'that') THEN 1 ELSE 0 END)
      |           + (CASE WHEN list_contains(t, 'have') THEN 1 ELSE 0 END)
      |           + (CASE WHEN list_contains(t, 'with') THEN 1 ELSE 0 END)
      |          AS INT) AS n_stop_hits
      |      FROM t)
      |SELECT *,
      |       CASE WHEN n_words BETWEEN 50 AND 100000
      |                 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
      |                 AND symbol_ratio <= 0.1
      |                 AND alpha_word_ratio >= 0.8
      |                 AND n_stop_hits >= 1
      |            THEN 'keep' ELSE 'drop' END AS verdict
      |FROM m""".stripMargin) { (s, d) =>
    // paper defaults except minStopwordHits: the synthetic corpus carries
    // only 'the' from the 8-word probe list, so the paper's >= 2 would
    // certify a constant all-drop verdict — >= 1 exercises both branches
    graft.operators.TextAnalysis.gopherRules(documents(s, d),
      "doc_id", "text", minStopwordHits = 1)
  }

  /** Temperature-scaled mixture at α = 0.5: the oracle re-derives the
    * per-source weights from scratch — token totals, fixed-point-rounded
    * pow (the order-free quantization that makes the share derivation
    * certifiable), normalization, then q_t19's factor/copy arithmetic
    * verbatim. */
  val qT29Temperature = Q(
    "q_t29_temperature",
    """WITH t AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
      |        FROM t GROUP BY 1),
      |wq AS (SELECT source, src_tokens,
      |         CAST(round(pow(CAST(src_tokens AS DOUBLE), 0.5) * 1000000)
      |              AS BIGINT) AS q
      |       FROM tot),
      |z AS (SELECT CAST(sum(q) AS BIGINT) AS zq FROM wq),
      |ww AS (SELECT source, src_tokens,
      |         CAST(q AS DOUBLE) / CAST(zq AS DOUBLE) AS w
      |       FROM wq CROSS JOIN z),
      |tgt AS (SELECT CAST(sum(src_tokens) AS BIGINT) * 1.0 AS target
      |        FROM ww),
      |f AS (SELECT source, w * target / src_tokens AS factor
      |      FROM ww CROSS JOIN tgt),
      |c AS (SELECT t.doc_id, t.source, t.n_tokens, f.factor,
      |        CAST(floor(f.factor) AS BIGINT) +
      |        CASE WHEN substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 4) <
      |               printf('%04x', least(CAST(floor(
      |                 (f.factor - floor(f.factor)) * 65536.0) AS BIGINT),
      |                 65535))
      |             THEN 1 ELSE 0 END AS n_copies
      |      FROM t JOIN f ON t.source = f.source)
      |SELECT source, factor, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_copies) AS BIGINT) AS emitted_docs,
      |       CAST(sum(n_copies * n_tokens) AS BIGINT) AS emitted_tokens
      |FROM c GROUP BY 1, 2""".stripMargin) { (s, d) =>
    temperatureResample(documents(s, d), "doc_id", "text", "source",
      alpha = 0.5)
      .groupBy("source", "factor")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_copies")).as("emitted_docs"),
        sum(col("n_copies") * col("n_tokens")).as("emitted_tokens"))
  }

  /** Per-source document cap (the per-domain cap of crawl curation):
    * keep the 15 hash-smallest documents per source. The operator ranks
    * in two exact salted levels so no window partition is ever
    * domain-sized; the oracle certifies it against the naive
    * single-window form the decomposition provably equals. */
  val qT30SourceCap = Q(
    "q_t30_source_cap",
    """WITH r AS (
      |  SELECT doc_id, source,
      |         row_number() OVER (PARTITION BY source
      |           ORDER BY md5('cap' || CAST(doc_id AS VARCHAR)), doc_id)
      |           AS rn
      |  FROM documents)
      |SELECT doc_id, source, CAST(rn AS BIGINT) AS cap_rank
      |FROM r WHERE rn <= 15""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.capPerKey(documents(s, d),
      "doc_id", "source", cap = 15)
  }

  /** Token-length histogram with per-bucket padding waste — the
    * feasibility report behind length-bucketed batching. All integer
    * arithmetic except the final exact-int division. */
  val qT31LengthBuckets = Q(
    "q_t31_length_buckets",
    """WITH t AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents),
      |b AS (SELECT CAST(floor(n / 16.0) AS BIGINT) AS bucket, n FROM t),
      |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
      |             CAST(sum(n) AS BIGINT) AS sum_tokens,
      |             CAST(max(n) AS BIGINT) AS max_tokens
      |      FROM b GROUP BY 1)
      |SELECT bucket, n_docs, sum_tokens, max_tokens,
      |       1.0 - CAST(sum_tokens AS DOUBLE) /
      |             CAST(n_docs * max_tokens AS DOUBLE) AS padding_frac
      |FROM g""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.lengthBuckets(documents(s, d),
      "doc_id", "text", width = 16)
  }

  /** One BPE training level replayed in SQL: count adjacent pairs over
    * the surviving segmentations, take the argmax (count desc, then pair
    * asc — the trainer's tie-break), then re-segment with the same greedy
    * left-to-right fold the trainer applies. Two prunings keep the chain
    * cheap without changing results: words lacking either winning token
    * keep their segmentation untouched, and fully-merged (single-token)
    * words can never vote again so they drop from the chain. */
  private def bpeLevelCte(n: Int): String = {
    val p = n - 1
    s"""pc$n AS MATERIALIZED (
       |  SELECT s[i] AS l, s[i + 1] AS r, sum(f) AS c
       |  FROM seg$p, unnest(range(1, len(s))) t(i)
       |  GROUP BY 1, 2),
       |best$n AS MATERIALIZED (
       |  SELECT $n AS rank, l, r, c
       |  FROM pc$n ORDER BY c DESC, l, r LIMIT 1),
       |seg$n AS MATERIALIZED (
       |  SELECT w, f,
       |         CASE WHEN b.l IS NULL OR len(s) < 2
       |                   OR NOT (list_contains(s, b.l)
       |                           AND list_contains(s, b.r))
       |              THEN s
       |              ELSE list_reduce(
       |                list_transform(s, x -> [x]),
       |                (acc, x) -> CASE WHEN acc[-1] = b.l AND x[1] = b.r
       |                  THEN list_append(acc[:-2], b.l || b.r)
       |                  ELSE list_concat(acc, x) END)
       |         END AS s
       |  FROM seg$p LEFT JOIN best$n b ON true
       |  WHERE len(s) >= 2)""".stripMargin
  }

  /** Full BPE-trainer replay: seg0 is the distinct-word table (char
    * segmentation + the `</w>` end marker, frequency-weighted), then one
    * [[bpeLevelCte]] per merge rank chained as materialized CTEs.
    * Validated offline up to 512 levels (exact match); registered only at
    * small n — the chain is serial by construction, so oracle latency
    * grows linearly with rank depth (~0.3 s at 16, minutes at 512). */
  private def bpeOracleSql(nMerges: Int): String = {
    val levels = (1 to nMerges).map(bpeLevelCte).mkString(",\n")
    val union = (1 to nMerges).map(k => s"SELECT * FROM best$k")
      .mkString(" UNION ALL ")
    s"""WITH words AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS f
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY w),
       |seg0 AS MATERIALIZED (
       |  SELECT w, f,
       |         list_append(list_transform(range(1, length(w) + 1),
       |                                    i -> w[i]), '</w>') AS s
       |  FROM words),
       |$levels
       |SELECT CAST(rank AS BIGINT) AS rank, l AS "left", r AS "right",
       |       CAST(c AS BIGINT) AS pair_count
       |FROM ($union) WHERE c >= 1""".stripMargin
  }

  /** BPE merge training on the corpus (Sennrich et al.): 16 merges in
    * rank order (each merge costs one distributed pass + one argmax row
    * to the driver, so the registered demo keeps the count small; the
    * operator takes any n). Certified — the training loop is
    * deterministic (argmax with a total-order tie-break), so
    * [[bpeOracleSql]] replays all 16 levels as chained materialized CTEs;
    * BpeSpec additionally differential-tests against an independent
    * plain-Scala trainer and pins segmentation character conservation. */
  val qT32BpeMerges = Q("q_t32_bpe_merges", bpeOracleSql(16)) { (s, d) =>
    import s.implicits._
    graft.operators.TextAnalysis
      .deriveBpeMerges(documents(s, d), "doc_id", "text", nMerges = 16)
      .zipWithIndex
      .map { case ((l, r, c), i) => (i + 1L, l, r, c) }
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Exact token-budget subcorpus: take documents in hash order until
    * 10k tokens are committed. The oracle recomputes the running total
    * with a plain cumulative window; the operator's two-pass distributed
    * prefix sum must agree row-for-row. */
  val qT33TokenBudget = Q(
    "q_t33_token_budget",
    """WITH t AS (
      |  SELECT doc_id,
      |         md5('budget' || CAST(doc_id AS VARCHAR)) AS k,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents),
      |c AS (SELECT doc_id, n,
      |             COALESCE(sum(n) OVER (ORDER BY k, doc_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |               0) AS strt
      |      FROM t)
      |SELECT doc_id, n AS n_tokens FROM c
      |WHERE strt < 10000""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.tokenBudgetSample(documents(s, d),
      "doc_id", "text", budgetTokens = 10000L)
  }

  /** CCNet head/middle/tail buckets over the corpus-trained LM score:
    * q_t26's oracle extended with `quantile_cont` tertiles — the actual
    * CCNet selection step, certified end to end (identical xent
    * multiset → identical interpolated thresholds → identical labels). */
  val qT35LmBuckets = Q(
    "q_t35_lm_buckets",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |tr AS (SELECT doc_id, t[u.i] AS w1, t[u.i + 1] AS w2
      |       FROM toks, unnest(range(1, len(t))) AS u(i)),
      |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      |        FROM tr GROUP BY 1, 2),
      |ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
      |        FROM big GROUP BY 1),
      |vv AS (SELECT count(DISTINCT w) AS v
      |       FROM (SELECT unnest(t) AS w FROM toks) uw),
      |lm AS (SELECT * FROM big WHERE c12 >= 2),
      |sc AS (SELECT tr.doc_id,
      |         CAST(coalesce(lm.c12, 0) + 1 AS DOUBLE) /
      |           CAST(ctx.c1 + vv.v AS DOUBLE) AS p
      |       FROM tr
      |       JOIN ctx USING (w1)
      |       LEFT JOIN lm ON tr.w1 = lm.w1 AND tr.w2 = lm.w2
      |       CROSS JOIN vv),
      |x AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trans,
      |        sum(CAST(round(-ln(p) * 1000000) AS BIGINT)) / 1000000.0
      |          / count(*) AS xent
      |      FROM sc GROUP BY 1),
      |q AS (SELECT quantile_cont(xent, CAST(1 AS DOUBLE)/3) AS t1,
      |             quantile_cont(xent, CAST(2 AS DOUBLE)/3) AS t2
      |      FROM x)
      |SELECT doc_id, n_trans, xent,
      |       CASE WHEN xent <= t1 THEN 'head'
      |            WHEN xent <= t2 THEN 'middle'
      |            ELSE 'tail' END AS bucket
      |FROM x CROSS JOIN q""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.lmBuckets(documents(s, d),
      "doc_id", "text", minCount = 2L)
  }

  /** Bounded-memory heavy hitters: the Misra–Gries summary aggregate at
    * capacity 64. Rows-only — estimates depend on encounter order; the
    * deterministic guarantee (all >N/65 tokens present, undercount
    * ≤ N/65) is pinned against exact counts in a spec. */
  val qT34FreqTokens = Q.rowsOnly("q_t34_freq_tokens",
    "Misra-Gries estimates depend on encounter order; the deterministic " +
      "guarantee (all >N/65 tokens present, undercount <= N/65) is " +
      "spec-pinned against exact counts") { (s, d) =>
    graft.operators.TextAnalysis.frequentTokens(documents(s, d),
      "doc_id", "text", capacity = 64)
  }

  /** BPE training at REAL vocabulary scale: 512 merges in one run via
    * [[TextAnalysis.trainBpeMerges]] — one distributed word-count pass,
    * then a driver-side incremental merge loop over the pruned word
    * table (the production trainer shape; q_t32's per-merge-job loop is
    * the differential reference BpeSpec pins it against). Rows-only BY
    * LATENCY, not expressibility: [[bpeOracleSql]](512) reproduced this
    * query's output EXACTLY offline, but the serial 512-level CTE chain
    * runs minutes in DuckDB — unacceptable in the correctness gate — so
    * q_t32 certifies the identical replay at rank 16 and BpeSpec pins the
    * two trainers against each other. minPairCount=1 lets the sf0.01
    * corpus actually reach deep merge ranks. */
  val qT37Bpe512 = Q.rowsOnly("q_t37_bpe512",
    "rows-only by ORACLE LATENCY, not expressibility: the 512-level " +
      "replay CTE reproduced this output exactly but runs minutes in " +
      "DuckDB; q_t32 certifies the identical loop at rank 16") { (s, d) =>
    import s.implicits._
    graft.operators.TextAnalysis
      .trainBpeMerges(documents(s, d), "doc_id", "text",
        nMerges = 512, minPairCount = 1L)
      .zipWithIndex
      .map { case ((l, r, c), i) => (i + 1L, l, r, c) }
      .toDF("rank", "left", "right", "pair_count")
  }

  /** The Naive-Bayes trainer's single counting pass + the smoothed
    * rational likelihood ratio each bucket weight is the log of —
    * certified end to end (the log itself stays driver-side in
    * [[graft.operators.TextAnalysis.trainQualityNb]]; the ratio is pure
    * long-exact counts and one IEEE mul/div chain, which DuckDB
    * reproduces bit-for-bit). Labels are a deterministic doc_id rule so
    * the oracle agrees on the class split; the md5-prefix feature hash
    * is the SQL-portable [[graft.operators.TextAnalysis.nbBucket]]. */
  val qT36NbTrain = Q(
    "q_t36_nb_train",
    """WITH t AS (
      |  SELECT doc_id % 2 = 1 AS pos,
      |         unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |b AS (
      |  SELECT CAST(('0x' || substring(md5(tok), 1, 4)) AS BIGINT) % 256
      |           AS bucket,
      |         CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_pos,
      |         CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_neg
      |  FROM t GROUP BY 1),
      |tot AS (SELECT sum(n_pos) AS pos_tok, sum(n_neg) AS neg_tok FROM b)
      |SELECT bucket, n_pos, n_neg,
      |       (CAST(n_pos + 1 AS DOUBLE) * CAST(neg_tok + 256 AS DOUBLE)) /
      |       (CAST(n_neg + 1 AS DOUBLE) * CAST(pos_tok + 256 AS DOUBLE))
      |         AS ratio
      |FROM b, tot""".stripMargin) { (s, d) =>
    val b = 256
    val counts = graft.operators.TextAnalysis.nbTrainCounts(
      documents(s, d), "text", col("doc_id") % 2 === 1, b)
    val tot = counts.agg(sum(col("n_pos")).as("pos_tok"),
      sum(col("n_neg")).as("neg_tok"))
    counts.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_pos"), col("n_neg"),
        (((col("n_pos") + 1).cast("double")
            * (col("neg_tok") + b).cast("double"))
          / ((col("n_neg") + 1).cast("double")
            * (col("pos_tok") + b).cast("double"))).as("ratio"))
  }

  /** Exactly-k uniform deterministic sampling per source via the
    * bottom-k priority sketch ([[graft.operators.Sampling]]): the
    * md5-prefix priority is bit-identical across engines, so the oracle
    * replays the exact draw with a window formulation — certifying that
    * the bounded-heap aggregate (whose only exchange carries ≤ k pairs
    * per group per map partition) selects the same rows a full
    * shuffle-and-rank would. */
  val qT38UniformSample = Q(
    "q_t38_uniform_sample",
    """WITH p AS (
      |  SELECT source, doc_id,
      |         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |              AS BIGINT) AS pri
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY pri, doc_id) AS rn
      |  FROM p)
      |SELECT source, doc_id, CAST(rn AS BIGINT) AS rank
      |FROM r WHERE rn <= 7""".stripMargin) { (s, d) =>
    graft.operators.Sampling.uniformPerGroup(
      documents(s, d).select(col("source"), col("doc_id")),
      groupCols = Seq("source"), idCol = "doc_id", k = 7)
  }

  /** Weight-biased exact-k sampling per source (priority sampling,
    * Duffield–Lund–Thorup) with `n_chars` as the weight — the "sample
    * documents proportional to their token mass" pipeline draw. The
    * integer selection key `((u+1)·2^20) div w` is exact in both
    * engines, so the oracle replays the identical draw. */
  val qT39WeightedSample = Q(
    "q_t39_weighted_sample",
    """WITH p AS (
      |  SELECT source, doc_id, n_chars,
      |         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |              AS BIGINT) AS u
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id,
      |         row_number() OVER (PARTITION BY source
      |           ORDER BY ((u + 1) * 1048576) // n_chars, doc_id) AS rn
      |  FROM p)
      |SELECT source, doc_id, CAST(rn AS BIGINT) AS rank
      |FROM r WHERE rn <= 6""".stripMargin) { (s, d) =>
    graft.operators.Sampling.weightedPerGroup(
      documents(s, d).select(col("source"), col("doc_id"), col("n_chars")),
      groupCols = Seq("source"), idCol = "doc_id",
      weightCol = "n_chars", k = 6)
  }

  /** Canonical-URL normalization ([[graft.operators.TextAnalysis
    * .canonicalUrl]]), hash-certified: the query synthesizes one messy
    * URL per document — id-varied scheme/host case, a default or
    * explicit port, cased path segments, shuffled query params with
    * tracking keys mixed in, an optional fragment — and the oracle
    * states the expected canonical string in closed form (it does NOT
    * re-run a normalizer: each CASE arm is the literal ground-truth
    * answer). Covers: case folding limited to scheme+authority, :80
    * stripped only for http, :8080 kept, params sorted, utm_ and gclid
    * keys dropped (including the all-tracking → no-'?' edge), fragments
    * dropped, and the empty path → '/'. */
  val qT40UrlCanonical = Q(
    "q_t40_url_canonical",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       'http' || CASE WHEN doc_id % 2 = 0 THEN '' ELSE 's' END ||
      |       '://example' || CAST(doc_id % 7 AS VARCHAR) || '.com' ||
      |       CASE WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END ||
      |       CASE WHEN doc_id % 11 = 0 THEN '/'
      |            ELSE '/Dir' || CAST(doc_id % 4 AS VARCHAR) || '/Page'
      |       END ||
      |       CASE doc_id % 5
      |         WHEN 0 THEN '?a=1&z=9'
      |         WHEN 1 THEN '?b=2'
      |         WHEN 4 THEN '?a=1&z=9'
      |         ELSE ''
      |       END AS canon_url
      |FROM documents""".stripMargin) { (s, d) =>
    val id = col("doc_id")
    val messy = concat(
      when(id % 2 === 0, "HTTP").otherwise("hTTpS"), lit("://"),
      lit("ExAmPle"), (id % 7).cast("string"), lit(".CoM"),
      when(id % 3 === 0 && id % 2 === 0, ":80")
        .when(id % 3 === 0 && id % 2 =!= 0, ":443")
        .when(id % 3 === 1, ":8080").otherwise(""),
      when(id % 11 === 0, "")
        .otherwise(concat(lit("/Dir"), (id % 4).cast("string"),
          lit("/Page"))),
      when(id % 5 === 0, "?utm_source=feed&z=9&a=1")
        .when(id % 5 === 1, "?b=2&fbclid=XYZ")
        .when(id % 5 === 3, "?gclid=abc&utm_medium=email&ref")
        .when(id % 5 === 4, "?z=9&a=1").otherwise(""),
      when(id % 2 === 0, "#Frag").otherwise(""))
    documents(s, d).select(id.cast("long").as("doc_id"),
      graft.operators.TextAnalysis.canonicalUrl(messy).as("canon_url"))
  }

  /** Host + eTLD+1 extraction ([[graft.operators.TextAnalysis.urlHost]] /
    * `registeredDomain`) — the per-domain-cap grouping key — certified
    * the same way as q_t40: the synthesized URLs carry userinfo, mixed
    * case, ports, multi-label public suffixes and an IPv4 literal, and
    * the oracle states each ground-truth (host, domain) pair in closed
    * form. */
  val qT41RegisteredDomain = Q(
    "q_t41_registered_domain",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CASE WHEN doc_id % 6 = 5
      |            THEN '192.168.' || CAST(doc_id % 8 AS VARCHAR) || '.9'
      |            ELSE 'www.site' || CAST(doc_id % 50 AS VARCHAR) ||
      |                 CASE doc_id % 6
      |                   WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com'
      |                   WHEN 2 THEN '.org'   WHEN 3 THEN '.com.au'
      |                   ELSE '.io' END
      |       END AS host,
      |       CASE WHEN doc_id % 6 = 5
      |            THEN '192.168.' || CAST(doc_id % 8 AS VARCHAR) || '.9'
      |            ELSE 'site' || CAST(doc_id % 50 AS VARCHAR) ||
      |                 CASE doc_id % 6
      |                   WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com'
      |                   WHEN 2 THEN '.org'   WHEN 3 THEN '.com.au'
      |                   ELSE '.io' END
      |       END AS domain
      |FROM documents""".stripMargin) { (s, d) =>
    import graft.operators.TextAnalysis.{registeredDomain, urlHost}
    val id = col("doc_id")
    val host = when(id % 6 === 5,
      concat(lit("192.168."), (id % 8).cast("string"), lit(".9")))
      .otherwise(concat(lit("WWW.SiTe"), (id % 50).cast("string"),
        when(id % 6 === 0, ".Co.UK").when(id % 6 === 1, ".COM")
          .when(id % 6 === 2, ".org").when(id % 6 === 3, ".com.AU")
          .otherwise(".Io")))
    val url = concat(lit("https://"),
      when(id % 4 === 0, "User:Pw@").otherwise(""),
      host,
      when(id % 3 === 1, ":8443").otherwise(""),
      lit("/p"))
    documents(s, d).select(id.cast("long").as("doc_id"),
      urlHost(url).as("host"),
      registeredDomain(urlHost(url)).as("domain"))
  }

  /** The FULL curation pipeline with BOTH corpus-definition stages in
    * one certified composition — the configuration a crawl actually
    * runs: per-source cap (the md5-rank recipe q_t30 certifies
    * standalone) → canonical-URL dedup over a MESSY synthesized URL
    * (scheme/host case, a default :80 port, a utm-only query, and a
    * fragment vary across members of each page group, so the oracle's
    * closed-form `doc_id // 3` page key holds ONLY if
    * [[graft.operators.TextAnalysis.canonicalUrl]] normalizes all four
    * — any canonicalization slip breaks hash equality) → repetition →
    * exact-verified near-dup → quality/lang screens → redaction →
    * split, every verdict computed on the capped+deduped corpus exactly
    * as [[graft.operators.Curation.pipeline]] stages it. */
  val qT42PipelineCorpusDef = Q(
    "q_t42_pipeline_corpus_def",
    """WITH capped AS (
      |  SELECT doc_id, text FROM (
      |    SELECT doc_id, text,
      |           row_number() OVER (PARTITION BY source
      |             ORDER BY md5('cap' || CAST(doc_id AS VARCHAR)), doc_id)
      |             AS rn
      |    FROM documents) WHERE rn <= 18),
      |docs0 AS (
      |  SELECT c.doc_id, c.text FROM capped c
      |  JOIN (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
      |        FROM capped GROUP BY doc_id // 3) k USING (doc_id)),
      |g AS (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 2
      |           THEN list_transform(range(1, len(t)),
      |                  i -> t[i] || ' ' || t[i+1])
      |           ELSE [] END) AS gm
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM docs0)),
      |cg AS (SELECT doc_id, gm, CAST(count(*) AS BIGINT) AS cnt
      |       FROM g GROUP BY 1, 2),
      |rep AS (SELECT doc_id FROM (
      |          SELECT doc_id, CAST(max(cnt) AS DOUBLE)
      |                           / CAST(sum(cnt) AS BIGINT) AS frac
      |          FROM cg GROUP BY 1)
      |        WHERE frac < 0.05),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |         FROM docs0),
      |tg AS (SELECT DISTINCT doc_id, tg FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE [array_to_string(t, ' ')] END) AS tg
      |  FROM toks)),
      |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
      |       FROM tg GROUP BY doc_id),
      |sh AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |              CAST(count(*) AS BIGINT) AS shared
      |       FROM tg a JOIN tg b
      |         ON a.tg = b.tg AND a.doc_id < b.doc_id
      |       GROUP BY 1, 2),
      |losers AS (SELECT DISTINCT doc_b AS doc_id
      |           FROM sh JOIN sz x ON doc_a = x.doc_id
      |                   JOIN sz y ON doc_b = y.doc_id
      |           WHERE CAST(shared AS DOUBLE) / (x.n + y.n - shared) >= 0.8),
      |q AS (SELECT doc_id,
      |        0.4 * least(1.0, nn / 80.0) + 0.3 * (u / nn)
      |          + 0.3 * least(1.0, (st / nn) * 5.0) AS quality,
      |        CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr
      |               THEN 'en'
      |             WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
      |             WHEN de > 0 AND de >= fr THEN 'de'
      |             WHEN fr > 0 THEN 'fr'
      |             ELSE 'und' END AS pred_lang
      |      FROM (SELECT doc_id,
      |              CAST(len(string_split(text, ' ')) AS DOUBLE) AS nn,
      |              CAST(len(list_distinct(string_split(text, ' ')))
      |                   AS DOUBLE) AS u,
      |              CAST(len(list_filter(string_split(text, ' '),
      |                     w -> w IN ('the','a','of','and','to')))
      |                   AS DOUBLE) AS st,
      |              len(list_filter(string_split(text,' '),
      |                w -> w IN ('the','a','of','and','to'))) AS en,
      |              len(list_filter(string_split(text,' '),
      |                w -> w IN ('el','la','los','que','y'))) AS es,
      |              len(list_filter(string_split(text,' '),
      |                w -> w IN ('der','die','das','und','ist'))) AS de,
      |              len(list_filter(string_split(text,' '),
      |                w -> w IN ('le','les','des','et','est'))) AS fr
      |            FROM docs0)),
      |clean AS (SELECT doc_id,
      |            regexp_replace(regexp_replace(text,
      |              '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
      |              '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS clean_text
      |          FROM docs0),
      |split AS (SELECT doc_id,
      |            CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
      |                   BETWEEN '0' AND 'b' THEN 'train'
      |                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
      |                   BETWEEN 'c' AND 'd' THEN 'val'
      |                 ELSE 'test' END AS split
      |          FROM docs0)
      |SELECT q.doc_id, q.pred_lang, q.quality, split.split,
      |       clean.clean_text
      |FROM q JOIN rep ON q.doc_id = rep.doc_id
      |       JOIN clean ON q.doc_id = clean.doc_id
      |       JOIN split ON q.doc_id = split.doc_id
      |WHERE q.quality >= 0.5 AND q.pred_lang = 'en'
      |  AND q.doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin) {
    (s, d) =>
      val id = col("doc_id")
      // members of page group doc_id//3 spell the SAME page four ways:
      // scheme/host case, an explicit default port, a tracking-only
      // query, a fragment — canonicalization must collapse all of them
      val messy = concat(
        when(id % 2 === 0, "HTTP").otherwise("http"), lit("://"),
        when(id % 2 === 0, "Docs.Example.COM")
          .otherwise("docs.example.com"),
        when(id % 3 === 0, ":80").otherwise(""),
        lit("/p/"), floor(id / 3).cast("long").cast("string"),
        when(id % 2 === 0, "?utm_source=x").otherwise(""),
        when(id % 5 === 0, "#frag").otherwise(""))
      graft.operators.Curation.pipeline(
        documents(s, d).withColumn("url", messy), "doc_id", "text",
        graft.operators.Curation.Config(
          maxPerSource = Some(("source", 18)),
          urlDedup = Some("url"))).df
  }

  /** HTML → text extraction ([[graft.operators.TextAnalysis.extractText]])
    * hash-certified: each document's text is wrapped in a full synthetic
    * page — comment, style and script subtrees (one script body even
    * contains `<p>` markup that must NOT leak), attribute-bearing block
    * tags, named + decimal + hex character references, an NBSP thousands
    * separator, and (every 5th doc) an UNTERMINATED trailing script that
    * must swallow to end-of-input. The oracle replays the identical
    * RE2-compatible regexp chain in DuckDB, with the entity subset as a
    * replace() chain rewriting `&amp;` LAST (= the kernel's one-pass
    * no-rescan semantics); general numeric decode is spec-pinned in
    * HtmlExtractSpec. */
  /** The q_t43/q_t45 shared replay: synthetic page build + the
    * identical nine-stage extraction chain, as one DuckDB query over
    * `documents`. q_t45 reuses it VERBATIM because the WARC round trip
    * composed in front is byte-identity on the payload. */
  private def htmlExtractOracle: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    '<html><head><title>Doc</title><!-- hidden '
      |      || CAST(doc_id AS VARCHAR) || ' -->'
      |      || '<style type="text/css">p { color: #fff; }</style>'
      |      || '<script>var x = "<p>nope</p>";</script></head>'
      |      || '<body><h1 class="t" data-n="'
      |      || CAST(doc_id % 10 AS VARCHAR) || '">Heading '
      |      || CAST(doc_id % 10 AS VARCHAR) || '</h1>'
      |      || '<p>' || text || '</p>'
      |      || CASE WHEN doc_id % 3 = 0
      |           THEN '<ul><li>alpha &amp; beta</li>'
      |                || '<li>&lt;tag&gt; &quot;q&quot;</li></ul>'
      |           ELSE '' END
      |      || CASE WHEN doc_id % 4 = 1
      |           THEN '<div>caf&eacute; &#65;&#x42;C 1&nbsp;000</div>'
      |           ELSE '' END
      |      || CASE WHEN doc_id % 5 = 2
      |           THEN '<script>late = 1; // unterminated'
      |           ELSE '</body></html>' END AS html
      |  FROM documents),
      |s1 AS (SELECT doc_id,
      |         regexp_replace(html, '(?s)<!--.*?(-->|\z)', ' ', 'g') AS t
      |       FROM h),
      |s2 AS (SELECT doc_id, regexp_replace(t,
      |         '(?is)<script\b[^>]*>.*?(</script\s*>|\z)', ' ', 'g') AS t
      |       FROM s1),
      |s3 AS (SELECT doc_id, regexp_replace(t,
      |         '(?is)<style\b[^>]*>.*?(</style\s*>|\z)', ' ', 'g') AS t
      |       FROM s2),
      |s4 AS (SELECT doc_id, regexp_replace(t,
      |         '(?i)</?(p|div|br|hr|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th|blockquote|pre|section|article|aside|header|footer|nav|form|figure|figcaption|main|address)\b[^>]*>',
      |         chr(10), 'g') AS t FROM s3),
      |s5 AS (SELECT doc_id,
      |         regexp_replace(t, '(?s)<[^>]*>', ' ', 'g') AS t FROM s4),
      |s6 AS (SELECT doc_id,
      |         replace(replace(replace(replace(replace(replace(replace(
      |           replace(t,
      |           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |           '&eacute;', chr(233)), '&#65;', 'A'), '&#x42;', 'B'),
      |           '&nbsp;', chr(160)), '&amp;', '&') AS t FROM s5),
      |s7 AS (SELECT doc_id, regexp_replace(t,
      |         '[ \t\x0B\f\r\x{A0}]+', ' ', 'g') AS t FROM s6),
      |s8 AS (SELECT doc_id,
      |         regexp_replace(t, ' ?\n ?', chr(10), 'g') AS t FROM s7)
      |SELECT doc_id,
      |       trim(regexp_replace(t, '\n+', chr(10), 'g'),
      |            ' ' || chr(10)) AS txt
      |FROM s8""".stripMargin

  /** The engine-side synthetic page of [[htmlExtractOracle]]'s `h` CTE:
    * comment/style/script subtrees, attribute-bearing block tags, named
    * + numeric character references, and (every 5th doc) an
    * unterminated trailing script. */
  private def syntheticPage: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    concat(
      lit("<html><head><title>Doc</title><!-- hidden "),
      id.cast("string"), lit(" -->"),
      lit("<style type=\"text/css\">p { color: #fff; }</style>"),
      lit("<script>var x = \"<p>nope</p>\";</script></head>"),
      lit("<body><h1 class=\"t\" data-n=\""), (id % 10).cast("string"),
      lit("\">Heading "), (id % 10).cast("string"), lit("</h1>"),
      lit("<p>"), col("text"), lit("</p>"),
      when(id % 3 === 0,
        "<ul><li>alpha &amp; beta</li>" +
          "<li>&lt;tag&gt; &quot;q&quot;</li></ul>").otherwise(""),
      when(id % 4 === 1,
        "<div>caf&eacute; &#65;&#x42;C 1&nbsp;000</div>").otherwise(""),
      when(id % 5 === 2, "<script>late = 1; // unterminated")
        .otherwise("</body></html>"))
  }

  val qT43HtmlExtract = Q("q_t43_html_extract", htmlExtractOracle) {
    (s, d) =>
      documents(s, d).select(col("doc_id"),
        graft.operators.TextAnalysis.extractText(syntheticPage).as("txt"))
  }

  /** The crawl story END TO END, hash-certified: the q_t43 synthetic
    * pages are framed as HTTP-200 responses in a member-per-record gzip
    * WARC archive by the distributed [[graft.sources.WarcIO.warcSave]]
    * writer, read back through the `graft-warc` DSv2 source, UTF-8
    * decoded, and extracted with [[graft.operators.TextAnalysis
    * .extractText]] — writer framing, envelope parse, explicit
    * multi-member gunzip, Content-Length byte framing, payload decode
    * and the whole nine-stage extraction chain in ONE certified
    * composition. The oracle is [[htmlExtractOracle]] VERBATIM: a
    * correct WARC round trip is byte-identity on the payload, so the
    * composed result must hash-match plain extraction. */
  val qT45CrawlExtract = Q("q_t45_crawl_extract", htmlExtractOracle) {
    (s, d) =>
      val tmp =
        java.nio.file.Files.createTempDirectory("graft_crawl_q").toString
      graft.sources.WarcIO.warcSave(
        documents(s, d).select(
          concat(lit("https://crawl.example/p/"),
            col("doc_id").cast("string")).as("target_uri"),
          lit("2026-01-01T00:00:00Z").as("warc_date"),
          concat(lit("<urn:crawl:"), col("doc_id").cast("string"),
            lit(">")).as("record_id"),
          lit("text/html; charset=utf-8").as("http_content_type"),
          encode(syntheticPage, "UTF-8").as("payload"))
          .repartition(8),
        tmp)
      s.read.format("graft-warc").load(tmp)
        .filter(col("warc_type") === "response")
        .select(
          regexp_extract(col("target_uri"), "p/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          graft.operators.TextAnalysis.extractText(
            decode(col("payload"), "UTF-8")).as("txt"))
  }

  /** Status-GATED crawl extraction, hash-certified: the q_t45
    * composition with the archive carrying each capture's REAL HTTP
    * status (301/404/503 captures interleaved, the shape of any real
    * crawl) and the curation side keeping only `http_status = 200`
    * before extracting. The status gate runs on the parsed status-line
    * CODE the reader recovered — certifying that non-200 records ride
    * through the round trip without disturbing their neighbors and
    * that the filter is the one a real pipeline writes. Oracle =
    * [[htmlExtractOracle]] restricted to the 200 class closed-form. */
  val qT46StatusGatedExtract = Q(
    "q_t46_status_gated_extract",
    // NO stripMargin around the embedded oracle: its '||' concat lines
    // would lose a pipe to margin stripping
    "SELECT * FROM (\n" + htmlExtractOracle +
      "\n) WHERE doc_id % 4 = 0") { (s, d) =>
    val tmp =
      java.nio.file.Files.createTempDirectory("graft_sgate_q").toString
    graft.sources.WarcIO.warcSave(
      documents(s, d).select(
        concat(lit("https://crawl.example/p/"),
          col("doc_id").cast("string")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:crawl:"), col("doc_id").cast("string"),
          lit(">")).as("record_id"),
        lit("text/html; charset=utf-8").as("http_content_type"),
        encode(syntheticPage, "UTF-8").as("payload"),
        when(col("doc_id") % 4 === 0, 200)
          .when(col("doc_id") % 4 === 1, 301)
          .when(col("doc_id") % 4 === 2, 404)
          .otherwise(503).as("status"))
        .repartition(8),
      tmp, httpStatus = Some("status"))
    s.read.format("graft-warc").load(tmp)
      .filter(col("warc_type") === "response"
        && col("http_status") === 200)
      .select(
        regexp_extract(col("target_uri"), "p/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        graft.operators.TextAnalysis.extractText(
          decode(col("payload"), "UTF-8")).as("txt"))
  }

  /** robots.txt fetch-policy evaluation (RFC 9309), HASH-CERTIFIED —
    * the policy half of crawl curation: per document a synthetic
    * robots.txt with a `*` group (prefix Disallow + `$`-anchored Allow)
    * and a mixed-case bot group (wildcard Disallow, longer Allow,
    * Crawl-delay), evaluated through [[graft.operators.Robots
    * .robotsVerdict]] for both a case-folded agent match and the `*`
    * fallback. The three certified columns pin group selection,
    * case-insensitivity, wildcard + `$` matching, longest-match
    * precedence with the Allow tie-break, and Crawl-delay extraction —
    * the oracle restates every verdict closed-form from the id
    * arithmetic the synthetic file was built from. */
  val qT47Robots = Q(
    "q_t47_robots",
    """SELECT doc_id,
      |       doc_id % 3 <> doc_id % 7 AS allowed_bot,
      |       CAST(doc_id % 5 AS DOUBLE) + 0.5 AS crawl_delay,
      |       doc_id % 2 = 0 AS allowed_star
      |FROM documents""".stripMargin) { (s, d) =>
    import graft.operators.Robots
    val robots = concat(
      lit("# synthetic policy\nUser-agent: *\nDisallow: /private\n"),
      lit("Allow: /private/ok$\n\nUser-agent: GraftBot\nDisallow: /p/"),
      (col("doc_id") % 7).cast("string"), lit("*\nAllow: /p/"),
      (col("doc_id") % 7).cast("string"),
      lit("/keep\nCrawl-delay: "), (col("doc_id") % 5).cast("string"),
      lit(".5\n"))
    val botVerdict = Robots.robotsVerdict(robots, lit("GRAFTBOT"),
      concat(lit("/p/"), (col("doc_id") % 3).cast("string"), lit("/x")))
    documents(s, d).select(
      col("doc_id"),
      botVerdict.getField("allowed").as("allowed_bot"),
      botVerdict.getField("crawl_delay").as("crawl_delay"),
      Robots.robotsAllows(robots, lit("otherbot"),
        concat(lit("/private/ok"),
          when(col("doc_id") % 2 === 0, "").otherwise("x")))
        .as("allowed_star"))
  }

  /** Outlink extraction + RFC 3986 resolution, HASH-CERTIFIED — the
    * frontier-feeding head of the crawl loop: per document a synthetic
    * page carries an absolute anchor, a root-relative one, a
    * dot-segment relative one (`../`), a same-directory query link
    * whose `&amp;` must entity-decode, and two non-fetchables
    * (fragment-only, `javascript:`) that must drop.
    * [[graft.operators.Outlinks.extractOutlinks]] explodes one row per
    * resolved link; the oracle restates all four survivors closed-form
    * from the id arithmetic — pinning quote handling, entity decode,
    * RFC 3986 merge + dot-segment removal, and the non-fetchable
    * filter. */
  val qT48Outlinks = Q(
    "q_t48_outlinks",
    """SELECT doc_id, 'https://ext.example/x/'
      |         || CAST(doc_id % 9 AS VARCHAR) AS outlink FROM documents
      |UNION ALL SELECT doc_id, 'https://crawl.example/r/'
      |         || CAST(doc_id % 5 AS VARCHAR) FROM documents
      |UNION ALL SELECT doc_id, 'https://crawl.example/a/u/'
      |         || CAST(doc_id % 3 AS VARCHAR) FROM documents
      |UNION ALL SELECT doc_id, 'https://crawl.example/a/b/q.html?x=1&y=2'
      |         FROM documents""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val page = concat(
      lit("<html><body><a href=\"https://ext.example/x/"),
      (col("doc_id") % 9).cast("string"), lit("\">e</a>"),
      lit("<a href='/r/"), (col("doc_id") % 5).cast("string"),
      lit("'>r</a><a href=\"../u/"), (col("doc_id") % 3).cast("string"),
      lit("\">u</a><a href=\"q.html?x=1&amp;y=2\">q</a>"),
      lit("<a href=\"#top\">t</a>"),
      lit("<a href=\"javascript:void(0)\">j</a></body></html>"))
    Outlinks.extractOutlinks(
      documents(s, d).select(col("doc_id"), page.as("html"),
        concat(lit("https://crawl.example/a/b/p"),
          col("doc_id").cast("string"), lit(".html")).as("base_uri")),
      "html", "base_uri")
      .select(col("doc_id"), col("outlink"))
  }

  /** Crawl-frontier derivation, HASH-CERTIFIED — outlinks →
    * canonicalize → drop seen → (url, host, registered domain): the
    * operator a scheduler shards by. Seen set = the `/r/0`,`/r/1`
    * canonical forms, so exactly those two outlink classes must
    * vanish; the oracle derives every surviving frontier row from the
    * residue classes `documents` actually contains (data-dependent,
    * not a constant table). Pins the distinct + left-anti plan, the
    * canonical-form join key, and the host/eTLD+1 derivation. */
  val qT49Frontier = Q(
    "q_t49_frontier",
    """WITH m9 AS (SELECT DISTINCT doc_id % 9 AS v FROM documents),
      |     m5 AS (SELECT DISTINCT doc_id % 5 AS v FROM documents
      |            WHERE doc_id % 5 >= 2),
      |     m3 AS (SELECT DISTINCT doc_id % 3 AS v FROM documents)
      |SELECT 'https://ext.example/x/' || CAST(v AS VARCHAR)
      |         AS frontier_url,
      |       'ext.example' AS url_host,
      |       'ext.example' AS registered_domain FROM m9
      |UNION ALL SELECT 'https://crawl.example/r/' || CAST(v AS VARCHAR),
      |       'crawl.example', 'crawl.example' FROM m5
      |UNION ALL SELECT 'https://crawl.example/a/u/' || CAST(v AS VARCHAR),
      |       'crawl.example', 'crawl.example' FROM m3
      |UNION ALL SELECT 'https://crawl.example/a/b/q.html?x=1&y=2',
      |       'crawl.example', 'crawl.example'""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val page = concat(
      lit("<html><body><a href=\"https://ext.example/x/"),
      (col("doc_id") % 9).cast("string"), lit("\">e</a>"),
      lit("<a href='/r/"), (col("doc_id") % 5).cast("string"),
      lit("'>r</a><a href=\"../u/"), (col("doc_id") % 3).cast("string"),
      lit("\">u</a><a href=\"q.html?x=1&amp;y=2\">q</a></body></html>"))
    val links = Outlinks.extractOutlinks(
      documents(s, d).select(col("doc_id"), page.as("html"),
        concat(lit("https://crawl.example/a/b/p"),
          col("doc_id").cast("string"), lit(".html")).as("base_uri")),
      "html", "base_uri")
    val seen = s.range(2).select(
      concat(lit("https://crawl.example/r/"), col("id").cast("string"))
        .as("url"))
    Outlinks.crawlFrontier(links, "outlink", seen, "url")
  }

  /** Sitemap parsing (sitemaps.org protocol), HASH-CERTIFIED — the
    * other frontier feed: per document either a `<sitemapindex>` (every
    * 4th id) or a two-entry `<urlset>` whose second entry omits
    * optional fields. [[graft.operators.Outlinks.sitemapEntries]]
    * parses both shapes through Spark's native `from_xml` and explodes
    * one row per entry; the oracle restates every loc/lastmod/
    * changefreq/priority and the is_index flag closed-form — pinning
    * shape dispatch, optional-element nulls, and the numeric priority
    * cast. */
  val qT50Sitemap = Q(
    "q_t50_sitemap",
    """SELECT 'https://s.example/maps/' || CAST(doc_id AS VARCHAR)
      |         || '.xml' AS loc,
      |       '2026-01-15' AS lastmod, CAST(NULL AS VARCHAR) AS changefreq,
      |       CAST(NULL AS DOUBLE) AS priority, TRUE AS is_index
      |FROM documents WHERE doc_id % 4 = 0
      |UNION ALL
      |SELECT 'https://s.example/p/' || CAST(doc_id AS VARCHAR),
      |       '2026-02-01', 'weekly',
      |       CAST(doc_id % 10 AS DOUBLE) / 10, FALSE
      |FROM documents WHERE doc_id % 4 <> 0
      |UNION ALL
      |SELECT 'https://s.example/q/' || CAST(doc_id % 6 AS VARCHAR),
      |       NULL, 'monthly', NULL, FALSE
      |FROM documents WHERE doc_id % 4 <> 0""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val xml = when(col("doc_id") % 4 === 0, concat(
      lit("<sitemapindex><sitemap><loc>https://s.example/maps/"),
      col("doc_id").cast("string"),
      lit(".xml</loc><lastmod>2026-01-15</lastmod></sitemap>" +
        "</sitemapindex>")))
      .otherwise(concat(
        lit("<urlset><url><loc>https://s.example/p/"),
        col("doc_id").cast("string"),
        lit("</loc><lastmod>2026-02-01</lastmod>" +
          "<changefreq>weekly</changefreq><priority>0."),
        (col("doc_id") % 10).cast("string"),
        lit("</priority></url><url><loc>https://s.example/q/"),
        (col("doc_id") % 6).cast("string"),
        lit("</loc><changefreq>monthly</changefreq></url></urlset>")))
    Outlinks.sitemapEntries(
      documents(s, d).select(col("doc_id"), xml.as("xml")), "xml")
  }

  /** Per-host robots GATE, HASH-CERTIFIED — the join shape a real
    * pipeline runs: policies live once per host (here hosts 0–3 each
    * disallow `/p/<their index>`; host 4 has NO stored policy), pages
    * join to their host's policy and survive iff allowed — so a page
    * survives when its host is the policy-less h4 (default-allow) or
    * its path index differs from its host index. The oracle restates
    * that survival set closed-form; a broken host join, path
    * extraction, or default-allow arm each flips rows. */
  val qT51RobotsGate = Q(
    "q_t51_robots_gate",
    """SELECT doc_id,
      |       'https://h' || CAST(doc_id % 5 AS VARCHAR)
      |         || '.example/p/' || CAST(doc_id % 7 AS VARCHAR)
      |         AS target_uri
      |FROM documents
      |WHERE doc_id % 5 = 4 OR doc_id % 7 <> doc_id % 5""".stripMargin) {
    (s, d) =>
      import graft.operators.Robots
      val pages = documents(s, d).select(col("doc_id"),
        concat(lit("https://h"), (col("doc_id") % 5).cast("string"),
          lit(".example/p/"), (col("doc_id") % 7).cast("string"))
          .as("target_uri"))
      val policies = s.range(4).select(
        concat(lit("h"), col("id").cast("string"), lit(".example"))
          .as("host"),
        concat(lit("User-agent: *\nDisallow: /p/"),
          col("id").cast("string")).as("robots"))
      Robots.gateByPolicy(pages, "target_uri", policies, "host",
        "robots", "graftbot")
  }

  /** Charset-aware payload decoding, HASH-CERTIFIED — the most common
    * real-crawl correctness hazard: per document one of six
    * byte-level fixtures built in-plane from `encode`/`unhex` —
    * header-declared UTF-8, header-declared windows-1252 (0xE9/0x80 →
    * é/€), meta-prescan windows-1252 (0x93/0x94 → curly quotes), a
    * UTF-16LE BOM beating a LYING utf-8 header, undeclared-but-valid
    * UTF-8 (validity sniff), and undeclared cp1252 (the HTML5
    * default). [[graft.operators.CharsetDecode.charsetDecoded]]
    * detects + decodes; the oracle restates both the detected charset
    * and the decoded text closed-form per residue class — any
    * precedence slip (header over BOM, default over sniff) flips
    * rows. */
  val qT52CharsetDecode = Q(
    "q_t52_charset_decode",
    """SELECT doc_id, doc_id % 6 AS case_id,
      |  CASE doc_id % 6
      |    WHEN 0 THEN 'UTF-8' WHEN 1 THEN 'windows-1252'
      |    WHEN 2 THEN 'windows-1252' WHEN 3 THEN 'UTF-16LE'
      |    WHEN 4 THEN 'UTF-8' ELSE 'windows-1252' END AS charset,
      |  CASE doc_id % 6
      |    WHEN 0 THEN '<html>d' || CAST(doc_id AS VARCHAR) || ' é€</html>'
      |    WHEN 1 THEN '<html>d' || CAST(doc_id AS VARCHAR) || ' é€</html>'
      |    WHEN 2 THEN '<meta charset="windows-1252">d'
      |                  || CAST(doc_id AS VARCHAR) || ' “”'
      |    WHEN 3 THEN '<html>d' || CAST(doc_id AS VARCHAR) || ' π</html>'
      |    WHEN 4 THEN '<html>d' || CAST(doc_id AS VARCHAR)
      |                  || ' héllo ✓</html>'
      |    ELSE 'd' || CAST(doc_id AS VARCHAR) || ' café' END AS text
      |FROM documents""".stripMargin) { (s, d) =>
    import graft.operators.CharsetDecode
    val m = col("doc_id") % 6
    val idStr = col("doc_id").cast("string")
    def ascii(c: org.apache.spark.sql.Column) = encode(c, "ISO-8859-1")
    val ct = when(m === 0, lit("text/html; charset=utf-8"))
      .when(m === 1, lit("text/html; charset=windows-1252"))
      .when(m === 3, lit("text/html; charset=utf-8")) // lies — BOM wins
      .when(m === 5, lit(null).cast("string"))
      .otherwise(lit("text/html"))
    val payload = when(m === 0,
        encode(concat(lit("<html>d"), idStr, lit(" é€</html>")), "UTF-8"))
      .when(m === 1, concat(ascii(concat(lit("<html>d"), idStr, lit(" "))),
        unhex(lit("E980")), ascii(lit("</html>"))))
      .when(m === 2, concat(
        ascii(concat(lit("<meta charset=\"windows-1252\">d"), idStr,
          lit(" "))), unhex(lit("9394"))))
      .when(m === 3, concat(unhex(lit("FFFE")),
        encode(concat(lit("<html>d"), idStr, lit(" π</html>")),
          "UTF-16LE")))
      .when(m === 4, encode(
        concat(lit("<html>d"), idStr, lit(" héllo ✓</html>")), "UTF-8"))
      .otherwise(concat(ascii(concat(lit("d"), idStr, lit(" caf"))),
        unhex(lit("E9"))))
    val dec = CharsetDecode.charsetDecoded(payload, ct)
    documents(s, d).select(col("doc_id"), m.as("case_id"),
      dec.getField("charset").as("charset"),
      dec.getField("text").as("text"))
  }

  /** Politeness-aware fetch plan, HASH-CERTIFIED — frontier × per-host
    * robots → allowed URLs with per-host fetch sequence and earliest
    * offset: hosts 0–3 disallow paths ending in their own index
    * (wildcard + `$` anchor through the gate) and ask for
    * `Crawl-delay: <index>` (host 0's 0 s clamps to the 1 s floor);
    * host 4 has no policy (default-allow at the floor). The oracle
    * restates the gate closed-form and recomputes the sequence with an
    * independent `ROW_NUMBER() OVER (PARTITION BY host ORDER BY url)`
    * window — certifying that [[graft.operators.Skew.rankWithinKey]]'s
    * range-partitioned two-level rank (no task ever sorts a whole
    * host) EQUALS the naive group-sized window. */
  val qT53FetchPlan = Q(
    "q_t53_fetch_plan",
    """WITH f AS (
      |  SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR)
      |           || '.example/u/' || CAST(doc_id AS VARCHAR)
      |           AS frontier_url,
      |         'h' || CAST(doc_id % 5 AS VARCHAR) || '.example'
      |           AS url_host,
      |         doc_id % 5 AS h, doc_id % 10 AS last
      |  FROM documents),
      | g AS (SELECT frontier_url, url_host,
      |              CASE WHEN h = 4 THEN CAST(1.0 AS DOUBLE)
      |                   ELSE GREATEST(CAST(h AS DOUBLE), 1.0) END
      |                AS crawl_delay
      |       FROM f WHERE h = 4 OR last <> h)
      |SELECT frontier_url, url_host, crawl_delay,
      |       ROW_NUMBER() OVER (PARTITION BY url_host
      |                          ORDER BY frontier_url) AS fetch_seq,
      |       (ROW_NUMBER() OVER (PARTITION BY url_host
      |                           ORDER BY frontier_url) - 1)
      |         * crawl_delay AS fetch_offset
      |FROM g""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val frontier = documents(s, d).select(
      concat(lit("https://h"), (col("doc_id") % 5).cast("string"),
        lit(".example/u/"), col("doc_id").cast("string"))
        .as("frontier_url"))
    val policies = s.range(4).select(
      concat(lit("h"), col("id").cast("string"), lit(".example"))
        .as("host"),
      concat(lit("User-agent: *\nDisallow: /u/*"),
        col("id").cast("string"), lit("$\nCrawl-delay: "),
        col("id").cast("string")).as("robots"))
    Outlinks.fetchPlan(frontier, "frontier_url", policies, "host",
      "robots", "graftbot")
  }

  /** The q_t54 oracle: power iteration UNROLLED as one CTE per round —
    * no recursion, no engine-specific constructs, each round a
    * correlated inflow sum per node. Semantics mirror
    * [[graft.operators.LinkGraph.pageRank]] exactly (uniform 1/N
    * start, multi-edges deduped upstream, self-loops ordinary,
    * dangling mass leaks). */
  /** Every CTE is MATERIALIZED and every round is a plain
    * join + GROUP BY (no correlated subqueries): a chain of inlined
    * CTEs would otherwise re-expand the whole prior-round tree per
    * reference and the oracle's cost would grow exponentially with the
    * iteration count (observed: the correlated form of the q_t58
    * oracle never finished). */
  private def pageRankOracleSql(edgeSelect: String, iters: Int,
      redistribute: Boolean = false,
      /** final projection over the CTE chain (sees `e` and `r<iters>`);
        * None = the plain per-node rank dump */
      finalSelect: Option[String] = None,
      /** r0 body (sees `nodes` and `nn`; must emit node, pr) for
        * warm-started runs; None = the uniform 1/N start. Like
        * edgeSelect, no line may BEGIN with `|`. */
      r0Select: Option[String] = None): String = {
    val rounds = (1 to iters).map { k =>
      val leakCte = if (!redistribute) "" else
        s""" l$k AS MATERIALIZED (
           |   SELECT COALESCE(SUM(p.pr), CAST(0 AS DOUBLE)) AS l
           |   FROM r${k - 1} p JOIN dang d ON d.node = p.node),
           |""".stripMargin
      // association matches the engine exactly: LinkGraph.scala computes
      // lit(damping / n) * leak, i.e. (0.85 / n) first — SQL's
      // left-assoc `0.85 / n * l` is the same IEEE sequence, so the two
      // sides agree bit-for-bit instead of leaning on the hash canon to
      // absorb an ulp drift
      val leakTerm = if (!redistribute) "" else
        s"""
           |          + CAST(0.85 AS DOUBLE) / (SELECT n FROM nn)
           |            * (SELECT l FROM l$k)""".stripMargin
      s"""$leakCte r$k AS MATERIALIZED (
         |   SELECT n.node,
         |          CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
         |          + CAST(0.85 AS DOUBLE)
         |            * COALESCE(s.v, CAST(0 AS DOUBLE))$leakTerm AS pr
         |   FROM nodes n LEFT JOIN (
         |     SELECT e.dst AS node, SUM(p.pr / od.outdeg) AS v
         |     FROM e JOIN r${k - 1} p ON p.node = e.src
         |            JOIN od ON od.src = e.src
         |     GROUP BY e.dst) s ON s.node = n.node)""".stripMargin
    }.mkString(",\n")
    val dangCte = if (!redistribute) "" else
      """ dang AS MATERIALIZED (
        |   SELECT node FROM nodes EXCEPT SELECT DISTINCT src FROM e),
        |""".stripMargin
    s"""WITH e AS MATERIALIZED (
       |$edgeSelect),
       | nodes AS MATERIALIZED (
       |   SELECT src AS node FROM e UNION SELECT dst FROM e),
       | od AS MATERIALIZED (
       |   SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg
       |   FROM e GROUP BY src),
       | nn AS MATERIALIZED (
       |   SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
       |$dangCte r0 AS MATERIALIZED (
       |   ${r0Select.getOrElse(
             "SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS pr" +
               "\n   FROM nodes")}),
       |$rounds
       |${finalSelect.getOrElse(s"SELECT node, pr FROM r$iters")}""".stripMargin
  }

  /** PageRank over a synthetic host graph, HASH-CERTIFIED — the
    * frontier-prioritization signal ([[graft.operators.LinkGraph
    * .pageRank]], 5 power-iteration rounds, d = 0.85) on a graph with
    * genuinely varied in/out-degrees (two residue maps over the
    * documents table, self-loops included) against the closed-form
    * unrolled oracle. Certifies the join-shaped update, out-degree
    * weighting, dangling-leak semantics, and the per-iteration
    * numerical path end to end. */
  val qT54PageRank = Q(
    "q_t54_pagerank",
    pageRankOracleSql(
      """  SELECT DISTINCT src, dst FROM (
        |    SELECT 'h' || CAST(doc_id % 97 AS VARCHAR) AS src,
        |           'h' || CAST((doc_id * 7 + 3) % 97 AS VARCHAR) AS dst
        |    FROM documents
        |    UNION ALL
        |    SELECT 'h' || CAST(doc_id % 97 AS VARCHAR),
        |           'h' || CAST(doc_id % 89 AS VARCHAR)
        |    FROM documents)""".stripMargin, 5)) { (s, d) =>
    val docs = documents(s, d)
    def m(n: Int, expr: org.apache.spark.sql.Column) =
      concat(lit("h"), (expr % n).cast("string"))
    val e = docs.select(m(97, col("doc_id")).as("src"),
        m(97, col("doc_id") * 7 + 3).as("dst"))
      .union(docs.select(m(97, col("doc_id")).as("src"),
        m(89, col("doc_id")).as("dst")))
      .distinct()
    graft.operators.LinkGraph.pageRank(e, "src", "dst",
      iterations = 5, damping = 0.85)
      .select(col("node"), col("rank").as("pr"))
  }

  /** Anchor-text outlink extraction, HASH-CERTIFIED — one row per
    * closed `<a>` with the resolved URL AND the cleaned inner text
    * ([[graft.operators.Outlinks.extractAnchors]]): nested tags
    * stripped to spaces, entities decoded, whitespace collapsed,
    * empty (image-only) anchors null. The page markup is constructed
    * closed-form from doc_id, so the oracle restates the expected
    * (outlink, anchor_text) rows without replaying the regex. */
  val qT55AnchorText = Q(
    "q_t55_anchor_text",
    """SELECT 'https://h' || CAST(doc_id % 13 AS VARCHAR)
      |         || '.example/p/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |       'https://h' || CAST(doc_id % 13 AS VARCHAR)
      |         || '.example/x/' || CAST(doc_id AS VARCHAR) AS outlink,
      |       'A ' || CAST(doc_id AS VARCHAR) || ' & co' AS anchor_text
      |FROM documents
      |UNION ALL
      |SELECT 'https://h' || CAST(doc_id % 13 AS VARCHAR)
      |         || '.example/p/' || CAST(doc_id AS VARCHAR),
      |       'https://cdn.example/i.png',
      |       CAST(NULL AS VARCHAR)
      |FROM documents""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val uriC = concat(lit("https://h"), (col("doc_id") % 13).cast("string"),
      lit(".example/p/"), col("doc_id").cast("string"))
    val page = concat(
      lit("<html><body><a href=\"/x/"), col("doc_id").cast("string"),
      lit("\"> A  <b>"), col("doc_id").cast("string"),
      lit("</b> &amp; co </a>"),
      lit("<a href='https://cdn.example/i.png'><img src=\"i\"></a>"),
      lit("</body></html>"))
    Outlinks.extractAnchors(
      documents(s, d).select(uriC.as("target_uri"), page.as("html")),
      "html", "target_uri")
      .select("target_uri", "outlink", "anchor_text")
  }

  /** Host-level link rank, HASH-CERTIFIED END TO END — the crawl
    * prioritization composition: page HTML → [[graft.operators
    * .Outlinks.extractOutlinks]] → [[Outlinks.hostGraph]] (distinct
    * cross-host edges, self-votes dropped) → [[graft.operators
    * .LinkGraph.pageRank]] (4 rounds). Pages on 23 source hosts link
    * to 17+11 target-host families (overlapping namespaces, so the
    * graph has real in-degree variance). The oracle recomputes the
    * host edges closed-form from doc_id and unrolls the same 4 power
    * iterations — certifying extraction, host keying, edge dedup, and
    * the rank arithmetic as ONE plan. */
  val qT56HostRank = Q(
    "q_t56_host_rank",
    pageRankOracleSql(
      """  SELECT DISTINCT src, dst FROM (
        |    SELECT 'g' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS src,
        |           'g' || CAST(doc_id % 17 AS VARCHAR) || '.example' AS dst
        |    FROM documents WHERE doc_id % 23 <> doc_id % 17
        |    UNION ALL
        |    SELECT 'g' || CAST(doc_id % 23 AS VARCHAR) || '.example',
        |           'g' || CAST(doc_id % 11 AS VARCHAR) || '.example'
        |    FROM documents WHERE doc_id % 23 <> doc_id % 11)""".stripMargin,
      4)) { (s, d) =>
    import graft.operators.{LinkGraph, Outlinks}
    val uriC = concat(lit("https://g"), (col("doc_id") % 23).cast("string"),
      lit(".example/p/"), col("doc_id").cast("string"))
    val page = concat(
      lit("<html><body><a href=\"https://g"),
      (col("doc_id") % 17).cast("string"), lit(".example/a/"),
      col("doc_id").cast("string"), lit("\">t</a><a href=\"https://g"),
      (col("doc_id") % 11).cast("string"), lit(".example/b/"),
      col("doc_id").cast("string"), lit("\">u</a></body></html>"))
    val links = Outlinks.extractOutlinks(
      documents(s, d).select(uriC.as("target_uri"), page.as("html")),
      "html", "target_uri")
    LinkGraph.pageRank(
      Outlinks.hostGraph(links, "target_uri", "outlink"),
      "src", "dst", iterations = 4, damping = 0.85)
      .select(col("node"), col("rank").as("pr"))
  }

  /** Redirect-edge extraction, HASH-CERTIFIED end to end through the
    * archive: pages write with their real statuses AND captured
    * response headers ([[graft.sources.WarcIO.warcSave]]'s
    * `httpHeaders` map — Location rides the stored HTTP head), read
    * back through `graft-warc`, and [[graft.operators.Outlinks
    * .redirectEdges]] emits one row per 3xx capture with the Location
    * RESOLVED against the capture URI (relative for most rows,
    * absolute cross-host for every 10th — both RFC 7231 forms). The
    * oracle restates the closed form; 200s with headers but no
    * redirect must emit nothing. */
  val qT57Redirects = Q(
    "q_t57_redirects",
    """SELECT 'https://r.example/p/' || CAST(doc_id AS VARCHAR)
      |         AS redirect_from,
      |       CASE WHEN doc_id % 10 = 0
      |            THEN 'https://new.example/n/' || CAST(doc_id AS VARCHAR)
      |            ELSE 'https://r.example/moved/'
      |                 || CAST(doc_id AS VARCHAR) END AS redirect_to,
      |       CAST(301 AS INTEGER) AS http_status
      |FROM documents WHERE doc_id % 5 = 0""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val tmp = java.nio.file.Files.createTempDirectory("graft_redir_q")
      .toString
    val loc = when(col("doc_id") % 10 === 0,
      concat(lit("https://new.example/n/"), col("doc_id").cast("string")))
      .otherwise(concat(lit("/moved/"), col("doc_id").cast("string")))
    graft.sources.WarcIO.warcSave(
      documents(s, d).select(
        concat(lit("https://r.example/p/"), col("doc_id").cast("string"))
          .as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:rd:"), col("doc_id").cast("string"), lit(">"))
          .as("record_id"),
        lit("text/html").as("http_content_type"),
        encode(col("text"), "UTF-8").as("payload"),
        when(col("doc_id") % 5 === 0, 301).otherwise(200).as("status"),
        when(col("doc_id") % 5 === 0,
          map(lit("Location"), loc,
            lit("X-Probe"), col("doc_id").cast("string")))
          .otherwise(map(lit("X-Probe"), col("doc_id").cast("string")))
          .as("headers"))
        .repartition(8),
      tmp, httpStatus = Some("status"), httpHeaders = Some("headers"))
    Outlinks.redirectEdges(
      s.read.format("graft-warc").load(tmp)
        .filter(col("warc_type") === "response"))
  }

  /** The q_t58 oracle: HITS unrolled — per round an authority CTE
    * (inflow of hub mass) and a hub CTE (outflow to authority mass),
    * each L1-normalized via a scalar-subquery total with the zero-sum
    * guard [[graft.operators.LinkGraph.hits]] pins. */
  /** MATERIALIZED + join-form for the same reason as
    * [[pageRankOracleSql]] — the correlated form re-expanded the
    * prior-round tree per reference and never finished. */
  private def hitsOracleSql(edgeSelect: String, iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s""" a${k}r AS MATERIALIZED (
         |   SELECT n.node, COALESCE(s.v, CAST(0 AS DOUBLE)) AS ar
         |   FROM nodes n LEFT JOIN (
         |     SELECT e.dst AS node, SUM(h.hub) AS v
         |     FROM e JOIN h${k - 1} h ON h.node = e.src
         |     GROUP BY e.dst) s ON s.node = n.node),
         | a$k AS MATERIALIZED (
         |   SELECT node, CASE WHEN t.s > 0 THEN ar / t.s
         |                     ELSE CAST(0 AS DOUBLE) END AS authority
         |   FROM a${k}r, (SELECT SUM(ar) AS s FROM a${k}r) t),
         | h${k}r AS MATERIALIZED (
         |   SELECT n.node, COALESCE(s.v, CAST(0 AS DOUBLE)) AS hr
         |   FROM nodes n LEFT JOIN (
         |     SELECT e.src AS node, SUM(a.authority) AS v
         |     FROM e JOIN a$k a ON a.node = e.dst
         |     GROUP BY e.src) s ON s.node = n.node),
         | h$k AS MATERIALIZED (
         |   SELECT node, CASE WHEN t.s > 0 THEN hr / t.s
         |                     ELSE CAST(0 AS DOUBLE) END AS hub
         |   FROM h${k}r, (SELECT SUM(hr) AS s FROM h${k}r) t)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |$edgeSelect),
       | nodes AS MATERIALIZED (
       |   SELECT src AS node FROM e UNION SELECT dst FROM e),
       | nn AS MATERIALIZED (
       |   SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
       | h0 AS MATERIALIZED (
       |   SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS hub
       |   FROM nodes),
       |$rounds
       |SELECT h$iters.node, h$iters.hub, a$iters.authority
       |FROM h$iters JOIN a$iters ON h$iters.node = a$iters.node"""
      .stripMargin
  }

  /** HITS hubs/authorities, HASH-CERTIFIED — the seed-curation
    * complement to q_t54's PageRank ([[graft.operators.LinkGraph
    * .hits]], 3 rounds, L1-normalized) on a residue graph with real
    * in/out-degree variance, against the closed-form unrolled oracle.
    * Certifies both mutual-reinforcement joins, the normalization
    * path, and the zero-inflow coalesce per round. */
  val qT58Hits = Q(
    "q_t58_hits",
    hitsOracleSql(
      """  SELECT DISTINCT src, dst FROM (
        |    SELECT 'h' || CAST(doc_id % 61 AS VARCHAR) AS src,
        |           'h' || CAST((doc_id * 5 + 1) % 61 AS VARCHAR) AS dst
        |    FROM documents
        |    UNION ALL
        |    SELECT 'h' || CAST(doc_id % 61 AS VARCHAR),
        |           'h' || CAST(doc_id % 47 AS VARCHAR)
        |    FROM documents)""".stripMargin, 3)) { (s, d) =>
    val docs = documents(s, d)
    def m(n: Int, expr: org.apache.spark.sql.Column) =
      concat(lit("h"), (expr % n).cast("string"))
    val e = docs.select(m(61, col("doc_id")).as("src"),
        m(61, col("doc_id") * 5 + 1).as("dst"))
      .union(docs.select(m(61, col("doc_id")).as("src"),
        m(47, col("doc_id")).as("dst")))
      .distinct()
    graft.operators.LinkGraph.hits(e, "src", "dst", iterations = 3)
  }

  /** Redirect-chain resolution, HASH-CERTIFIED — [[graft.operators
    * .Outlinks.resolveRedirectChains]] (pointer doubling) on per-doc
    * chains of length doc_id % 4 plus planted 2-cycles on every 31st
    * doc: every chain source must resolve to its chain's terminal and
    * every cycle member must flag `is_cycle` with a null final target.
    * The oracle restates both closed-form. */
  val qT59RedirectChains = Q(
    "q_t59_redirect_chains",
    """WITH r AS (
      |  SELECT 'https://c.example/' || CAST(doc_id AS VARCHAR) || '/'
      |           || CAST(t.i AS VARCHAR) AS redirect_from,
      |         'https://c.example/' || CAST(doc_id AS VARCHAR) || '/'
      |           || CAST(doc_id % 4 AS VARCHAR) AS final_target
      |  FROM documents, range(0, 3) t(i)
      |  WHERE t.i < doc_id % 4)
      |SELECT redirect_from, final_target, FALSE AS is_cycle FROM r
      |UNION ALL
      |SELECT 'https://x.example/' || CAST(doc_id AS VARCHAR),
      |       CAST(NULL AS VARCHAR), TRUE
      |FROM documents WHERE doc_id % 31 = 0
      |UNION ALL
      |SELECT 'https://y.example/' || CAST(doc_id AS VARCHAR),
      |       CAST(NULL AS VARCHAR), TRUE
      |FROM documents WHERE doc_id % 31 = 0""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val docs = documents(s, d)
    def u(i: org.apache.spark.sql.Column) =
      concat(lit("https://c.example/"), col("doc_id").cast("string"),
        lit("/"), i.cast("string"))
    val chains = docs
      .select(col("doc_id"), explode(sequence(lit(0), lit(2))).as("i"))
      .filter(col("i") < col("doc_id") % 4)
      .select(u(col("i")).as("redirect_from"),
        u(col("i") + 1).as("redirect_to"))
    val cyc = docs.filter(col("doc_id") % 31 === 0)
    def xy(p: String) =
      concat(lit(s"https://$p.example/"), col("doc_id").cast("string"))
    val cycEdges = cyc.select(xy("x").as("redirect_from"),
        xy("y").as("redirect_to"))
      .union(cyc.select(xy("y").as("redirect_from"),
        xy("x").as("redirect_to")))
    Outlinks.resolveRedirectChains(chains.union(cycEdges))
  }

  /** Meta-refresh redirect extraction, HASH-CERTIFIED — the in-markup
    * redirect class HTTP headers never see: every 6th doc declares
    * `<meta http-equiv=refresh>` (delay = doc_id % 9, relative url for
    * most, absolute cross-host for every 12th), the rest carry plain
    * meta tags that must emit nothing. The oracle restates the
    * resolved closed form. */
  val qT60MetaRefresh = Q(
    "q_t60_meta_refresh",
    """SELECT 'https://m.example/p/' || CAST(doc_id AS VARCHAR)
      |         AS refresh_from,
      |       CASE WHEN doc_id % 12 = 0
      |            THEN 'https://mv.example/n/' || CAST(doc_id AS VARCHAR)
      |            ELSE 'https://m.example/next/'
      |                 || CAST(doc_id AS VARCHAR) END AS refresh_to,
      |       CAST(doc_id % 9 AS INTEGER) AS refresh_delay
      |FROM documents WHERE doc_id % 6 = 0""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val url = when(col("doc_id") % 12 === 0,
      concat(lit("https://mv.example/n/"), col("doc_id").cast("string")))
      .otherwise(concat(lit("/next/"), col("doc_id").cast("string")))
    // three syntactic variants, one semantic form — every 18th doc
    // uses content-before-http-equiv order, every 18th+12 an unquoted
    // content value; the oracle is variant-blind, so a regex that
    // misses either form drops rows
    val delayC = (col("doc_id") % 9).cast("string")
    val page = when(col("doc_id") % 18 === 6,
      concat(lit("<html><head><meta content=\""), delayC,
        lit(";url="), url,
        lit("\" http-equiv=\"refresh\"></head><body>x</body></html>")))
      .when(col("doc_id") % 18 === 12,
        concat(lit("<html><head><meta http-equiv=refresh content="),
          delayC, lit(";url="), url,
          lit("></head><body>x</body></html>")))
      .when(col("doc_id") % 6 === 0,
        concat(lit("<html><head><meta http-equiv=\"refresh\" content=\""),
          delayC, lit(";url="), url,
          lit("\"></head><body>x</body></html>")))
      .otherwise(lit(
        "<html><head><meta name=\"viewport\" content=\"w\"></head></html>"))
    Outlinks.metaRefreshEdges(
      documents(s, d).select(
        concat(lit("https://m.example/p/"), col("doc_id").cast("string"))
          .as("target_uri"),
        page.as("html")),
      "html", "target_uri")
  }

  /** rel=canonical extraction, HASH-CERTIFIED — the page-declared
    * canonicalization signal: every 4th doc declares a canonical link
    * (alternating attribute order to pin both forms), others carry
    * non-canonical `<link>` tags that must emit nothing. */
  val qT61CanonicalLink = Q(
    "q_t61_canonical_link",
    """SELECT 'https://cl.example/v/' || CAST(doc_id AS VARCHAR)
      |         || '?utm=x' AS page_uri,
      |       'https://cl.example/c/' || CAST(doc_id AS VARCHAR)
      |         AS canonical_uri
      |FROM documents WHERE doc_id % 4 = 0""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val canon = concat(lit("/c/"), col("doc_id").cast("string"))
    val page = when(col("doc_id") % 8 === 0,
      concat(lit("<head><link rel=\"canonical\" href=\""), canon,
        lit("\"></head>")))
      .when(col("doc_id") % 4 === 0,
        concat(lit("<head><link href=\""), canon,
          lit("\" rel=\"canonical\"></head>")))
      .otherwise(lit("<head><link rel=\"stylesheet\" href=\"/s.css\"></head>"))
    Outlinks.canonicalLinkEdges(
      documents(s, d).select(
        concat(lit("https://cl.example/v/"), col("doc_id").cast("string"),
          lit("?utm=x")).as("target_uri"),
        page.as("html")),
      "html", "target_uri")
  }

  /** Robots `Sitemap:` directive discovery, HASH-CERTIFIED — the line
    * a crawler finds its sitemaps through: every 3rd doc's robots.txt
    * declares one absolute sitemap (and every 9th a second), plus a
    * relative junk line that must filter out (the spec requires
    * absolute URLs). One output row per (host, sitemap_url), file
    * order preserved through the explode. */
  val qT62RobotsSitemaps = Q(
    "q_t62_robots_sitemaps",
    """SELECT 'h' || CAST(doc_id AS VARCHAR) || '.example' AS url_host,
      |       'https://h' || CAST(doc_id AS VARCHAR)
      |         || '.example/sm/main.xml' AS sitemap_url
      |FROM documents WHERE doc_id % 3 = 0
      |UNION ALL
      |SELECT 'h' || CAST(doc_id AS VARCHAR) || '.example',
      |       'https://cdn.example/sm/' || CAST(doc_id AS VARCHAR)
      |         || '.xml'
      |FROM documents WHERE doc_id % 9 = 0""".stripMargin) { (s, d) =>
    import graft.operators.Robots
    val robots = when(col("doc_id") % 3 === 0, concat(
      lit("User-agent: *\nDisallow: /private\nSitemap: https://h"),
      col("doc_id").cast("string"), lit(".example/sm/main.xml\n"),
      when(col("doc_id") % 9 === 0,
        concat(lit("sitemap: https://cdn.example/sm/"),
          col("doc_id").cast("string"), lit(".xml\n")))
        .otherwise(lit("")),
      lit("Sitemap: /relative/ignored.xml\n")))
      .otherwise(lit("User-agent: *\nAllow: /\n"))
    documents(s, d)
      .select(concat(lit("h"), col("doc_id").cast("string"),
        lit(".example")).as("url_host"),
        explode(Robots.sitemapUrls(robots)).as("sitemap_url"))
  }

  /** Robots fetch worklist, HASH-CERTIFIED — frontier hosts with no
    * stored policy become one `/robots.txt` fetch URL each: hosts
    * 0–9 hold policies, the frontier spans hosts 0–19, so exactly
    * hosts 10–19 surface. */
  val qT63RobotsFetchList = Q(
    "q_t63_robots_fetch_list",
    """SELECT DISTINCT
      |       'rh' || CAST(doc_id % 20 AS VARCHAR) || '.example'
      |         AS url_host,
      |       'https://rh' || CAST(doc_id % 20 AS VARCHAR)
      |         || '.example/robots.txt' AS robots_url
      |FROM documents WHERE doc_id % 20 >= 10""".stripMargin) { (s, d) =>
    import graft.operators.Robots
    val frontier = documents(s, d).select(
      concat(lit("https://rh"), (col("doc_id") % 20).cast("string"),
        lit(".example/p/"), col("doc_id").cast("string"))
        .as("frontier_url"))
    val policies = s.range(10).select(
      concat(lit("rh"), col("id").cast("string"), lit(".example"))
        .as("host"),
      lit("User-agent: *\nAllow: /").as("robots"))
    Robots.robotsFetchList(frontier, "frontier_url", policies, "host")
  }

  /** Rank-aware fetch plan, HASH-CERTIFIED — the budget-bound
    * crawler's ordering: frontier URLs join a per-URL priority frame
    * (the [[graft.operators.LinkGraph.pageRank]] output shape;
    * every 4th URL deliberately UNSCORED → 0.0, fetched last) and
    * each host's `fetch_seq` orders by `(priority desc, url)` —
    * so `maxPerHost = 40` keeps the 40 HIGHEST-value URLs per host,
    * not the alphabetically early ones. The oracle recomputes the
    * plan with an independent
    * `ROW_NUMBER() OVER (PARTITION BY host ORDER BY priority DESC,
    * url)` window — certifying that [[graft.operators.Skew
    * .rankWithinKey]] over the negated-score key EQUALS the naive
    * group-sized descending window, missing-score coalesce included. */
  val qT64RankedFetchPlan = Q(
    "q_t64_ranked_fetch_plan",
    """WITH f AS (
      |  SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR)
      |           || '.example/u/' || CAST(doc_id AS VARCHAR)
      |           AS frontier_url,
      |         'h' || CAST(doc_id % 5 AS VARCHAR) || '.example'
      |           AS url_host,
      |         CASE WHEN doc_id % 4 = 0 THEN CAST(0 AS DOUBLE)
      |              ELSE CAST((doc_id * 13) % 23 AS DOUBLE) END
      |           AS priority
      |  FROM documents),
      | r AS (
      |  SELECT frontier_url, url_host,
      |         CAST(1.0 AS DOUBLE) AS crawl_delay, priority,
      |         ROW_NUMBER() OVER (PARTITION BY url_host
      |                            ORDER BY priority DESC, frontier_url)
      |           AS fetch_seq
      |  FROM f)
      |SELECT frontier_url, url_host, crawl_delay, priority, fetch_seq,
      |       (fetch_seq - 1) * crawl_delay AS fetch_offset
      |FROM r WHERE fetch_seq <= 40""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val docs = documents(s, d)
    val url = concat(lit("https://h"), (col("doc_id") % 5).cast("string"),
      lit(".example/u/"), col("doc_id").cast("string"))
    val frontier = docs.select(url.as("frontier_url"))
    val pri = docs.filter(col("doc_id") % 4 =!= 0)
      .select(url.as("node"),
        ((col("doc_id") * 13) % 23).cast("double").as("rank"))
    val policies = s.range(0).select(lit("h").as("host"),
      lit("User-agent: *\nAllow: /").as("robots"))
    Outlinks.fetchPlan(frontier, "frontier_url", policies, "host",
      "robots", "graftbot", maxPerHost = 40, priorities = Some(pri))
  }

  /** Robots policy FRESHNESS, HASH-CERTIFIED — RFC 9309 §2.4 caps
    * robots caching at ~24 h, so [[graft.operators.Robots
    * .robotsFetchList]] with a `fetched_at` contract must surface
    * BOTH never-seen hosts and stale-policy hosts: policies exist for
    * hosts 0–9 but only 0–4 were fetched within the 24 h horizon of
    * the pinned `asOf`; the frontier spans hosts 0–19, so exactly
    * hosts 5–19 must surface for refetch. A broken freshness filter
    * flips rows in either direction (treating stale as fresh hides
    * 5–9; treating fresh as stale adds 0–4). */
  val qT65RobotsFreshness = Q(
    "q_t65_robots_freshness",
    """SELECT DISTINCT
      |       'fh' || CAST(doc_id % 20 AS VARCHAR) || '.example'
      |         AS url_host,
      |       'https://fh' || CAST(doc_id % 20 AS VARCHAR)
      |         || '.example/robots.txt' AS robots_url
      |FROM documents WHERE doc_id % 20 >= 5""".stripMargin) { (s, d) =>
    import graft.operators.Robots
    val frontier = documents(s, d).select(
      concat(lit("https://fh"), (col("doc_id") % 20).cast("string"),
        lit(".example/p/"), col("doc_id").cast("string"))
        .as("frontier_url"))
    val policies = s.range(10).select(
      concat(lit("fh"), col("id").cast("string"), lit(".example"))
        .as("host"),
      lit("User-agent: *\nAllow: /").as("robots"),
      when(col("id") < 5, lit("2026-02-01 02:00:00")) // 10 h old: fresh
        .otherwise(lit("2026-01-30 00:00:00")) // 2.5 d old: stale
        .cast("timestamp").as("fetched_at"))
    Robots.robotsFetchList(frontier, "frontier_url", policies, "host",
      fetchedAtCol = Some("fetched_at"), maxAgeSeconds = 86400L,
      asOf = Some(lit("2026-02-01 12:00:00").cast("timestamp")))
  }

  /** Crawl-trap CONTAINMENT, HASH-CERTIFIED — the frontier filter in
    * front of the fetch plan ([[graft.operators.Outlinks
    * .containTraps]]): three URL families on two hosts — a legitimate
    * 20-page section (template `/p/#`, under the 25 cap → passes
    * whole), a calendar-style explosion (`/cal/#?day=*`, one URL per
    * doc → capped to its lexicographically first 25), and a
    * session-id explosion whose 12-hex-digit run collapses to a
    * single `/s/` + `*` template (capped to 25; spelled indirectly
    * here because Scala comments nest). The oracle recomputes the
    * templates closed-form
    * and the caps with independent ROW_NUMBER windows — certifying
    * the hex/digit/query collapsing rules, the per-(host, template)
    * counting, and that [[graft.operators.Skew.topKPerGroup]]'s
    * salted cap EQUALS the naive window. */
  val qT66TrapContainment = Q(
    "q_t66_trap_containment",
    """WITH legit AS (
      |  SELECT DISTINCT 'https://site.example/p/'
      |           || CAST(doc_id % 20 AS VARCHAR) AS frontier_url,
      |         '/p/#' AS url_template
      |  FROM documents),
      | cal AS (
      |  SELECT DISTINCT 'https://trap.example/cal/'
      |           || CAST(doc_id AS VARCHAR) || '?day='
      |           || CAST(doc_id % 366 AS VARCHAR) AS frontier_url
      |  FROM documents),
      | calc AS (
      |  SELECT frontier_url, '/cal/#?day=*' AS url_template,
      |         ROW_NUMBER() OVER (ORDER BY frontier_url) AS rn
      |  FROM cal),
      | sess AS (
      |  SELECT DISTINCT 'https://trap.example/s/'
      |           || lpad(hex(doc_id), 12, '0') AS frontier_url
      |  FROM documents),
      | sessc AS (
      |  SELECT frontier_url, '/s/*' AS url_template,
      |         ROW_NUMBER() OVER (ORDER BY frontier_url) AS rn
      |  FROM sess)
      |SELECT frontier_url, url_template FROM legit
      |UNION ALL
      |SELECT frontier_url, url_template FROM calc WHERE rn <= 25
      |UNION ALL
      |SELECT frontier_url, url_template FROM sessc WHERE rn <= 25"""
      .stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val docs = documents(s, d)
    val legit = docs.select(
      concat(lit("https://site.example/p/"),
        (col("doc_id") % 20).cast("string")).as("frontier_url"))
    val cal = docs.select(
      concat(lit("https://trap.example/cal/"),
        col("doc_id").cast("string"), lit("?day="),
        (col("doc_id") % 366).cast("string")).as("frontier_url"))
    val sess = docs.select(
      concat(lit("https://trap.example/s/"),
        lpad(hex(col("doc_id")), 12, "0")).as("frontier_url"))
    Outlinks.containTraps(
      legit.union(cal).union(sess).distinct(),
      "frontier_url", maxPerTemplate = 25)
  }

  /** PageRank with dangling-mass REDISTRIBUTION, HASH-CERTIFIED — the
    * Page et al. formulation ([[graft.operators.LinkGraph.pageRank]]
    * with `redistributeDangling = true`): 13 planted sink nodes (the
    * `d` family never links out) would leak their mass under the
    * default semantics; here each round's leak is added back
    * uniformly via an in-plan broadcast total, so Σ rank = 1.0 —
    * the invariant anyone thresholding ABSOLUTE ranks needs. The
    * oracle unrolls the same 5 rounds with an explicit per-round
    * leak CTE over the dangling set. q_t54 pins that the DEFAULT
    * semantics stay byte-identical. */
  val qT67PagerankRedistribute = Q(
    "q_t67_pagerank_redistribute",
    pageRankOracleSql(
      """  SELECT DISTINCT src, dst FROM (
        |    SELECT 'h' || CAST(doc_id % 31 AS VARCHAR) AS src,
        |           'h' || CAST((doc_id * 3 + 1) % 31 AS VARCHAR) AS dst
        |    FROM documents
        |    UNION ALL
        |    SELECT 'h' || CAST(doc_id % 31 AS VARCHAR),
        |           'd' || CAST(doc_id % 13 AS VARCHAR)
        |    FROM documents)""".stripMargin, 5,
      redistribute = true)) { (s, d) =>
    val docs = documents(s, d)
    def m(p: String, n: Int, expr: org.apache.spark.sql.Column) =
      concat(lit(p), (expr % n).cast("string"))
    val e = docs.select(m("h", 31, col("doc_id")).as("src"),
        m("h", 31, col("doc_id") * 3 + 1).as("dst"))
      .union(docs.select(m("h", 31, col("doc_id")).as("src"),
        m("d", 13, col("doc_id")).as("dst")))
      .distinct()
    graft.operators.LinkGraph.pageRank(e, "src", "dst",
      iterations = 5, damping = 0.85, redistributeDangling = true)
      .select(col("node"), col("rank").as("pr"))
  }

  /** Revisit scheduling, HASH-CERTIFIED — the freshness half of a
    * continual crawl ([[graft.operators.Revisit.revisitSchedule]]):
    * per URL 4 fetches whose trailing-unchanged run varies closed-form
    * (doc_id % 5 — including the never-changed and the
    * changed-on-last-fetch extremes), sitemap `changefreq` hints on
    * even docs spanning all six tokens, and a `lastmod` postdating the
    * last fetch on every 11th even doc (due immediately, interval 0).
    * The oracle recomputes the last-fetch/last-change aggregation, the
    * streak count, the shortest-hint base, the exponential backoff
    * with its 30-day cap, and the lastmod override — certifying the
    * whole schedule arithmetic in epoch seconds. */
  val qT68RevisitSchedule = Q(
    "q_t68_revisit_schedule",
    """WITH h AS (
      |  SELECT 'https://rv.example/p/' || CAST(doc_id AS VARCHAR) AS url,
      |         CAST(1700000000 + doc_id * 10 + t.i AS DOUBLE) AS ft,
      |         (t.i < doc_id % 5) AS chg
      |  FROM documents, range(0, 4) t(i)),
      | a AS (
      |  SELECT url, MAX(ft) AS lf, MAX(CASE WHEN chg THEN ft END) AS lc
      |  FROM h GROUP BY url),
      | s AS (
      |  SELECT h.url, CAST(COUNT(*) AS BIGINT) AS st
      |  FROM h JOIN a ON a.url = h.url
      |  WHERE a.lc IS NULL OR h.ft > a.lc
      |  GROUP BY h.url),
      | hint AS (
      |  SELECT 'https://rv.example/p/' || CAST(doc_id AS VARCHAR) AS url,
      |         CASE doc_id % 12 WHEN 0 THEN CAST(3600 AS DOUBLE)
      |           WHEN 2 THEN 86400 WHEN 4 THEN 604800
      |           WHEN 6 THEN 2592000 WHEN 8 THEN 31536000
      |           WHEN 10 THEN 2592000 END AS b,
      |         (doc_id % 11 = 0) AS due
      |  FROM documents WHERE doc_id % 2 = 0),
      | j AS (
      |  SELECT a.url, a.lf, COALESCE(s.st, 0) AS st,
      |         COALESCE(hint.b, CAST(86400 AS DOUBLE)) AS b,
      |         COALESCE(hint.due, FALSE) AS due
      |  FROM a LEFT JOIN s ON s.url = a.url
      |         LEFT JOIN hint ON hint.url = a.url),
      | f AS (
      |  SELECT url, lf, st,
      |         CASE WHEN due THEN CAST(0 AS DOUBLE)
      |              ELSE LEAST(b * POWER(2, LEAST(st, 16)),
      |                         CAST(2592000 AS DOUBLE)) END AS iv
      |  FROM j)
      |SELECT url, lf AS last_fetch_epoch, st AS unchanged_streak,
      |       iv AS interval_seconds, lf + iv AS next_fetch_epoch
      |FROM f""".stripMargin) { (s, d) =>
    import graft.operators.Revisit
    val docs = documents(s, d)
    def url = concat(lit("https://rv.example/p/"),
      col("doc_id").cast("string"))
    val hist = docs
      .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("i"))
      .select(url.as("url"),
        (lit(1700000000L) + col("doc_id") * 10 + col("i"))
          .cast("double").as("ft"),
        (col("i") < col("doc_id") % 5).as("chg"))
    val m12 = col("doc_id") % 12
    val hints = docs.filter(col("doc_id") % 2 === 0)
      .select(url.as("loc"),
        when(m12 === 0, "hourly").when(m12 === 2, "daily")
          .when(m12 === 4, "weekly").when(m12 === 6, "monthly")
          .when(m12 === 8, "yearly").otherwise("never")
          .as("changefreq"),
        when(col("doc_id") % 11 === 0,
          (lit(1700000000L) + col("doc_id") * 10 + 8).cast("double"))
          .as("lastmod"))
    Revisit.revisitSchedule(hist, "url", "ft", "chg",
      hints = Some(hints), hintLastmodCol = Some("lastmod"))
  }

  /** Crawl-trap SIGNAL, HASH-CERTIFIED — the q_t66 fixture through
    * [[graft.operators.Outlinks.templateStats]] instead of the cap:
    * one row per (host, template) with its URL cardinality and the
    * `is_trap` flag at threshold 25. The counts are data-dependent
    * (distinct doc_id count for the exploding templates, the residue
    * count for the legitimate section), so the oracle recomputes them
    * from the documents table rather than hardcoding — a broken
    * template kernel, count, or threshold each flips rows. */
  val qT69TemplateStats = Q(
    "q_t69_template_stats",
    """WITH n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS c
      |           FROM documents),
      |     n20 AS (SELECT CAST(COUNT(DISTINCT doc_id % 20) AS BIGINT)
      |             AS c FROM documents)
      |SELECT 'site.example' AS url_host, '/p/#' AS url_template,
      |       (SELECT c FROM n20) AS n_urls,
      |       (SELECT c FROM n20) > 25 AS is_trap
      |UNION ALL
      |SELECT 'trap.example', '/cal/#?day=*', (SELECT c FROM n),
      |       (SELECT c FROM n) > 25
      |UNION ALL
      |SELECT 'trap.example', '/s/*', (SELECT c FROM n),
      |       (SELECT c FROM n) > 25""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val docs = documents(s, d)
    val legit = docs.select(
      concat(lit("https://site.example/p/"),
        (col("doc_id") % 20).cast("string")).as("frontier_url"))
    val cal = docs.select(
      concat(lit("https://trap.example/cal/"),
        col("doc_id").cast("string"), lit("?day="),
        (col("doc_id") % 366).cast("string")).as("frontier_url"))
    val sess = docs.select(
      concat(lit("https://trap.example/s/"),
        lpad(hex(col("doc_id")), 12, "0")).as("frontier_url"))
    Outlinks.templateStats(
      legit.union(cal).union(sess).distinct(),
      "frontier_url", trapThreshold = 25)
  }

  /** Archive-driven revisit scheduling, HASH-CERTIFIED END TO END —
    * the composition that closes the freshness loop with NO separate
    * history table: cycle 1 archives every page as a full `response`;
    * cycle 2 re-archives through [[graft.sources.WarcIO
    * .warcDedupSave]] with cycle 1's `_cdx` as the prior index, so
    * unchanged pages (2 of 3) land as `identical-payload-digest`
    * `revisit` records and changed pages as new full responses.
    * [[graft.operators.Revisit.fromArchive]] reads the record types
    * back as the change history: changed pages reset to the base
    * interval, unchanged pages back off to 2×. The oracle restates
    * the schedule closed-form in epoch seconds — certifying the
    * dedup writer's revisit decisions AND the schedule arithmetic as
    * one plan. */
  val qT70ArchiveRevisit = Q(
    "q_t70_archive_revisit",
    """SELECT 'https://ar.example/p/' || CAST(doc_id AS VARCHAR) AS url,
      |       CAST(epoch(TIMESTAMP '2026-02-02 00:00:00') AS DOUBLE)
      |         AS last_fetch_epoch,
      |       CASE WHEN doc_id % 3 = 0 THEN CAST(0 AS BIGINT)
      |            ELSE 1 END AS unchanged_streak,
      |       CASE WHEN doc_id % 3 = 0 THEN CAST(86400 AS DOUBLE)
      |            ELSE 172800 END AS interval_seconds,
      |       CAST(epoch(TIMESTAMP '2026-02-02 00:00:00') AS DOUBLE)
      |         + CASE WHEN doc_id % 3 = 0 THEN 86400
      |                ELSE 172800 END AS next_fetch_epoch
      |FROM documents""".stripMargin) { (s, d) =>
    import graft.operators.Revisit
    val tmp = java.nio.file.Files.createTempDirectory("graft_arrv_q")
      .toString
    val docs = documents(s, d)
    def capture(ver: org.apache.spark.sql.Column, date: String,
        tag: String) = docs.select(
      concat(lit("https://ar.example/p/"), col("doc_id").cast("string"))
        .as("target_uri"),
      lit(date).as("warc_date"),
      concat(lit(s"<urn:ar:$tag:"), col("doc_id").cast("string"),
        lit(">")).as("record_id"),
      lit("text/html").as("http_content_type"),
      // per-doc-unique payloads: a cross-doc text collision would
      // otherwise dedup WITHIN cycle 1 and corrupt the change signal
      encode(concat(ver, lit(" doc "), col("doc_id").cast("string"),
        lit(" "), col("text")), "UTF-8").as("payload"))
    graft.sources.WarcIO.warcDedupSave(
      capture(lit("v1"), "2026-02-01T00:00:00Z", "c1").repartition(8),
      s"$tmp/batch=0")
    graft.sources.WarcIO.warcDedupSave(
      capture(when(col("doc_id") % 3 === 0, "v2").otherwise("v1"),
        "2026-02-02T00:00:00Z", "c2").repartition(8),
      s"$tmp/batch=1",
      priorIndex = Some(s.read.parquet(s"$tmp/batch=0/_cdx")))
    Revisit.fromArchive(
      s.read.format("graft-warc").load(s"$tmp/batch=*"))
  }

  /** Sitemap fetch worklist, HASH-CERTIFIED — the discovery loop's
    * middle tier ([[graft.operators.Outlinks.sitemapFetchList]]):
    * robots-declared sitemaps (even docs, m0–m8) union sitemapindex
    * children (i0–i6, with urlset rows planted to prove they are
    * ignored and a relative loc planted to prove the absolute-only
    * filter), minus the already-fetched set {m0, m2, i0}. The oracle
    * recomputes the surviving set closed-form. */
  val qT71SitemapFetchList = Q(
    "q_t71_sitemap_fetch_list",
    """WITH r AS (
      |  SELECT DISTINCT 'https://sm.example/m'
      |    || CAST(doc_id % 10 AS VARCHAR) || '.xml' AS u
      |  FROM documents WHERE doc_id % 2 = 0),
      | i AS (
      |  SELECT DISTINCT 'https://sm.example/i'
      |    || CAST(doc_id % 7 AS VARCHAR) || '.xml' AS u
      |  FROM documents),
      | a AS (SELECT u FROM r UNION SELECT u FROM i)
      |SELECT u AS sitemap_url FROM a
      |WHERE u NOT IN ('https://sm.example/m0.xml',
      |                'https://sm.example/m2.xml',
      |                'https://sm.example/i0.xml')""".stripMargin) {
    (s, d) =>
    import graft.operators.Outlinks
    val docs = documents(s, d)
    val robotsDiscovered = docs.filter(col("doc_id") % 2 === 0)
      .select(concat(lit("https://sm.example/m"),
        (col("doc_id") % 10).cast("string"), lit(".xml"))
        .as("sitemap_url"))
    val entries = docs.select(
      concat(lit("https://sm.example/i"),
        (col("doc_id") % 7).cast("string"), lit(".xml")).as("loc"),
      lit(true).as("is_index"))
      .union(docs.select( // urlset rows: pages, must be ignored
        concat(lit("https://sm.example/page/"),
          col("doc_id").cast("string")).as("loc"),
        lit(false).as("is_index")))
      .union(docs.select( // relative loc: absolute-only filter
        lit("/i-relative.xml").as("loc"), lit(true).as("is_index")))
    val fetched = s.createDataset(Seq(
      "https://sm.example/m0.xml", "https://sm.example/m2.xml",
      "https://sm.example/i0.xml"))(
      org.apache.spark.sql.Encoders.STRING).toDF("fetched_url")
    Outlinks.sitemapFetchList(robotsDiscovered, "sitemap_url",
      entries, fetched, "fetched_url")
  }

  /** Per-host crawl BUDGETS, HASH-CERTIFIED — the rank-aware
    * allocation knob on [[graft.operators.Outlinks.fetchPlan]]: listed
    * hosts keep their top `budget` URLs (h0 → 10, h1 → 20, h2 → 0 —
    * excluded outright), unlisted hosts (h3, h4) fall back to the
    * uniform `maxPerHost = 25`. The oracle recomputes the per-host
    * windows and applies the same limit table closed-form — a broken
    * budget join, fallback, or exclusion arm each flips rows. */
  val qT72HostBudgets = Q(
    "q_t72_host_budgets",
    """WITH f AS (
      |  SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR)
      |           || '.example/u/' || CAST(doc_id AS VARCHAR)
      |           AS frontier_url,
      |         'h' || CAST(doc_id % 5 AS VARCHAR) || '.example'
      |           AS url_host,
      |         doc_id % 5 AS h
      |  FROM documents),
      | r AS (
      |  SELECT frontier_url, url_host, h,
      |         ROW_NUMBER() OVER (PARTITION BY url_host
      |                            ORDER BY frontier_url) AS rn
      |  FROM f)
      |SELECT frontier_url, url_host, CAST(1.0 AS DOUBLE) AS crawl_delay,
      |       rn AS fetch_seq,
      |       (rn - 1) * CAST(1.0 AS DOUBLE) AS fetch_offset
      |FROM r
      |WHERE (h = 0 AND rn <= 10) OR (h = 1 AND rn <= 20)
      |   OR (h IN (3, 4) AND rn <= 25)""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val frontier = documents(s, d).select(
      concat(lit("https://h"), (col("doc_id") % 5).cast("string"),
        lit(".example/u/"), col("doc_id").cast("string"))
        .as("frontier_url"))
    val policies = s.range(0).select(lit("h").as("host"),
      lit("User-agent: *\nAllow: /").as("robots"))
    val budgets = s.range(3).select(
      concat(lit("h"), col("id").cast("string"), lit(".example"))
        .as("url_host"),
      when(col("id") === 0, 10L).when(col("id") === 1, 20L)
        .otherwise(0L).as("budget"))
    Outlinks.fetchPlan(frontier, "frontier_url", policies, "host",
      "robots", "graftbot", maxPerHost = 25,
      hostBudgets = Some(budgets))
  }

  /** Anchor-text index, HASH-CERTIFIED END TO END — page HTML →
    * [[graft.operators.Outlinks.extractAnchors]] → [[Outlinks
    * .anchorTextIndex]]: each page anchors its residue target with one
    * of three labels (counts are data-dependent — one per doc in the
    * (doc_id % 50, doc_id % 3) class) plus a `rel=nofollow` spam
    * anchor that must NOT count. Top-2 labels per target by
    * `(count desc, text)`; the oracle recomputes the counts and the
    * window from the documents table — certifying extraction, the
    * nofollow filter, the pair aggregation, and the salted top-k as
    * one plan. */
  val qT73AnchorIndex = Q(
    "q_t73_anchor_index",
    """WITH a AS (
      |  SELECT 'https://t.example/p/' || CAST(doc_id % 50 AS VARCHAR)
      |           AS outlink,
      |         'label ' || CAST(doc_id % 3 AS VARCHAR) AS anchor_text,
      |         CAST(COUNT(*) AS BIGINT) AS n_refs
      |  FROM documents GROUP BY 1, 2),
      | r AS (
      |  SELECT outlink, anchor_text, n_refs,
      |         ROW_NUMBER() OVER (PARTITION BY outlink
      |                            ORDER BY n_refs DESC, anchor_text)
      |           AS text_rank
      |  FROM a)
      |SELECT outlink, anchor_text, n_refs,
      |       CAST(text_rank AS BIGINT) AS text_rank
      |FROM r WHERE text_rank <= 2""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val page = concat(
      lit("<html><body><a href=\"/p/"),
      (col("doc_id") % 50).cast("string"), lit("\">label "),
      (col("doc_id") % 3).cast("string"), lit("</a>"),
      lit("<a href=\"/p/"), (col("doc_id") % 50).cast("string"),
      lit("\" rel=\"nofollow\">spam label</a></body></html>"))
    val anchors = Outlinks.extractAnchors(
      documents(s, d).select(
        concat(lit("https://t.example/x/"), col("doc_id").cast("string"))
          .as("target_uri"),
        page.as("html")),
      "html", "target_uri")
    Outlinks.anchorTextIndex(anchors, k = 2,
      nofollowCol = Some("nofollow"))
  }

  /** Seed-distance BFS, HASH-CERTIFIED — the crawl-depth prior
    * ([[graft.operators.LinkGraph.seedDistance]]): hop counts from
    * seeds {n0, n3} over a residue graph, with a planted disconnected
    * `m`-cycle that must stay ABSENT (unreachable) and `maxDepth = 6`
    * bounding the expansion. The oracle is an independent recursive
    * CTE taking MIN depth per node — a broken frontier join, visited
    * anti-join, or depth cap each flips rows. */
  val qT74SeedDistance = Q(
    "q_t74_seed_distance",
    """WITH RECURSIVE e AS (
      |  SELECT DISTINCT 'n' || CAST(doc_id % 40 AS VARCHAR) AS src,
      |         'n' || CAST((doc_id * 7 + 1) % 40 AS VARCHAR) AS dst
      |  FROM documents
      |  UNION
      |  SELECT DISTINCT 'm' || CAST(doc_id % 5 AS VARCHAR),
      |         'm' || CAST((doc_id + 1) % 5 AS VARCHAR)
      |  FROM documents),
      | walk(node, depth) AS (
      |  SELECT 'n0', 0 UNION SELECT 'n3', 0
      |  UNION
      |  SELECT e.dst, w.depth + 1
      |  FROM walk w JOIN e ON e.src = w.node
      |  WHERE w.depth < 6)
      |SELECT node, CAST(MIN(depth) AS INTEGER) AS depth
      |FROM walk GROUP BY node""".stripMargin) { (s, d) =>
    val docs = documents(s, d)
    val e = docs.select(
        concat(lit("n"), (col("doc_id") % 40).cast("string")).as("src"),
        concat(lit("n"), ((col("doc_id") * 7 + 1) % 40).cast("string"))
          .as("dst"))
      .union(docs.select(
        concat(lit("m"), (col("doc_id") % 5).cast("string")).as("src"),
        concat(lit("m"), ((col("doc_id") + 1) % 5).cast("string"))
          .as("dst")))
    val seeds = s.range(2).select(
      concat(lit("n"), (col("id") * 3).cast("string")).as("seed"))
    graft.operators.LinkGraph.seedDistance(e, "src", "dst",
      seeds, "seed", maxDepth = 6)
  }

  /** Poisson change-rate estimation, HASH-CERTIFIED — the Cho &
    * Garcia-Molina bias-corrected estimator ([[graft.operators
    * .Revisit.changeRates]]) over per-doc histories whose revisit
    * count (0–3) and change pattern vary closed-form: single-fetch
    * URLs must report null, the estimator must exclude the
    * first-sight fetch from X, and the ln/interval arithmetic must
    * match the oracle's independent recomputation bit-for-bit at the
    * 10-significant-digit canon. */
  val qT75ChangeRates = Q(
    "q_t75_change_rates",
    """WITH h AS (
      |  SELECT 'https://cr.example/p/' || CAST(doc_id AS VARCHAR)
      |           AS url,
      |         CAST(1700000000 + doc_id * 100 + t.i * 7 AS DOUBLE)
      |           AS ft,
      |         (t.i % 2 = 0) AS chg
      |  FROM documents, range(0, 4) t(i)
      |  WHERE t.i <= doc_id % 4),
      | a AS (
      |  SELECT url, CAST(COUNT(*) AS BIGINT) AS n_fetches,
      |         MIN(ft) AS t0, MAX(ft) AS tl
      |  FROM h GROUP BY url),
      | x AS (
      |  SELECT h.url, CAST(COUNT(*) AS BIGINT) AS n_changed
      |  FROM h JOIN a ON a.url = h.url
      |  WHERE h.chg AND h.ft > a.t0
      |  GROUP BY h.url),
      | j AS (
      |  SELECT a.url, a.n_fetches, COALESCE(x.n_changed, 0) AS n_changed,
      |         CAST(a.n_fetches - 1 AS DOUBLE) AS n, a.t0, a.tl
      |  FROM a LEFT JOIN x ON x.url = a.url)
      |SELECT url, n_fetches, n_changed,
      |       CASE WHEN n > 0 AND tl > t0
      |            THEN -ln((n - n_changed + 0.5) / (n + 0.5))
      |                 / ((tl - t0) / n) * 86400
      |            END AS lambda_per_day
      |FROM j""".stripMargin) { (s, d) =>
    import graft.operators.Revisit
    val hist = documents(s, d)
      .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("i"))
      .filter(col("i") <= col("doc_id") % 4)
      .select(
        concat(lit("https://cr.example/p/"), col("doc_id").cast("string"))
          .as("url"),
        (lit(1700000000L) + col("doc_id") * 100 + col("i") * 7)
          .cast("double").as("ft"),
        (col("i") % 2 === 0).as("chg"))
    Revisit.changeRates(hist, "url", "ft", "chg")
  }

  /** Poisson-optimal revisit schedule, HASH-CERTIFIED — the
    * [[graft.operators.Revisit.rateSchedule]] composition over the
    * q_t75 history: interval = -ln(1 - staleRisk)/λ̂ clamped into
    * [1 h, 30 d], default for unestimable-or-zero rates (X = 0 yields
    * λ̂ = 0 exactly — the never-changed arm), `next_fetch` anchored at
    * the last fetch. The oracle recomputes the estimator AND the
    * schedule arithmetic independently. */
  val qT76RateSchedule = Q(
    "q_t76_rate_schedule",
    """WITH h AS (
      |  SELECT 'https://cr.example/p/' || CAST(doc_id AS VARCHAR)
      |           AS url,
      |         CAST(1700000000 + doc_id * 100 + t.i * 7 AS DOUBLE)
      |           AS ft,
      |         (t.i % 2 = 0) AS chg
      |  FROM documents, range(0, 4) t(i)
      |  WHERE t.i <= doc_id % 4),
      | a AS (
      |  SELECT url, CAST(COUNT(*) AS BIGINT) AS n_fetches,
      |         MIN(ft) AS t0, MAX(ft) AS tl
      |  FROM h GROUP BY url),
      | x AS (
      |  SELECT h.url, CAST(COUNT(*) AS BIGINT) AS n_changed
      |  FROM h JOIN a ON a.url = h.url
      |  WHERE h.chg AND h.ft > a.t0
      |  GROUP BY h.url),
      | j AS (
      |  SELECT a.url, a.n_fetches, COALESCE(x.n_changed, 0) AS n_changed,
      |         CAST(a.n_fetches - 1 AS DOUBLE) AS n, a.t0, a.tl
      |  FROM a LEFT JOIN x ON x.url = a.url),
      | f AS (
      |  SELECT url, n_fetches, n_changed, tl,
      |         CASE WHEN n > 0 AND tl > t0
      |              THEN -ln((n - n_changed + 0.5) / (n + 0.5))
      |                   / ((tl - t0) / n) * 86400
      |              END AS lambda_per_day
      |  FROM j),
      | g AS (
      |  SELECT url, n_fetches, n_changed, tl, lambda_per_day,
      |         CASE WHEN lambda_per_day IS NOT NULL
      |                   AND lambda_per_day > 0
      |              THEN LEAST(GREATEST(
      |                     -ln(0.5) / (lambda_per_day / 86400),
      |                     CAST(3600 AS DOUBLE)),
      |                   CAST(2592000 AS DOUBLE))
      |              ELSE CAST(86400 AS DOUBLE) END AS interval_seconds
      |  FROM f)
      |SELECT url, n_fetches, n_changed, lambda_per_day,
      |       interval_seconds, tl + interval_seconds AS next_fetch_epoch
      |FROM g""".stripMargin) { (s, d) =>
    import graft.operators.Revisit
    val hist = documents(s, d)
      .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("i"))
      .filter(col("i") <= col("doc_id") % 4)
      .select(
        concat(lit("https://cr.example/p/"), col("doc_id").cast("string"))
          .as("url"),
        (lit(1700000000L) + col("doc_id") * 100 + col("i") * 7)
          .cast("double").as("ft"),
        (col("i") % 2 === 0).as("chg"))
    Revisit.rateSchedule(hist, "url", "ft", "chg")
  }

  /** Canonical-mapping APPLICATION, HASH-CERTIFIED — the consumer
    * side of the redirect/canonical signals ([[graft.operators
    * .Outlinks.applyCanonical]] chained twice): every 5th URL has a
    * resolved redirect final (null — a CYCLE — on every 35th, which
    * must keep its original), every 10th redirect TARGET declares a
    * rel=canonical, and every 3rd ORIGINAL URL declares one that only
    * applies when no redirect rewrote the URL first. The oracle
    * restates the two-stage rewrite closed-form — join order,
    * null-target guard, and pass-through each flip rows. */
  val qT77ApplyCanonical = Q(
    "q_t77_apply_canonical",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 5 = 0 AND doc_id % 35 <> 0 THEN
      |         CASE WHEN doc_id % 10 = 0
      |              THEN 'https://cn.example/c/' || CAST(doc_id AS VARCHAR)
      |              ELSE 'https://cn.example/m/' || CAST(doc_id AS VARCHAR)
      |              END
      |       WHEN doc_id % 3 = 0
      |       THEN 'https://cn.example/cv/' || CAST(doc_id AS VARCHAR)
      |       ELSE 'https://cn.example/v/' || CAST(doc_id AS VARCHAR)
      |            || '?x=1' END AS url
      |FROM documents""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val docs = documents(s, d)
    val idStr = col("doc_id").cast("string")
    val orig = concat(lit("https://cn.example/v/"), idStr, lit("?x=1"))
    val frontier = docs.select(col("doc_id"), orig.as("url"))
    val redirects = docs.filter(col("doc_id") % 5 === 0)
      .select(orig.as("redirect_from"),
        when(col("doc_id") % 35 =!= 0,
          concat(lit("https://cn.example/m/"), idStr))
          .as("final_target"))
    val canon = docs.filter(col("doc_id") % 10 === 0)
      .select(concat(lit("https://cn.example/m/"), idStr).as("page_uri"),
        concat(lit("https://cn.example/c/"), idStr).as("canonical_uri"))
      .union(docs.filter(col("doc_id") % 3 === 0)
        .select(orig.as("page_uri"),
          concat(lit("https://cn.example/cv/"), idStr)
            .as("canonical_uri")))
    Outlinks.applyCanonical(
      Outlinks.applyCanonical(frontier, "url",
        redirects, "redirect_from", "final_target"),
      "url", canon, "page_uri", "canonical_uri")
  }

  /** Canonical collapse COMPOSED INTO THE RANKING LOOP,
    * HASH-CERTIFIED — the full alias-collapse signal path run end to
    * end: raw redirect edges (2-hop chains r1→r2→p plus a planted
    * cycle) resolve through [[graft.operators.Outlinks
    * .resolveRedirectChains]], merge with page-declared canonicals
    * (including a redirect source that ALSO declares a bogus
    * canonical — the redirect must win) into ONE mapping
    * ([[graft.operators.Outlinks.canonicalMapping]]), the aliased
    * link graph collapses through it ([[collapseEdges]] — three alias
    * classes of the same target dedupe to one edge, so rank mass
    * stops splitting), PageRank runs on the collapsed graph, and the
    * output is the COLLAPSED FRONTIER with each URL's rank — frontier
    * and rank parity in one certified frame. The cycle node rides
    * through unmapped (a crawler must not canonicalize into a loop)
    * and ranks as an ordinary dangling node. The oracle restates the
    * collapsed graph closed-form (every alias class lands on
    * `p/<t>`) and unrolls the same 5 power-iteration rounds. */
  val qT78CanonicalRank = Q(
    "q_t78_canonical_rank",
    pageRankOracleSql(
      // NOTE: interpolated into pageRankOracleSql's own stripMargin
      // template — no line here may BEGIN with `|` (a leading || would
      // lose a pipe to the second strip)
      """  SELECT DISTINCT src, dst FROM (
        |    SELECT 'https://cs.example/p/' || CAST(doc_id % 40 AS VARCHAR)
        |             AS src,
        |           'https://cs.example/p/' ||
        |             CAST((doc_id * 7 + 3) % 40 AS VARCHAR) AS dst
        |    FROM documents
        |    UNION ALL
        |    SELECT 'https://cs.example/p/' || CAST(doc_id % 40 AS VARCHAR),
        |           'https://cs.example/p/' ||
        |             CAST((doc_id * 3 + 1) % 40 AS VARCHAR)
        |    FROM documents
        |    UNION ALL
        |    SELECT 'https://cs.example/p/0', 'https://cs.example/cy/a')""".stripMargin,
      5,
      finalSelect = Some(
        """SELECT f.node AS frontier_url, r.pr
          |FROM (SELECT DISTINCT dst AS node FROM e) f
          |JOIN r5 r ON r.node = f.node""".stripMargin))) { (s, d) =>
    import graft.operators.Outlinks
    val docs = documents(s, d)
    def u(p: String, e: org.apache.spark.sql.Column) =
      concat(lit(s"https://cs.example/$p/"), e.cast("string"))
    val m = col("doc_id") % 40
    val t = (col("doc_id") * 7 + 3) % 40
    val t2 = (col("doc_id") * 3 + 1) % 40
    // three alias classes for family 1, two for family 2 — direct,
    // via a 2-hop redirect chain, via a declared-canonical variant URL
    val alias1 = when(col("doc_id") % 3 === 0, u("p", t))
      .when(col("doc_id") % 3 === 1, u("r1", t))
      .otherwise(concat(u("c", t), lit("?sid=1")))
    val alias2 = when(col("doc_id") % 2 === 0, u("p", t2))
      .otherwise(concat(u("c", t2), lit("?sid=1")))
    val one = s.range(1)
    // edges is consumed TWICE (collapse leg + the final frontier
    // distinct) and mapping twice (collapse leg + the final
    // applyCanonical): pin both — exactly what [[graft.operators
    // .CrawlLoop.crawlCycles]] does with its per-cycle mapping — so
    // the corpus-derived extraction runs once, not per consumer
    val edges = docs.select(u("p", m).as("src"), alias1.as("dst"))
      .union(docs.select(u("p", m).as("src"), alias2.as("dst")))
      .union(one.select(lit("https://cs.example/p/0").as("src"),
        lit("https://cs.example/cy/a").as("dst")))
      .localCheckpoint()
    val redirects = docs
      .select(u("r1", m).as("redirect_from"), u("r2", m).as("redirect_to"))
      .union(docs.select(u("r2", m), u("p", m)))
      .union(one.select(lit("https://cs.example/cy/a"),
        lit("https://cs.example/cy/b")))
      .union(one.select(lit("https://cs.example/cy/b"),
        lit("https://cs.example/cy/a")))
    val canon = docs
      .select(concat(u("c", m), lit("?sid=1")).as("page_uri"),
        u("p", m).as("canonical_uri"))
      // a redirect source declaring its own canonical: the 3xx means
      // this markup was never served from r1 — the redirect must win
      .union(docs.select(u("r1", m), u("bogus", m)))
    val mapping = Outlinks.canonicalMapping(
      Outlinks.resolveRedirectChains(redirects), canon)
      .localCheckpoint()
    val collapsed = Outlinks.collapseEdges(edges, "src", "dst", mapping)
    val ranks = graft.operators.LinkGraph.pageRank(
      collapsed, "src", "dst", iterations = 5, damping = 0.85)
    Outlinks.applyCanonical(
        edges.select(col("dst").as("frontier_url")), "frontier_url",
        mapping, "alias_url", "canonical_url")
      .distinct()
      .join(ranks.withColumnRenamed("node", "frontier_url"),
        "frontier_url")
      .select(col("frontier_url"), col("rank").as("pr"))
  }

  /** Sitemap-priority BOOTSTRAP composed into the fetch plan,
    * HASH-CERTIFIED — [[graft.operators.Outlinks
    * .sitemapBoostedPriorities]] feeding [[graft.operators.Outlinks
    * .fetchPlan]]: ranked URLs keep their link-graph rank even when a
    * sitemap also lists them (rank wins — every 8th URL exercises the
    * overlap), never-ranked sitemap URLs bootstrap at
    * `coalesce(priority, 0.5) × max(rank)` (every 20th sitemap row
    * declares NO priority and must default to 0.5), and URLs with
    * neither signal fetch last at 0. The oracle restates the
    * combination rule with plain CTEs and recomputes the per-host
    * sequence with an independent ROW_NUMBER window. */
  val qT79SitemapBoostedPlan = Q(
    "q_t79_sitemap_boosted_plan",
    """WITH f AS MATERIALIZED (
      |  SELECT DISTINCT
      |    'https://h' || CAST(doc_id % 2 AS VARCHAR) || '.example/u/'
      |      || CAST(doc_id AS VARCHAR) AS url,
      |    'h' || CAST(doc_id % 2 AS VARCHAR) || '.example' AS url_host,
      |    doc_id AS id
      |  FROM documents),
      | r AS MATERIALIZED (
      |  SELECT url, CAST(id % 10 + 1 AS DOUBLE) / 1000 AS rank
      |  FROM f WHERE id % 4 = 0),
      | sm AS MATERIALIZED (
      |  SELECT url,
      |         CASE WHEN id % 20 = 1 THEN NULL
      |              ELSE CAST(id % 5 AS DOUBLE) / 4 END AS sp
      |  FROM f WHERE id % 4 = 1 OR id % 8 = 0),
      | mx AS MATERIALIZED (SELECT MAX(rank) AS m FROM r),
      | pri AS MATERIALIZED (
      |  SELECT f.url, f.url_host,
      |         COALESCE(r.rank,
      |           CASE WHEN sm.url IS NOT NULL
      |                THEN COALESCE(sm.sp, CAST(0.5 AS DOUBLE))
      |                     * (SELECT m FROM mx) END,
      |           CAST(0 AS DOUBLE)) AS priority
      |  FROM f LEFT JOIN r ON r.url = f.url
      |         LEFT JOIN sm ON sm.url = f.url)
      |SELECT url AS frontier_url, url_host,
      |       CAST(1.0 AS DOUBLE) AS crawl_delay, priority,
      |       ROW_NUMBER() OVER (PARTITION BY url_host
      |                          ORDER BY priority DESC, url) AS fetch_seq,
      |       (ROW_NUMBER() OVER (PARTITION BY url_host
      |                           ORDER BY priority DESC, url) - 1)
      |         * CAST(1.0 AS DOUBLE) AS fetch_offset
      |FROM pri""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val docs = documents(s, d)
    val url = concat(lit("https://h"), (col("doc_id") % 2).cast("string"),
      lit(".example/u/"), col("doc_id").cast("string"))
    val frontier = docs.select(url.as("frontier_url"))
    val ranks = docs.filter(col("doc_id") % 4 === 0)
      .select(url.as("node"),
        ((col("doc_id") % 10 + 1).cast("double") / 1000).as("rank"))
    val entries = docs
      .filter(col("doc_id") % 4 === 1 || col("doc_id") % 8 === 0)
      .select(url.as("loc"),
        when(col("doc_id") % 20 === 1, lit(null).cast("double"))
          .otherwise((col("doc_id") % 5).cast("double") / 4)
          .as("priority"))
    val policies = s.range(0)
      .select(lit("x").as("host"), lit("").as("robots"))
    Outlinks.fetchPlan(frontier, "frontier_url", policies, "host",
      "robots", "graftbot",
      priorities = Some(
        Outlinks.sitemapBoostedPriorities(ranks, entries)))
  }

  /** Focused-crawl priority, HASH-CERTIFIED — [[graft.operators
    * .Outlinks.focusedPriorities]]: anchor-text topic matching (real
    * tokenization engine-side; the corpus is constructed so the match
    * set is closed-form: texts `topic<k> guide <id>` match the seed
    * terms {topic0, topic1, topic2} iff k < 3) crossed with BFS seed
    * depth via `score × 0.5^depth`. Reference weights vary per
    * anchor, so the score is a genuine weighted fraction; every 5th
    * target is absent from the distance frame and must DROP (the
    * inner-join contract — unreached URLs score 0.0 downstream). */
  val qT80FocusedPriority = Q(
    "q_t80_focused_priority",
    """WITH a AS MATERIALIZED (
      |  SELECT 'https://f.example/p/' || CAST(doc_id % 60 AS VARCHAR)
      |           AS url,
      |         doc_id % 7 AS k,
      |         CAST(doc_id % 3 + 1 AS DOUBLE) AS w
      |  FROM documents),
      | s AS MATERIALIZED (
      |  SELECT url,
      |         SUM(CASE WHEN k < 3 THEN w ELSE CAST(0 AS DOUBLE) END)
      |           / SUM(w) AS score
      |  FROM a GROUP BY url),
      | d AS MATERIALIZED (
      |  SELECT DISTINCT
      |    'https://f.example/p/' || CAST(doc_id % 60 AS VARCHAR) AS url,
      |    (doc_id % 60) % 4 AS depth
      |  FROM documents WHERE (doc_id % 60) % 5 <> 0)
      |SELECT s.url AS node,
      |       s.score * POWER(CAST(0.5 AS DOUBLE), d.depth) AS priority
      |FROM s JOIN d ON d.url = s.url""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val docs = documents(s, d)
    val m = col("doc_id") % 60
    val url = concat(lit("https://f.example/p/"), m.cast("string"))
    val anchors = docs.select(url.as("outlink"),
      concat(lit("topic"), (col("doc_id") % 7).cast("string"),
        lit(" guide "), col("doc_id").cast("string")).as("anchor_text"),
      (col("doc_id") % 3 + 1).cast("long").as("n_refs"))
    val topics = s.range(3)
      .select(concat(lit("topic"), col("id").cast("string")).as("term"))
    val dists = docs.filter(m % 5 =!= 0)
      .select(url.as("node"), (m % 4).cast("int").as("depth"))
      .distinct()
    Outlinks.focusedPriorities(anchors, topics, dists)
  }

  /** FOCUSED-RANK fetch plan, HASH-CERTIFIED — the full focused-crawl
    * priority path [[graft.operators.CrawlLoop.crawlCycles]] runs when
    * `topics` is given: [[graft.operators.Outlinks.focusedPriorities]]
    * (q_t80's corpus — topical score × 0.5^depth, unreached URLs
    * dropped) multiplied into a link-graph rank frame by
    * [[graft.operators.Outlinks.focusedRankPriorities]] (relevance ×
    * authority, inner join), feeding [[graft.operators.Outlinks
    * .fetchPlan]]: topic-matched URLs schedule ahead of every
    * off-topic one regardless of raw rank (they score 0), authority
    * orders the topical tier, and the oracle recomputes the whole
    * chain closed-form with an independent ROW_NUMBER window. */
  val qT82FocusedRankPlan = Q(
    "q_t82_focused_rank_plan",
    """WITH a AS MATERIALIZED (
      |  SELECT 'https://fr.example/p/' || CAST(doc_id % 60 AS VARCHAR)
      |           AS url,
      |         doc_id % 7 AS k,
      |         CAST(doc_id % 3 + 1 AS DOUBLE) AS w
      |  FROM documents),
      | s AS MATERIALIZED (
      |  SELECT url,
      |         SUM(CASE WHEN k < 3 THEN w ELSE CAST(0 AS DOUBLE) END)
      |           / SUM(w) AS score
      |  FROM a GROUP BY url),
      | d AS MATERIALIZED (
      |  SELECT DISTINCT
      |    'https://fr.example/p/' || CAST(doc_id % 60 AS VARCHAR) AS url,
      |    (doc_id % 60) % 4 AS depth
      |  FROM documents WHERE (doc_id % 60) % 5 <> 0),
      | f AS MATERIALIZED (
      |  SELECT s.url, s.score * POWER(CAST(0.5 AS DOUBLE), d.depth) AS fp
      |  FROM s JOIN d ON d.url = s.url),
      | r AS MATERIALIZED (
      |  SELECT DISTINCT
      |    'https://fr.example/p/' || CAST(doc_id % 60 AS VARCHAR) AS url,
      |    CAST((doc_id % 60) % 9 + 1 AS DOUBLE) / 100 AS rank
      |  FROM documents),
      | u AS MATERIALIZED (
      |  SELECT DISTINCT
      |    'https://fr.example/p/' || CAST(doc_id % 60 AS VARCHAR) AS url
      |  FROM documents),
      | pri AS MATERIALIZED (
      |  SELECT u.url, COALESCE(r.rank * f.fp, CAST(0 AS DOUBLE))
      |           AS priority
      |  FROM u LEFT JOIN r ON r.url = u.url
      |         LEFT JOIN f ON f.url = u.url)
      |SELECT url AS frontier_url, 'fr.example' AS url_host,
      |       CAST(1.0 AS DOUBLE) AS crawl_delay, priority,
      |       ROW_NUMBER() OVER (PARTITION BY 'fr.example'
      |                          ORDER BY priority DESC, url) AS fetch_seq,
      |       (ROW_NUMBER() OVER (PARTITION BY 'fr.example'
      |                           ORDER BY priority DESC, url) - 1)
      |         * CAST(1.0 AS DOUBLE) AS fetch_offset
      |FROM pri""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val docs = documents(s, d)
    val m = col("doc_id") % 60
    val url = concat(lit("https://fr.example/p/"), m.cast("string"))
    val anchors = docs.select(url.as("outlink"),
      concat(lit("topic"), (col("doc_id") % 7).cast("string"),
        lit(" guide "), col("doc_id").cast("string")).as("anchor_text"),
      (col("doc_id") % 3 + 1).cast("long").as("n_refs"))
    val topics = s.range(3)
      .select(concat(lit("topic"), col("id").cast("string")).as("term"))
    val dists = docs.filter(m % 5 =!= 0)
      .select(url.as("node"), (m % 4).cast("int").as("depth"))
      .distinct()
    val ranks = docs
      .select(url.as("node"), ((m % 9 + 1).cast("double") / 100).as("rank"))
      .distinct()
    val frontier = docs.select(url.as("frontier_url")).distinct()
    val policies = s.range(0)
      .select(lit("x").as("host"), lit("").as("robots"))
    Outlinks.fetchPlan(frontier, "frontier_url", policies, "host",
      "robots", "graftbot",
      priorities = Some(Outlinks.focusedRankPriorities(ranks,
        Outlinks.focusedPriorities(anchors, topics, dists))))
  }

  /** The FULL focused-cycle priority frame, HASH-CERTIFIED — exactly
    * what [[graft.operators.CrawlLoop.crawlCycles]] hands
    * [[graft.operators.Outlinks.fetchPlan]] when `topics` AND a
    * sitemap are both live: relevance × authority
    * ([[graft.operators.Outlinks.focusedRankPriorities]] over the
    * q_t82 corpus) with never-linked sitemap orphans bootstrapped
    * through [[graft.operators.Outlinks.sitemapBoostedPriorities]] at
    * `coalesce(priority, 0.5) × max(combined)` — the bootstrap scale
    * is the best COMBINED score, so a priority-1.0 orphan ties the
    * most-valuable focused URL, a declared-priority-free orphan
    * (every loc-7 row is null) defaults to 0.5, and unfocused/
    * unreached URLs still fetch last at 0. The oracle restates the
    * whole frame closed-form with an independent window. */
  val qT84FocusedBoostPlan = Q(
    "q_t84_focused_boost_plan",
    """WITH a AS MATERIALIZED (
      |  SELECT 'https://fc.example/p/' || CAST(doc_id % 60 AS VARCHAR)
      |           AS url,
      |         doc_id % 7 AS k,
      |         CAST(doc_id % 3 + 1 AS DOUBLE) AS w
      |  FROM documents),
      | s AS MATERIALIZED (
      |  SELECT url,
      |         SUM(CASE WHEN k < 3 THEN w ELSE CAST(0 AS DOUBLE) END)
      |           / SUM(w) AS score
      |  FROM a GROUP BY url),
      | d AS MATERIALIZED (
      |  SELECT DISTINCT
      |    'https://fc.example/p/' || CAST(doc_id % 60 AS VARCHAR) AS url,
      |    (doc_id % 60) % 4 AS depth
      |  FROM documents WHERE (doc_id % 60) % 5 <> 0),
      | f AS MATERIALIZED (
      |  SELECT s.url, s.score * POWER(CAST(0.5 AS DOUBLE), d.depth) AS fp
      |  FROM s JOIN d ON d.url = s.url),
      | r AS MATERIALIZED (
      |  SELECT DISTINCT
      |    'https://fc.example/p/' || CAST(doc_id % 60 AS VARCHAR) AS url,
      |    CAST((doc_id % 60) % 9 + 1 AS DOUBLE) / 100 AS rank
      |  FROM documents),
      | cmb AS MATERIALIZED (
      |  SELECT r.url, r.rank * f.fp AS pri
      |  FROM r JOIN f ON f.url = r.url),
      | mx AS MATERIALIZED (SELECT MAX(pri) AS m FROM cmb),
      | o AS MATERIALIZED (
      |  SELECT DISTINCT
      |    'https://fc.example/o/' || CAST(doc_id % 10 AS VARCHAR) AS url,
      |    doc_id % 10 AS k
      |  FROM documents),
      | osp AS MATERIALIZED (
      |  SELECT url, CASE WHEN k = 7 THEN NULL
      |                   ELSE CAST(k % 5 AS DOUBLE) / 4 END AS sp
      |  FROM o),
      | u AS MATERIALIZED (
      |  SELECT DISTINCT
      |    'https://fc.example/p/' || CAST(doc_id % 60 AS VARCHAR) AS url
      |  FROM documents
      |  UNION SELECT url FROM o),
      | pri AS MATERIALIZED (
      |  SELECT u.url,
      |         COALESCE(cmb.pri,
      |           CASE WHEN osp.url IS NOT NULL
      |                THEN COALESCE(osp.sp, CAST(0.5 AS DOUBLE))
      |                     * (SELECT m FROM mx) END,
      |           CAST(0 AS DOUBLE)) AS priority
      |  FROM u LEFT JOIN cmb ON cmb.url = u.url
      |         LEFT JOIN osp ON osp.url = u.url)
      |SELECT url AS frontier_url, 'fc.example' AS url_host,
      |       CAST(1.0 AS DOUBLE) AS crawl_delay, priority,
      |       ROW_NUMBER() OVER (PARTITION BY 'fc.example'
      |                          ORDER BY priority DESC, url) AS fetch_seq,
      |       (ROW_NUMBER() OVER (PARTITION BY 'fc.example'
      |                           ORDER BY priority DESC, url) - 1)
      |         * CAST(1.0 AS DOUBLE) AS fetch_offset
      |FROM pri""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val docs = documents(s, d)
    val m = col("doc_id") % 60
    val url = concat(lit("https://fc.example/p/"), m.cast("string"))
    val anchors = docs.select(url.as("outlink"),
      concat(lit("topic"), (col("doc_id") % 7).cast("string"),
        lit(" guide "), col("doc_id").cast("string")).as("anchor_text"),
      (col("doc_id") % 3 + 1).cast("long").as("n_refs"))
    val topics = s.range(3)
      .select(concat(lit("topic"), col("id").cast("string")).as("term"))
    val dists = docs.filter(m % 5 =!= 0)
      .select(url.as("node"), (m % 4).cast("int").as("depth"))
      .distinct()
    val ranks = docs
      .select(url.as("node"), ((m % 9 + 1).cast("double") / 100).as("rank"))
      .distinct()
    val k10 = col("doc_id") % 10
    val orphan = concat(lit("https://fc.example/o/"), k10.cast("string"))
    val entries = docs.select(orphan.as("loc"),
      when(k10 === 7, lit(null).cast("double"))
        .otherwise((k10 % 5).cast("double") / 4).as("priority"))
    val frontier = docs.select(url.as("frontier_url"))
      .union(docs.select(orphan.as("frontier_url"))).distinct()
    val policies = s.range(0)
      .select(lit("x").as("host"), lit("").as("robots"))
    Outlinks.fetchPlan(frontier, "frontier_url", policies, "host",
      "robots", "graftbot",
      priorities = Some(Outlinks.sitemapBoostedPriorities(
        Outlinks.focusedRankPriorities(ranks,
          Outlinks.focusedPriorities(anchors, topics, dists)),
        entries)))
  }

  /** ARCHIVE-driven RATE schedule, HASH-CERTIFIED — [[graft.operators
    * .Revisit.rateFromArchive]]: a three-capture dedup archive (day 1
    * full, day 2 changed only for doc_id%3=0, day 3 changed only for
    * doc_id%2=0 — every other capture archives as a `revisit` record
    * against the prior batches' _cdx index) feeds the Poisson
    * estimator, so X ∈ {0,1,2} change observations per URL are read
    * straight from the record types. The oracle recomputes n̄=2,
    * mean-gap-one-day λ̂ and the stale-risk-0.5 interval closed-form
    * from doc_id (X=0 → λ̂=0 → the 86 400 s default; estimable rates
    * clamp into [3600, 2 592 000]). */
  val qT83ArchiveRateSchedule = Q(
    "q_t83_archive_rate_schedule",
    """WITH x AS MATERIALIZED (
      |  SELECT doc_id,
      |         CAST(CASE WHEN doc_id % 6 = 0 THEN 2
      |                   WHEN doc_id % 3 = 0 OR doc_id % 2 = 0 THEN 1
      |                   ELSE 0 END AS DOUBLE) AS xc
      |  FROM documents),
      | f AS MATERIALIZED (
      |  SELECT doc_id, xc,
      |         -ln((2 - xc + 0.5) / 2.5) / 86400 * 86400 AS lam
      |  FROM x),
      | g AS MATERIALIZED (
      |  SELECT doc_id, xc, lam,
      |         CASE WHEN lam > 0
      |              THEN LEAST(GREATEST(-ln(0.5) / (lam / 86400),
      |                     CAST(3600 AS DOUBLE)),
      |                   CAST(2592000 AS DOUBLE))
      |              ELSE CAST(86400 AS DOUBLE) END AS iv
      |  FROM f)
      |SELECT 'https://rr.example/p/' || CAST(doc_id AS VARCHAR) AS url,
      |       CAST(3 AS BIGINT) AS n_fetches,
      |       CAST(xc AS BIGINT) AS n_changed,
      |       lam AS lambda_per_day,
      |       iv AS interval_seconds,
      |       CAST(epoch(TIMESTAMP '2026-02-03 00:00:00') AS DOUBLE)
      |         + iv AS next_fetch_epoch
      |FROM g""".stripMargin) { (s, d) =>
    import graft.operators.Revisit
    val tmp = java.nio.file.Files.createTempDirectory("graft_rr_q")
      .toString
    val docs = documents(s, d)
    def capture(ver: org.apache.spark.sql.Column, date: String,
        tag: String) = docs.select(
      concat(lit("https://rr.example/p/"), col("doc_id").cast("string"))
        .as("target_uri"),
      lit(date).as("warc_date"),
      concat(lit(s"<urn:rr:$tag:"), col("doc_id").cast("string"),
        lit(">")).as("record_id"),
      lit("text/html").as("http_content_type"),
      // per-doc-unique payloads: a cross-doc text collision would
      // otherwise dedup WITHIN a cycle and corrupt the change signal
      encode(concat(ver, lit(" doc "), col("doc_id").cast("string"),
        lit(" "), col("text")), "UTF-8").as("payload"))
    val v2 = when(col("doc_id") % 3 === 0, "v2").otherwise("v1")
    val v3 = when(col("doc_id") % 2 === 0, "v3").otherwise(v2)
    graft.sources.WarcIO.warcDedupSave(
      capture(lit("v1"), "2026-02-01T00:00:00Z", "c1").repartition(8),
      s"$tmp/batch=0")
    graft.sources.WarcIO.warcDedupSave(
      capture(v2, "2026-02-02T00:00:00Z", "c2").repartition(8),
      s"$tmp/batch=1",
      priorIndex = Some(s.read.parquet(s"$tmp/batch=0/_cdx")))
    graft.sources.WarcIO.warcDedupSave(
      capture(v3, "2026-02-03T00:00:00Z", "c3").repartition(8),
      s"$tmp/batch=2",
      priorIndex = Some(s.read.parquet(s"$tmp/batch=0/_cdx")
        .unionByName(s.read.parquet(s"$tmp/batch=1/_cdx"))))
    Revisit.rateFromArchive(
      s.read.format("graft-warc").load(s"$tmp/batch=*"))
  }

  /** WARM-STARTED PageRank, HASH-CERTIFIED — [[graft.operators
    * .LinkGraph.pageRank]]'s `initial` vector: every 3rd node starts
    * at a closed-form prior, the rest at the uniform 1/N a new node
    * gets, and TWO power-iteration rounds run from that start (a
    * cyclical crawler warm-starts each cycle from last cycle's ranks
    * instead of re-converging from uniform). The oracle unrolls the
    * same two rounds from an r0 CTE that restates the start vector
    * per node — certifying the warm-start seeding (coalesce onto 1/N)
    * and that the iteration arithmetic is start-independent. */
  val qT81WarmPagerank = Q(
    "q_t81_warm_pagerank",
    pageRankOracleSql(
      """  SELECT DISTINCT src, dst FROM (
        |    SELECT 'h' || CAST(doc_id % 83 AS VARCHAR) AS src,
        |           'h' || CAST((doc_id * 5 + 2) % 83 AS VARCHAR) AS dst
        |    FROM documents
        |    UNION ALL
        |    SELECT 'h' || CAST(doc_id % 83 AS VARCHAR),
        |           'h' || CAST(doc_id % 79 AS VARCHAR)
        |    FROM documents)""".stripMargin,
      2,
      r0Select = Some(
        """SELECT node,
          |     CASE WHEN CAST(SUBSTRING(node, 2) AS INT) % 3 = 0
          |          THEN CAST(CAST(SUBSTRING(node, 2) AS INT) % 10 + 1
          |                 AS DOUBLE) / 100
          |          ELSE CAST(1 AS DOUBLE) / (SELECT n FROM nn) END AS pr
          |   FROM nodes""".stripMargin))) { (s, d) =>
    val docs = documents(s, d)
    def m(n: Int, expr: org.apache.spark.sql.Column) =
      concat(lit("h"), (expr % n).cast("string"))
    val e = docs.select(m(83, col("doc_id")).as("src"),
        m(83, col("doc_id") * 5 + 2).as("dst"))
      .union(docs.select(m(83, col("doc_id")).as("src"),
        m(79, col("doc_id")).as("dst")))
      .distinct()
    val init = s.range(83).filter(col("id") % 3 === 0)
      .select(concat(lit("h"), col("id").cast("string")).as("node"),
        ((col("id") % 10 + 1).cast("double") / 100).as("rank"))
    graft.operators.LinkGraph.pageRank(e, "src", "dst",
        iterations = 2, damping = 0.85, initial = Some(init))
      .select(col("node"), col("rank").as("pr"))
  }

  val all: Seq[Q] =
    Seq(qT1Stats, qT2Quality, qT3LangId, qT4Fingerprint, qT5Chunks,
      qT6Curation, qT7Split, qT8Decontam, qT9Redact, qT10Repetition,
      qT11Pack, qT12Stratified, qT13TfIdf, qT14Mixture, qT15TopNgrams,
      qT16Classifier, qT17Pipeline, qT18Wordpiece, qT19MixtureEpochs,
      qT20SubwordPack, qT21TopTrigrams, qT22TopWords, qT23Decontam8,
      qT24CorpusReport, qT25Shuffle, qT26LmScore, qT27GopherRules,
      qT28DecontamBloom, qT29Temperature, qT30SourceCap,
      qT31LengthBuckets, qT32BpeMerges, qT33TokenBudget, qT34FreqTokens,
      qT35LmBuckets, qT36NbTrain, qT37Bpe512, qT38UniformSample,
      qT39WeightedSample, qT40UrlCanonical, qT41RegisteredDomain,
      qT42PipelineCorpusDef, qT43HtmlExtract, qT44SourceCard,
      qT45CrawlExtract, qT46StatusGatedExtract, qT47Robots,
      qT48Outlinks, qT49Frontier, qT50Sitemap, qT51RobotsGate,
      qT52CharsetDecode, qT53FetchPlan, qT54PageRank, qT55AnchorText,
      qT56HostRank, qT57Redirects, qT58Hits, qT59RedirectChains,
      qT60MetaRefresh, qT61CanonicalLink, qT62RobotsSitemaps,
      qT63RobotsFetchList, qT64RankedFetchPlan, qT65RobotsFreshness,
      qT66TrapContainment, qT67PagerankRedistribute,
      qT68RevisitSchedule, qT69TemplateStats, qT70ArchiveRevisit,
      qT71SitemapFetchList, qT72HostBudgets, qT73AnchorIndex,
      qT74SeedDistance, qT75ChangeRates, qT76RateSchedule,
      qT77ApplyCanonical, qT78CanonicalRank, qT79SitemapBoostedPlan,
      qT80FocusedPriority, qT81WarmPagerank, qT82FocusedRankPlan,
      qT83ArchiveRateSchedule, qT84FocusedBoostPlan)
}
