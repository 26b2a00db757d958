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

  val all: Seq[Q] =
    Seq(qT1Stats, qT2Quality, qT3LangId, qT4Fingerprint, qT5Chunks)
}
