package graft.queries

import org.apache.spark.sql.functions.col
import graft.Tables._
import graft.operators.Dedup

/** Dedup operator certification over the documents/embeddings corpora.
  * The exact and n-gram paths have full DuckDB oracles; MinHash+LSH is
  * oracle'd against the exact-Jaccard result it converges to (banding miss
  * probability ≈ 1e-15 at the data's 0.9 Jaccard near-dups); SimHash has
  * engine-specific hashing → rows-only. */
object DedupQ {

  private val NgramOracle =
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
      |       GROUP BY 1, 2)
      |SELECT doc_a, doc_b, shared,
      |       CAST(shared AS DOUBLE) / (x.n + y.n - shared) AS jaccard
      |FROM sh JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
      |WHERE CAST(shared AS DOUBLE) / (x.n + y.n - shared) >= 0.6""".stripMargin

  val qD1Exact = Q(
    "q_d1_exact_dedup",
    """SELECT md5(lower(text)) AS h,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       min(doc_id) AS keeper
      |FROM documents GROUP BY 1""".stripMargin) { (s, d) =>
    Dedup.exactGroups(documents(s, d), "doc_id", "text")
  }

  val qD2NgramJaccard = Q("q_d2_ngram_jaccard", NgramOracle) { (s, d) =>
    Dedup.ngramJaccardPairs(documents(s, d), "doc_id", "text", 0.6)
  }

  /** Same certified output as the exact pairs (LSH candidates are
    * exact-verified), via the linear-scale MinHash path. Certified at
    * threshold 0.8, where the 32x4 banding miss probability is <= 4.6e-8
    * per pair (at 0.6 it would be ~1.2e-2 — a data assumption, not a
    * guarantee). */
  val qD3MinHashLsh = Q(
    "q_d3_minhash_lsh",
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
      |       GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |       CAST(shared AS DOUBLE) / (x.n + y.n - shared) AS jaccard
      |FROM sh JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
      |WHERE CAST(shared AS DOUBLE) / (x.n + y.n - shared) >= 0.8""".stripMargin) {
    (s, d) =>
      Dedup.minHashLshPairs(documents(s, d), "doc_id", "text", 0.8)
  }

  /** SimHash near-dup pairs, HASH-CERTIFIED end to end by replaying the
    * whole pipeline in SQL: the portable md5-prefix token hash
    * ([[Dedup.md5Hash64]]; hi·2³²+lo in unsigned HUGEINT form), the
    * per-bit ±1 votes over DISTINCT trigram shingles (WordTrigrams is a
    * set), the `vote > 0` signature packing (bit 63 via the min-long
    * literal), and the banded Hamming search — which is EXHAUSTIVE for
    * hamming ≤ 7 by pigeonhole, so brute-force `bit_count(xor)` over all
    * pairs states the identical result. The at-scale xxhash64 default of
    * [[Dedup.simHashPairs]] shares every line of machinery except the
    * token hash (NorthStarSpec exercises it). */
  val qD4SimHash = Q(
    "q_d4_simhash",
    """WITH RECURSIVE bits(j, p) AS (
      |  SELECT 0, CAST(1 AS HUGEINT)
      |  UNION ALL SELECT j + 1, p * 2 FROM bits WHERE j < 63),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |tg AS (SELECT DISTINCT doc_id, w FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE [array_to_string(t, ' ')] END) AS w
      |  FROM toks)),
      |h AS (SELECT doc_id,
      |        CAST(CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT)
      |             AS HUGEINT) * 4294967296
      |          + CAST(('0x' || substring(md5(w), 9, 8)) AS BIGINT) AS uh
      |      FROM tg),
      |votes AS (SELECT doc_id, j, p,
      |            SUM(CASE WHEN (uh // p) % 2 = 1 THEN 1 ELSE -1 END) AS v
      |          FROM h CROSS JOIN bits GROUP BY 1, 2, 3),
      |sig AS (SELECT doc_id,
      |          CAST(SUM(CASE WHEN v <= 0 THEN 0
      |                        WHEN j = 63 THEN -9223372036854775807 - 1
      |                        ELSE CAST(p AS BIGINT) END) AS BIGINT) AS s
      |        FROM votes GROUP BY doc_id)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.s, b.s)) <= 7""".stripMargin) { (s, d) =>
    Dedup.simHashPairs(documents(s, d), "doc_id", "text", maxHamming = 7,
      tokenHash = Dedup.md5Hash64)
  }

  val qD5EmbedNearDup = Q(
    "q_d5_embed_neardup",
    """WITH e AS (SELECT vec_id,
      |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |p AS (SELECT a.vec_id AS va, b.vec_id AS vb,
      |             list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
      |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
      |SELECT va, vb, sim FROM p WHERE sim >= 0.45""".stripMargin) { (s, d) =>
    graft.operators.Similarity
      .cosineNearDupPairs(embeddings(s, d), "vec_id", "embedding", 0.45)
  }

  /** Near-dup clusters: pairs → connected components, cluster id = min
    * doc id. Oracle: recursive-CTE transitive closure over the same exact
    * pairs. */
  val qD6DupClusters = Q(
    "q_d6_dup_clusters",
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
      |pairs AS (SELECT doc_a, doc_b
      |          FROM sh JOIN sz x ON doc_a = x.doc_id
      |                  JOIN sz y ON doc_b = y.doc_id
      |          WHERE CAST(shared AS DOUBLE) / (x.n + y.n - shared) >= 0.8),
      |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |          UNION SELECT doc_b, doc_a FROM pairs),
      |reach AS (
      |  SELECT src AS node, src AS r FROM edges
      |  UNION
      |  SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src)
      |SELECT node AS doc_id, min(r) AS cluster_id
      |FROM reach GROUP BY node""".stripMargin.replace(
      "WITH toks", "WITH RECURSIVE toks")) { (s, d) =>
    graft.operators.ConnectedComponents
      .dupClusters(documents(s, d), "doc_id", "text", 0.8)
  }

  /** Incremental dedup: a new batch (deterministic md5 half of the corpus)
    * near-dup-checked against the existing base — candidates come only
    * from the cross (band, bucket) join, verified exactly. The oracle is
    * the exact cross-pair set. */
  val qD7Incremental = Q(
    "q_d7_incremental",
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
      |lbl AS (SELECT doc_id,
      |          substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= '8' AS is_new
      |        FROM toks),
      |sh AS (SELECT a.doc_id AS base_id, b.doc_id AS new_id,
      |              CAST(count(*) AS BIGINT) AS shared
      |       FROM tg a JOIN tg b ON a.tg = b.tg
      |       JOIN lbl la ON a.doc_id = la.doc_id
      |       JOIN lbl lb ON b.doc_id = lb.doc_id
      |       WHERE NOT la.is_new AND lb.is_new
      |       GROUP BY 1, 2)
      |SELECT base_id, new_id,
      |       CAST(shared AS DOUBLE) / (x.n + y.n - shared) AS jaccard
      |FROM sh JOIN sz x ON base_id = x.doc_id JOIN sz y ON new_id = y.doc_id
      |WHERE CAST(shared AS DOUBLE) / (x.n + y.n - shared) >= 0.8""".stripMargin) {
    (s, d) =>
      import org.apache.spark.sql.functions.{md5, substring}
      val docs = documents(s, d)
      val isNew =
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) >= "8"
      Dedup.minHashLshPairsAcross(
        docs.filter(!isNew), docs.filter(isNew), "doc_id", "text", 0.8)
  }

  /** Embedding-space dup clusters: the q_d5 exact cosine pairs fed through
    * the same connected-components operator as the text path (q_d6) —
    * cluster id = min vec id. Oracle: recursive-CTE transitive closure
    * over the identical pair set. */
  val qD8EmbedClusters = Q(
    "q_d8_embed_clusters",
    """WITH RECURSIVE e AS (SELECT vec_id,
      |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |p AS (SELECT a.vec_id AS va, b.vec_id AS vb
      |      FROM n a JOIN n b ON a.vec_id < b.vec_id
      |      WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.45),
      |edges AS (SELECT va AS src, vb AS dst FROM p
      |          UNION SELECT vb, va FROM p),
      |reach AS (
      |  SELECT src AS node, src AS r FROM edges
      |  UNION
      |  SELECT reach.node, e2.dst FROM reach JOIN edges e2 ON reach.r = e2.src)
      |SELECT node AS vec_id, min(r) AS cluster_id
      |FROM reach GROUP BY node""".stripMargin) { (s, d) =>
    graft.operators.ConnectedComponents.components(
      graft.operators.Similarity
        .cosineNearDupPairs(embeddings(s, d), "vec_id", "embedding", 0.45)
        .select(col("va").as("src"), col("vb").as("dst")))
      .select(col("node").as("vec_id"), col("component").as("cluster_id"))
  }

  /** Span-level duplication profile (Lee et al. ACL'22 shape): per-doc
    * share of distinct trigram spans held by >= 2 documents. Spark counts
    * spans by 64-bit hash (exchanges carry 16 B rows); the oracle counts
    * the raw strings — equal unless two distinct corpus trigrams collide
    * in xxhash64 (~n²/2⁶⁵; ~1e-8 at a million distinct spans). */
  val qD9DupSpans = Q(
    "q_d9_dup_spans",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |tg AS (SELECT DISTINCT doc_id, tg FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE [array_to_string(t, ' ')] END) AS tg
      |  FROM toks) u),
      |dup AS (SELECT tg FROM (SELECT tg, count(*) AS nd
      |                        FROM tg GROUP BY 1) c WHERE nd >= 2)
      |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      |       CAST(count(d.tg) AS BIGINT) AS n_dup_spans,
      |       CAST(count(d.tg) AS DOUBLE) / count(*) AS dup_frac
      |FROM tg g LEFT JOIN dup d ON g.tg = d.tg
      |GROUP BY 1""".stripMargin) { (s, d) =>
    Dedup.duplicatedSpans(documents(s, d), "doc_id", "text")
  }

  /** Semantic dedup (SemDeDup): spherical k-means clusters the corpus,
    * near-dup search runs only within clusters (Σc² vs n² — the scale
    * path), verdict = keep/drop per vector. HASH-CERTIFIED via
    * [[SimilarityQ.quantizerCtes]]' full training replay: the oracle
    * recomputes clusters, then ALL within-cluster pairs with exact
    * cosine ≥ threshold (the 1-Bucket-Theta blocking only spreads work;
    * it never changes the pair set), and drops the higher id of every
    * qualifying pair. Certifies training + assignment + the pair
    * semantics in one row set; NorthStarSpec keeps the recall-floor and
    * subset contracts. */
  val qD10SemDedup = Q(
    "q_d10_semdedup",
    s"""WITH ${SimilarityQ.quantizerCtes},
       |best AS (
       |  SELECT vec_id, c AS cluster,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY d DESC, c) AS rn
       |  FROM corpd),
       |assign AS (SELECT vec_id, cluster FROM best WHERE rn = 1),
       |nn AS (SELECT vec_id, v,
       |              sqrt(list_sum(list_transform(range(1, 65),
       |                                           i -> v[i] * v[i])))
       |                AS nrm
       |       FROM e),
       |losers AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM assign a JOIN assign b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  JOIN nn na ON na.vec_id = a.vec_id
       |  JOIN nn nb ON nb.vec_id = b.vec_id
       |  WHERE list_sum(list_transform(range(1, 65),
       |                                i -> na.v[i] * nb.v[i]))
       |          / (na.nrm * nb.nrm) >= 0.45)
       |SELECT a.vec_id, CAST(a.cluster AS INT) AS cluster,
       |       CASE WHEN l.vec_id IS NOT NULL THEN 'drop' ELSE 'keep' END
       |         AS verdict
       |FROM assign a LEFT JOIN losers l ON a.vec_id = l.vec_id""".stripMargin) {
    (s, d) =>
      graft.operators.Similarity.semanticDedup(
        embeddings(s, d), "vec_id", "embedding", threshold = 0.45)
  }

  /** Span cut (Lee et al. second half): q_d9 profiles duplicated spans;
    * this rewrites the text with every token covered by a ≥2-doc trigram
    * removed. The oracle recomputes the whole cut independently: positional
    * trigrams → duplicated set by distinct-doc count → covered positions →
    * ordered surviving-token join. Hash-certified, so the Spark Column
    * program (xxhash64 span hashes, array_except position filter) must
    * reproduce DuckDB's string-level recomputation byte-for-byte. */
  val qD11SpanCut = Q(
    "q_d11_span_cut",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |tri AS (SELECT doc_id, u.i, t[u.i] || ' ' || t[u.i+1] || ' ' ||
      |               t[u.i+2] AS g
      |        FROM toks, unnest(range(1, len(t) - 1)) AS u(i)),
      |dup AS (SELECT g FROM tri GROUP BY g
      |        HAVING count(DISTINCT doc_id) >= 2),
      |cut AS (SELECT DISTINCT tri.doc_id, u2.j
      |        FROM tri JOIN dup USING (g),
      |             unnest([tri.i, tri.i + 1, tri.i + 2]) AS u2(j)),
      |cuts AS (SELECT doc_id, list(j) AS cj FROM cut GROUP BY doc_id),
      |j AS (SELECT toks.doc_id, toks.t, coalesce(cuts.cj, []) AS cj
      |      FROM toks LEFT JOIN cuts USING (doc_id))
      |SELECT doc_id,
      |       coalesce(array_to_string(list_transform(
      |         list_filter(range(1, len(t) + 1),
      |                     p -> NOT list_contains(cj, p)),
      |         p -> t[p]), ' '), '') AS clean_text,
      |       CAST(len(cj) AS BIGINT) AS n_cut_tokens
      |FROM j""".stripMargin) { (s, d) =>
    Dedup.cutDuplicatedSpans(documents(s, d), "doc_id", "text")
  }

  val all: Seq[Q] =
    Seq(qD1Exact, qD2NgramJaccard, qD3MinHashLsh, qD4SimHash, qD5EmbedNearDup,
      qD6DupClusters, qD7Incremental, qD8EmbedClusters, qD9DupSpans,
      qD10SemDedup, qD11SpanCut)
}
