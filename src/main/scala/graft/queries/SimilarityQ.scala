package graft.queries

import org.apache.spark.sql.functions.{col, md5, to_json}
import graft.Tables._
import graft.operators.Similarity

/** Similarity-search certification: brute-force cosine top-k is the exact
  * oracle'd baseline; hyperplane-LSH is the approximate scale path
  * (rows-only — recall is probabilistic by construction). */
object SimilarityQ {

  val qX1TopK = Q(
    "q_x1_ann_topk",
    """WITH e AS (SELECT vec_id,
      |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS sim
      |      FROM n q JOIN n c
      |        ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
      |r AS (SELECT query_id, cand_id, sim,
      |             row_number() OVER (PARTITION BY query_id
      |                                ORDER BY sim DESC, cand_id) AS rn
      |      FROM p)
      |SELECT query_id, cand_id, CAST(rn AS BIGINT) AS rank, sim
      |FROM r WHERE rn <= 5""".stripMargin) { (s, d) =>
    val n = Similarity.normed(embeddings(s, d), "vec_id", "embedding")
    Similarity.bruteForceTopK(n.filter(col("vec_id") < 8), n, k = 5)
  }

  /** Hyperplane-LSH top-k, HASH-CERTIFIED: with fixed LCG hyperplanes
    * the banding is fully deterministic, so the oracle replays it — a
    * recursive CTE regenerates the identical LCG sequence (the
    * mod-2^64 state in HUGEINT; value = (s >>> 11) / 2^53 * 2 - 1 is
    * exact in both engines), buckets are the same sign-bit ORs, the
    * multi-probe single-bit flips are XORs, and the cosine re-rank
    * mirrors q_x1. Only the plane-dot SIGNS must agree across engines
    * (never near zero on real data); sims canonicalize at %.10g. */
  val qX2LshTopK = Q(
    "q_x2_ann_lsh",
    """WITH RECURSIVE lcg(n, s) AS (
      |  SELECT 0, CAST(42 AS HUGEINT)
      |  UNION ALL
      |  SELECT n + 1,
      |         (s * 6364136223846793005 + 1442695040888963407)
      |           % CAST(18446744073709551616 AS HUGEINT)
      |  FROM lcg WHERE n < 4608),
      |vals AS (
      |  SELECT n,
      |         CAST(s // 2048 AS DOUBLE) / 9007199254740992.0 * 2.0 - 1.0
      |           AS w
      |  FROM lcg WHERE n >= 1),
      |pl AS (
      |  SELECT (n - 1) // 64 AS g, list(w ORDER BY n) AS w
      |  FROM vals GROUP BY 1),
      |e AS (SELECT vec_id,
      |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |      FROM embeddings),
      |dots AS (
      |  SELECT e.vec_id, pl.g,
      |         list_sum(list_transform(range(1, 65),
      |                                 i -> e.v[i] * pl.w[i])) AS d
      |  FROM e CROSS JOIN pl),
      |b AS (
      |  SELECT vec_id, g // 6 AS t,
      |         CAST(sum(CASE WHEN d > 0
      |                       THEN 1 << (g % 6) ELSE 0 END) AS BIGINT) AS bk
      |  FROM dots GROUP BY 1, 2),
      |probes AS (
      |  SELECT vec_id AS q_id, t, xor(bk, f.bit) AS qbk
      |  FROM b CROSS JOIN (VALUES (0),(1),(2),(4),(8),(16),(32)) f(bit)
      |  WHERE vec_id < 8),
      |cand AS (
      |  SELECT DISTINCT p.q_id AS query_id, c.vec_id AS cand_id
      |  FROM probes p JOIN b c ON p.t = c.t AND p.qbk = c.bk
      |  WHERE c.vec_id <> p.q_id),
      |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |scored AS (
      |  SELECT cand.query_id, cand.cand_id,
      |         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS sim
      |  FROM cand JOIN nn q ON q.vec_id = cand.query_id
      |            JOIN nn c ON c.vec_id = cand.cand_id),
      |r AS (
      |  SELECT query_id, cand_id, sim,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY sim DESC, cand_id) AS rn
      |  FROM scored)
      |SELECT query_id, cand_id, CAST(rn AS BIGINT) AS rank, sim
      |FROM r WHERE rn <= 5""".stripMargin) { (s, d) =>
    Similarity.lshTopK(embeddings(s, d), "vec_id", "embedding",
      queryPred = col("vec_id") < 8, k = 5, dim = 64)
  }

  val qX3IvfTopK = Q.rowsOnly("q_x3_ann_ivf") { (s, d) =>
    Similarity.ivfTopK(embeddings(s, d), "vec_id", "embedding",
      queryPred = col("vec_id") < 8, k = 5)
  }

  /** Embedding k-means assignment (deterministic hash-sampled training,
    * literal-centroid map-side argmax). Engine-specific float iteration →
    * rows-only; determinism + planted-cluster purity pinned in specs. */
  val qX4KMeans = Q.rowsOnly("q_x4_kmeans") { (s, d) =>
    Similarity.kMeansAssign(embeddings(s, d), "vec_id", "embedding")
  }

  /** Diversity subsample: ≤ 32 vectors per k-means cluster by
    * deterministic hash draw (two-level bounded selection). */
  val qX5Diversity = Q.rowsOnly("q_x5_diversity") { (s, d) =>
    Similarity.diversitySample(embeddings(s, d), "vec_id", "embedding",
      perCluster = 32)
  }

  /** Johnson–Lindenstrauss random projection 64→16 dims (deterministic
    * LCG planes; the pre-filter in front of dense similarity work).
    * Rows-only — a 16-term double dot per output element has no tractable
    * hash-stable SQL twin; RecallSpec pins the measured cosine distortion
    * and top-k overlap floors. The digest column makes the rows-only sort
    * stable (the harness cannot order raw arrays). */
  val qX6RandomProjection = Q.rowsOnly("q_x6_random_projection") { (s, d) =>
    Similarity.randomProjection(embeddings(s, d), "vec_id", "embedding",
        outDim = 16)
      .select(col("vec_id"),
        md5(to_json(col("proj")).cast("binary")).as("proj_digest"))
  }

  /** Product-quantization ANN: 8-byte codes (32× compression of the
    * 64-float embeddings), ADC scan with bounded per-partition heaps,
    * exact-cosine re-rank of the 4·k shortlist. Probabilistic recall →
    * rows-only; RecallSpec pins the floor and the index-path equality. */
  val qX7PqTopK = Q.rowsOnly("q_x7_ann_pq") { (s, d) =>
    Similarity.pqTopK(embeddings(s, d), "vec_id", "embedding",
      queryPred = col("vec_id") < 8, k = 5)
  }

  /** Embedding-quality screen: squared distance to the per-label centroid
    * with a >2×-label-mean outlier flag. CERTIFIED (unlike the ANN family)
    * because both the centroid and the distance live on fixed-point
    * integer grids — order-free exact sums both engines reproduce, with
    * only deterministic per-component IEEE math in between. */
  val qX8CentroidOutliers = Q(
    "q_x8_centroid_outliers",
    """WITH e AS (SELECT vec_id, label,
      |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |x AS (SELECT label, v, unnest(range(1, len(v) + 1)) AS i FROM e),
      |cent AS (SELECT label, i,
      |           sum(CAST(round(v[i] * 1000000) AS BIGINT)) AS s,
      |           CAST(count(*) AS BIGINT) AS n
      |         FROM x GROUP BY 1, 2),
      |carr AS (SELECT label,
      |           list(CAST(s AS DOUBLE) / 1000000.0 / n ORDER BY i) AS cv
      |         FROM cent GROUP BY 1),
      |d AS (SELECT e.vec_id, e.label,
      |        CAST(list_sum(list_transform(range(1, len(v) + 1),
      |          i -> CAST(round((v[i] - cv[i]) * (v[i] - cv[i])
      |                          * 1000000000) AS BIGINT)))
      |             AS BIGINT) AS d2q
      |      FROM e JOIN carr ON e.label = carr.label),
      |m AS (SELECT label, CAST(sum(d2q) AS BIGINT) AS sum_d2q,
      |             CAST(count(*) AS BIGINT) AS n
      |      FROM d GROUP BY 1)
      |SELECT d.vec_id, d.label, d.d2q,
      |       CAST(m.sum_d2q AS DOUBLE) / m.n AS label_mean_d2q,
      |       CAST(d.d2q AS DOUBLE) >
      |         2.0 * (CAST(m.sum_d2q AS DOUBLE) / m.n) AS is_outlier
      |FROM d JOIN m ON d.label = m.label""".stripMargin) { (s, d) =>
    Similarity.centroidOutliers(embeddings(s, d),
      "vec_id", "embedding", "label", multiple = 2.0)
  }

  /** IVF-PQ: coarse-quantizer pruning over PQ codes with exact re-rank —
    * the canonical billion-scale ANN composition (only probed lists are
    * read, and what is read is 8 B codes). Rows-only: both approximation
    * sources compose; RecallSpec pins the floor and one-shot/index
    * equality. */
  val qX9IvfPqTopK = Q.rowsOnly("q_x9_ann_ivfpq") { (s, d) =>
    Similarity.ivfPqTopK(embeddings(s, d), "vec_id", "embedding",
      queryPred = col("vec_id") < 8, k = 5)
  }

  /** The DISTRIBUTED large-batch external-query IVF-PQ path: the whole
    * embeddings table probes its own prebuilt index as an external query
    * frame — no driver collect of queries, candidates from the list
    * equi-join, exact salted two-level shortlist (IvfPqJoinSpec pins
    * row-equality with the collect path; rows-only here like every ANN
    * approximation). */
  val qX10IvfPqJoin = Q.rowsOnly("q_x10_ann_ivfpq_join") { (s, d) =>
    val emb = embeddings(s, d)
    Similarity.ivfPqTopKJoin(
      Similarity.ivfPqIndexBuild(emb, "vec_id", "embedding"),
      emb, "vec_id", "embedding", k = 5)
  }

  val all: Seq[Q] =
    Seq(qX1TopK, qX2LshTopK, qX3IvfTopK, qX4KMeans, qX5Diversity,
      qX6RandomProjection, qX7PqTopK, qX8CentroidOutliers, qX9IvfPqTopK,
      qX10IvfPqJoin)
}
