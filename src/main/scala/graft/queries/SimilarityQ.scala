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

  // ---- q_x3 oracle: full deterministic replay of the IVF path --------
  // The coarse quantizer is seeded and deterministic end to end
  // (xxhash64-ordered sample, strict-tie Lloyd's, left-fold double
  // sums), so DuckDB can replay ALL of it and the query hash-certifies.
  // The helpers below emit 64-bit-wrapping arithmetic in HUGEINT (a
  // 64×64 product overflows 128-bit, hence the split multiply).

  /** `(a * b) mod 2^64` for a < 2^64 and a constant b < 2^64. */
  private def mulmod(a: String, b: String): String =
    s"(((($a) % 4294967296) * $b" +
      s" + (((($a) // 4294967296) * $b) % 4294967296) * 4294967296)" +
      " % 18446744073709551616)"

  /** 64-bit rotate-left: high and low parts land in disjoint bit ranges,
    * so `+` is `|`. */
  private def rotl(a: String, r: Int): String =
    s"(((($a) * ${1L << r}) % 18446744073709551616)" +
      s" + (($a) // ${1L << (64 - r)}))"

  private def xorshift(a: String, k: Int): String =
    s"xor(($a), ($a) // ${1L << k})"

  /** One Lloyd iteration over `samples`, `cents$p` → `cents$n`: strict
    * argmax (ties → lowest list id), per-dimension sums folded in sample
    * (xxhash) order, means unit-normalized — each float op in the same
    * sequence the driver loop runs it. Empty lists keep their previous
    * centroid (the coalesce). */
  private def lloyd(p: Int, n: Int): String =
    s"""d$n AS (
       |  SELECT s.vec_id, s.ord, s.v, c.c,
       |         list_sum(list_transform(range(1, 65),
       |                                 i -> s.v[i] * c.cent[i])) AS d
       |  FROM samples s CROSS JOIN cents$p c),
       |a$n AS (
       |  SELECT vec_id, ord, v, c,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY d DESC, c) AS rn
       |  FROM d$n),
       |m$n AS (
       |  SELECT c, i, list_sum(list(v[i] ORDER BY ord)) / count(*) AS m
       |  FROM a$n, unnest(range(1, 65)) u(i)
       |  WHERE rn = 1 GROUP BY c, i),
       |w$n AS (SELECT c, list(m ORDER BY i) AS w FROM m$n GROUP BY c),
       |nc$n AS (
       |  SELECT c, list_transform(w, x -> x /
       |           sqrt(list_sum(list_transform(w, y -> y * y)))) AS cent
       |  FROM w$n),
       |cents$n AS (
       |  SELECT p.c, coalesce(n2.cent, p.cent) AS cent
       |  FROM cents$p p LEFT JOIN nc$n n2 ON p.c = n2.c)""".stripMargin

  /** Spark's `xxhash64(BIGINT)` (XXH64.hashLong, seed 42) as staged
    * CTEs `x0…x6` + `xx` over `e(vec_id, v)` — validated value-exact
    * against Spark for the id range. Primes are the XXH64 constants as
    * unsigned decimals; the final CASE re-signs to Spark's BIGINT. */
  private def xxhashCtes: String = {
    val T = "18446744073709551616"
    val p1 = "11400714785074694791"; val p2 = "14029467366897019727"
    val p3 = "1609587929392839161"; val p4 = "9650029242287828579"
    val h0 = "2870177450012600311" // seed 42 + PRIME64_5 + 8
    s"""x0 AS (SELECT vec_id,
       |  ((CAST(vec_id AS HUGEINT) % $T) + $T) % $T AS u FROM e),
       |x1 AS (SELECT vec_id, ${mulmod("u", p2)} AS k1 FROM x0),
       |x2 AS (SELECT vec_id, ${mulmod(rotl("k1", 31), p1)} AS k3 FROM x1),
       |x3 AS (SELECT vec_id,
       |  ${rotl(s"xor(CAST($h0 AS HUGEINT), k3)", 27)} AS h2 FROM x2),
       |x4 AS (SELECT vec_id,
       |  (${mulmod("h2", p1)} + $p4) % $T AS h3 FROM x3),
       |x5 AS (SELECT vec_id,
       |  ${mulmod(xorshift("h3", 33), p2)} AS h5 FROM x4),
       |x6 AS (SELECT vec_id,
       |  ${mulmod(xorshift("h5", 29), p3)} AS h7 FROM x5),
       |xx AS (SELECT vec_id,
       |  CAST(CASE WHEN ${xorshift("h7", 32)} >= 9223372036854775808
       |            THEN ${xorshift("h7", 32)} - $T
       |            ELSE ${xorshift("h7", 32)} END AS BIGINT) AS xx
       |  FROM x6)""".stripMargin
  }

  /** IVF top-k, HASH-CERTIFIED by full deterministic replay: the oracle
    * regenerates the ENTIRE trained quantizer — xxhash64 replayed in
    * wrapping HUGEINT arithmetic orders the training sample exactly as
    * Spark's `orderBy(xxhash64(vec_id), vec_id)` does, the 16 initial
    * centroids are that order's head, and three unrolled Lloyd
    * iterations repeat the driver loop with every double folded in the
    * same sequence (list_sum ≡ the left-fold `DoubleDot` kernel, means
    * then unit-norm, strict ties to the lowest list) — then soft-assigns
    * the corpus to its top-[[Similarity.IvfAssign]] lists, probes the
    * queries' top-[[Similarity.IvfProbes]], and re-ranks candidates by
    * exact cosine, mirroring q_x1. Assumes the corpus fits the training
    * sample cap ([[Similarity.IvfSample]] = 2048; true at every test
    * SF, where the sample is therefore the whole corpus) and dim 64. */
  val qX3IvfTopK = Q(
    "q_x3_ann_ivf",
    s"""WITH e AS (SELECT vec_id,
       |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |           FROM embeddings),
       |$xxhashCtes,
       |samples AS (
       |  SELECT e.vec_id, e.v,
       |         row_number() OVER (ORDER BY xx.xx, e.vec_id) AS ord
       |  FROM e JOIN xx ON e.vec_id = xx.vec_id),
       |cents0 AS (
       |  SELECT ord - 1 AS c,
       |         list_transform(v, x -> x /
       |           sqrt(list_sum(list_transform(v, y -> y * y)))) AS cent
       |  FROM samples WHERE ord <= 16),
       |${lloyd(0, 1)},
       |${lloyd(1, 2)},
       |${lloyd(2, 3)},
       |corpd AS (
       |  SELECT e.vec_id, c.c,
       |         list_sum(list_transform(range(1, 65),
       |                                 i -> e.v[i] * c.cent[i])) AS d
       |  FROM e CROSS JOIN cents3 c),
       |corplists AS (
       |  SELECT vec_id, c AS list_id
       |  FROM (SELECT vec_id, c,
       |               row_number() OVER (PARTITION BY vec_id
       |                                  ORDER BY d DESC, c) AS rn
       |        FROM corpd)
       |  WHERE rn <= 2),
       |qrylists AS (
       |  SELECT vec_id AS q_id, c AS list_id
       |  FROM (SELECT vec_id, c,
       |               row_number() OVER (PARTITION BY vec_id
       |                                  ORDER BY d DESC, c) AS rn
       |        FROM corpd WHERE vec_id < 8)
       |  WHERE rn <= 6),
       |cand AS (
       |  SELECT DISTINCT q.q_id AS query_id, cl.vec_id AS cand_id
       |  FROM qrylists q JOIN corplists cl ON q.list_id = cl.list_id
       |  WHERE cl.vec_id <> q.q_id),
       |nn AS (SELECT vec_id, v,
       |              sqrt(list_sum(list_transform(range(1, 65),
       |                                           i -> v[i] * v[i])))
       |                AS nrm
       |       FROM e),
       |scored AS (
       |  SELECT cand.query_id, cand.cand_id,
       |         list_sum(list_transform(range(1, 65),
       |                                 i -> q.v[i] * c.v[i]))
       |           / (q.nrm * c.nrm) AS sim
       |  FROM cand JOIN nn q ON q.vec_id = cand.query_id
       |            JOIN nn c ON c.vec_id = cand.cand_id),
       |r AS (SELECT query_id, cand_id, sim,
       |             row_number() OVER (PARTITION BY query_id
       |                                ORDER BY sim DESC, cand_id) AS rn
       |      FROM scored)
       |SELECT query_id, cand_id, CAST(rn AS BIGINT) AS rank, sim
       |FROM r WHERE rn <= 5""".stripMargin) { (s, d) =>
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
