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

  /** The shared replayed-quantizer prelude: `e` (doubles), `xx`
    * (xxhash64), `samples` (the training order), `cents0…cents3` (three
    * Lloyd iterations), `corpd` (every vector's dot against every final
    * centroid). q_x3/q_x4/q_x5 all append their own tails. Assumes the
    * corpus fits the training sample cap ([[Similarity.IvfSample]] =
    * 2048; true at every test SF, where the sample is therefore the
    * whole corpus) and dim 64. */
  private[queries] def quantizerCtes: String =
    s"""e AS (SELECT vec_id,
       |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |      FROM embeddings),
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
       |  FROM e CROSS JOIN cents3 c)""".stripMargin

  /** One per-subspace PQ Lloyd iteration, `pq{mi}_p` → `pq{mi}_n`: the
    * [[Similarity.pqCodebooks]] driver loop — argMIN L2 over the 8-dim
    * slice (each squared term added left-to-right, ties → lowest code),
    * plain per-dimension means in sample order (no re-normalization),
    * empty cells keep their codeword. */
  private def pqLloyd(mi: Int, p: Int, n: Int): String = {
    val off = mi * 8
    s"""pd${mi}_$n AS (
       |  SELECT s.ord, s.u, c.c,
       |         list_sum(list_transform(range(1, 9),
       |           i -> (s.u[$off + i] - c.cent[i])
       |              * (s.u[$off + i] - c.cent[i]))) AS d
       |  FROM usamples s CROSS JOIN pq${mi}_$p c),
       |pa${mi}_$n AS (
       |  SELECT ord, u, c,
       |         row_number() OVER (PARTITION BY ord ORDER BY d, c) AS rn
       |  FROM pd${mi}_$n),
       |pm${mi}_$n AS (
       |  SELECT c, i,
       |         list_sum(list(u[$off + i] ORDER BY ord)) / count(*) AS m
       |  FROM pa${mi}_$n, unnest(range(1, 9)) t(i)
       |  WHERE rn = 1 GROUP BY c, i),
       |pw${mi}_$n AS (
       |  SELECT c, list(m ORDER BY i) AS w FROM pm${mi}_$n GROUP BY c),
       |pq${mi}_$n AS (
       |  SELECT p.c, coalesce(n2.w, p.cent) AS cent
       |  FROM pq${mi}_$p p LEFT JOIN pw${mi}_$n n2 ON p.c = n2.c)""".stripMargin
  }

  /** The PQ replay prelude shared by q_x7/q_x9/q_x10: unit sample and
    * corpus frames, the eight trained codebooks (init = the first
    * min(256, sample) unit-sample slices, then [[pqLloyd]]×3), the
    * corpus byte codes (argMIN per subspace), and the per-query ADC
    * lookup tables. `qFilter` restricts the LUT query set (empty =
    * every corpus vector queries, the q_x10 shape). Appends after
    * [[quantizerCtes]], which supplies `e`/`samples`. */
  private def pqCtes(qFilter: String): String = {
    val books = (0 until 8).map { mi =>
      val off = mi * 8
      s"""pq${mi}_0 AS (
         |  SELECT ord - 1 AS c, u[$off + 1 : $off + 8] AS cent
         |  FROM usamples WHERE ord <= 256),
         |${pqLloyd(mi, 0, 1)},
         |${pqLloyd(mi, 1, 2)},
         |${pqLloyd(mi, 2, 3)}""".stripMargin
    }.mkString(",\n")
    val encs = (0 until 8).map { mi =>
      val off = mi * 8
      s"""enc$mi AS (
         |  SELECT e2.vec_id, $mi AS mi, e2.c AS code
         |  FROM (SELECT vec_id, c,
         |               row_number() OVER (PARTITION BY vec_id
         |                                  ORDER BY d, c) AS rn
         |        FROM (SELECT uc.vec_id, c.c,
         |                     list_sum(list_transform(range(1, 9),
         |                       i -> (uc.u[$off + i] - c.cent[i])
         |                          * (uc.u[$off + i] - c.cent[i]))) AS d
         |              FROM ucorpus uc CROSS JOIN pq${mi}_3 c))
         |       e2(vec_id, c, rn)
         |  WHERE e2.rn = 1)""".stripMargin
    }.mkString(",\n")
    val luts = (0 until 8).map { mi =>
      val off = mi * 8
      s"""lut$mi AS (
         |  SELECT q.vec_id AS q_id, $mi AS mi, c.c AS code,
         |         list_sum(list_transform(range(1, 9),
         |           i -> (q.u[$off + i] - c.cent[i])
         |              * (q.u[$off + i] - c.cent[i]))) AS dv
         |  FROM ucorpus q CROSS JOIN pq${mi}_3 c$qFilter)""".stripMargin
    }.mkString(",\n")
    s"""nrm0 AS (SELECT vec_id,
       |              sqrt(list_sum(list_transform(range(1, 65),
       |                                           i -> v[i] * v[i])))
       |                AS nrm
       |       FROM e),
       |usamples AS (
       |  SELECT s.ord, s.vec_id, list_transform(s.v, x -> x / n.nrm) AS u
       |  FROM samples s JOIN nrm0 n ON s.vec_id = n.vec_id),
       |ucorpus AS (
       |  SELECT e.vec_id, list_transform(e.v, x -> x / n.nrm) AS u
       |  FROM e JOIN nrm0 n ON e.vec_id = n.vec_id),
       |$books,
       |$encs,
       |$luts,
       |codes AS (${(0 until 8).map(mi => s"SELECT * FROM enc$mi")
      .mkString(" UNION ALL ")}),
       |luts AS (${(0 until 8).map(mi => s"SELECT * FROM lut$mi")
      .mkString(" UNION ALL ")})""".stripMargin
  }

  /** The shared ADC-shortlist-rerank tail: asymmetric distances summed
    * in subspace order per (query, candidate), global top-80 shortlist
    * by (adist, the id's decimal string — ASCII order ≡ Spark's UTF-8
    * byte order), exact cosine re-rank top-5. `candCte` supplies the
    * (q_id, cand_id) pairs to score. */
  private def adcTail(candCte: String): String =
    s"""$candCte,
       |adist AS (
       |  SELECT ca.q_id, ca.cand_id,
       |         list_sum(list(l.dv ORDER BY l.mi)) AS d
       |  FROM cand ca
       |  JOIN codes c ON c.vec_id = ca.cand_id
       |  JOIN luts l ON l.q_id = ca.q_id AND l.mi = c.mi
       |             AND l.code = c.code
       |  GROUP BY ca.q_id, ca.cand_id),
       |short AS (
       |  SELECT q_id, cand_id,
       |         row_number() OVER (PARTITION BY q_id
       |                            ORDER BY d, CAST(cand_id AS VARCHAR))
       |           AS rn
       |  FROM adist),
       |scored AS (
       |  SELECT s.q_id AS query_id, s.cand_id,
       |         list_sum(list_transform(range(1, 65),
       |                                 i -> q.v[i] * c.v[i]))
       |           / (qn.nrm * cn.nrm) AS sim
       |  FROM short s
       |  JOIN e q ON q.vec_id = s.q_id
       |  JOIN e c ON c.vec_id = s.cand_id
       |  JOIN nrm0 qn ON qn.vec_id = s.q_id
       |  JOIN nrm0 cn ON cn.vec_id = s.cand_id
       |  WHERE s.rn <= 80),
       |r AS (SELECT query_id, cand_id, sim,
       |             row_number() OVER (PARTITION BY query_id
       |                                ORDER BY sim DESC, cand_id) AS rn
       |      FROM scored)
       |SELECT query_id, cand_id, CAST(rn AS BIGINT) AS rank, sim
       |FROM r WHERE rn <= 5""".stripMargin

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
    * exact cosine, mirroring q_x1. */
  val qX3IvfTopK = Q(
    "q_x3_ann_ivf",
    s"""WITH $quantizerCtes,
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

  /** Embedding k-means assignment, HASH-CERTIFIED: the replayed
    * quantizer ([[quantizerCtes]]) plus a strict argmax per vector
    * (ties → lowest cluster) and `cos_sim = dot / nrm` — the float
    * "iteration" is deterministic left-fold arithmetic both engines
    * evaluate identically, so the whole training certifies, not just
    * the assignment. */
  val qX4KMeans = Q(
    "q_x4_kmeans",
    s"""WITH $quantizerCtes,
       |nrm AS (SELECT vec_id,
       |               sqrt(list_sum(list_transform(range(1, 65),
       |                                            i -> v[i] * v[i])))
       |                 AS nrm
       |        FROM e),
       |best AS (
       |  SELECT vec_id, c, d,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY d DESC, c) AS rn
       |  FROM corpd)
       |SELECT b.vec_id, CAST(b.c AS INT) AS cluster,
       |       b.d / n.nrm AS cos_sim
       |FROM best b JOIN nrm n ON b.vec_id = n.vec_id
       |WHERE b.rn = 1""".stripMargin) { (s, d) =>
    Similarity.kMeansAssign(embeddings(s, d), "vec_id", "embedding")
  }

  /** Diversity subsample, HASH-CERTIFIED: ≤ 32 per replayed-quantizer
    * cluster by the deterministic hash draw — rank by (xxhash64(vec_id),
    * the id's decimal string) inside each cluster; ASCII-digit VARCHAR
    * order equals Spark's UTF-8-byte string order, so the tie-break
    * replays exactly too. */
  val qX5Diversity = Q(
    "q_x5_diversity",
    s"""WITH $quantizerCtes,
       |best AS (
       |  SELECT vec_id, c AS cluster,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY d DESC, c) AS rn
       |  FROM corpd),
       |ranked AS (
       |  SELECT b.vec_id, b.cluster,
       |         row_number() OVER (PARTITION BY b.cluster
       |                            ORDER BY x.xx,
       |                                     CAST(b.vec_id AS VARCHAR))
       |           AS r
       |  FROM best b JOIN xx x ON b.vec_id = x.vec_id
       |  WHERE b.rn = 1)
       |SELECT vec_id, CAST(cluster AS INT) AS cluster
       |FROM ranked WHERE r <= 32""".stripMargin) { (s, d) =>
    Similarity.diversitySample(embeddings(s, d), "vec_id", "embedding",
      perCluster = 32)
  }

  /** Johnson–Lindenstrauss random projection 64→16 dims, HASH-CERTIFIED:
    * the q_x2 recursive-CTE LCG regenerates the 16 planes (first 1024
    * values of the shared sequence), each output element is the same
    * left-fold dot scaled by the exact power-of-two 1/4 (DuckDB's `/4`
    * ≡ Spark's `*0.25` bit-for-bit), and the 16 elements ride as scalar
    * columns so the harness can sort and hash them directly — the digest
    * workaround the rows-only era needed is gone. RecallSpec keeps the
    * distortion and top-k overlap floors. */
  val qX6RandomProjection = Q(
    "q_x6_random_projection",
    s"""WITH RECURSIVE lcg(n, s) AS (
       |  SELECT 0, CAST(42 AS HUGEINT)
       |  UNION ALL
       |  SELECT n + 1,
       |         (s * 6364136223846793005 + 1442695040888963407)
       |           % CAST(18446744073709551616 AS HUGEINT)
       |  FROM lcg WHERE n < 1024),
       |vals AS (
       |  SELECT n,
       |         CAST(s // 2048 AS DOUBLE) / 9007199254740992.0 * 2.0 - 1.0
       |           AS w
       |  FROM lcg WHERE n >= 1),
       |pl AS (
       |  SELECT (n - 1) // 64 AS j, list(w ORDER BY n) AS w
       |  FROM vals GROUP BY 1),
       |e AS (SELECT vec_id,
       |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |      FROM embeddings),
       |p AS (SELECT e.vec_id, pl.j,
       |             list_sum(list_transform(range(1, 65),
       |                                     i -> e.v[i] * pl.w[i]))
       |               / 4.0 AS pv
       |      FROM e CROSS JOIN pl)
       |SELECT vec_id,
       |${(0 until 16).map(j =>
      s"       max(CASE WHEN j = $j THEN pv END) AS p$j").mkString(",\n")}
       |FROM p GROUP BY vec_id""".stripMargin) { (s, d) =>
    val proj = Similarity.randomProjection(
      embeddings(s, d), "vec_id", "embedding", outDim = 16)
    proj.select(col("vec_id") +:
      (0 until 16).map(j => col("proj").getItem(j).as(s"p$j")): _*)
  }

  /** Product-quantization ANN, HASH-CERTIFIED: 8-byte codes (32×
    * compression of the 64-float embeddings), ADC scan with bounded
    * per-partition heaps, exact-cosine re-rank of the shortlist. The
    * recall is probabilistic, but the COMPUTATION is deterministic — the
    * oracle replays codebook training per subspace ([[pqLloyd]]), the
    * corpus byte codes, every ADC lookup value, the (adist, id-bytes)
    * shortlist order, and the re-rank, all in the same left-fold float
    * sequences. RecallSpec still pins the quality floor. */
  val qX7PqTopK = Q(
    "q_x7_ann_pq",
    s"""WITH $quantizerCtes,
       |${pqCtes(" WHERE q.vec_id < 8")},
       |${adcTail(
      """cand AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id
        |  FROM ucorpus q CROSS JOIN ucorpus c
        |  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id)""".stripMargin)}"""
      .stripMargin) {
    (s, d) =>
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

  /** Coarse-probe CTEs for the IVF-PQ tails: soft-assigned corpus lists
    * (top-2 by raw-vector dot, the [[Similarity.ivfListRows]] shape) and
    * per-query probed lists (top-6 by UNIT-vector dot — the collect
    * path's driver-side probe selection; argmax-equivalent to raw, and
    * the replay mirrors the actual arithmetic). */
  private def ivfPqProbeCtes(qFilter: String): String =
    s"""corplists AS (
       |  SELECT vec_id, c AS list_id
       |  FROM (SELECT vec_id, c,
       |               row_number() OVER (PARTITION BY vec_id
       |                                  ORDER BY d DESC, c) AS rn
       |        FROM corpd)
       |  WHERE rn <= 2),
       |qprobes AS (
       |  SELECT q_id, list_id
       |  FROM (SELECT uq.vec_id AS q_id, c.c AS list_id,
       |               row_number() OVER (PARTITION BY uq.vec_id
       |                 ORDER BY list_sum(list_transform(range(1, 65),
       |                   i -> uq.u[i] * c.cent[i])) DESC, c.c) AS rn
       |        FROM ucorpus uq CROSS JOIN cents3 c$qFilter)
       |  WHERE rn <= 6)""".stripMargin

  /** IVF-PQ, HASH-CERTIFIED: coarse-quantizer pruning over PQ codes
    * with exact re-rank — the canonical billion-scale ANN composition
    * (only probed lists are read, and what is read is 8 B codes). The
    * oracle composes the two replayed quantizers — coarse
    * ([[quantizerCtes]]) and product ([[pqCtes]]) — then candidates are
    * the soft-assigned corpus rows in the query's probed lists, deduped
    * before the ADC shortlist exactly as the ordered-set scan dedups.
    * RecallSpec still pins the composed recall floor. */
  val qX9IvfPqTopK = Q(
    "q_x9_ann_ivfpq",
    s"""WITH $quantizerCtes,
       |${pqCtes(" WHERE q.vec_id < 8")},
       |${ivfPqProbeCtes(" WHERE uq.vec_id < 8")},
       |${adcTail(
      """cand AS (
        |  SELECT DISTINCT p.q_id, cl.vec_id AS cand_id
        |  FROM qprobes p JOIN corplists cl ON p.list_id = cl.list_id
        |  WHERE cl.vec_id <> p.q_id)""".stripMargin)}""".stripMargin) {
    (s, d) =>
      Similarity.ivfPqTopK(embeddings(s, d), "vec_id", "embedding",
        queryPred = col("vec_id") < 8, k = 5)
  }

  /** The DISTRIBUTED large-batch external-query IVF-PQ path,
    * HASH-CERTIFIED: the whole embeddings table probes its own prebuilt
    * index as an external query frame — no driver collect of queries,
    * candidates from the list equi-join, codegen'd ADC bit-equal to the
    * LUT path, exact salted two-level shortlist. The oracle is the q_x9
    * replay with every corpus vector as a query and no self-exclusion
    * (the external-query contract); certifying it pins the whole
    * distributed pipeline — banded join, ADC expression, salted rank —
    * against the independent SQL restatement, row-for-row including
    * float sims. */
  val qX10IvfPqJoin = Q(
    "q_x10_ann_ivfpq_join",
    s"""WITH $quantizerCtes,
       |${pqCtes("")},
       |${ivfPqProbeCtes("")},
       |${adcTail(
      """cand AS (
        |  SELECT DISTINCT p.q_id, cl.vec_id AS cand_id
        |  FROM qprobes p JOIN corplists cl ON p.list_id = cl.list_id)"""
        .stripMargin)}""".stripMargin) { (s, d) =>
    val emb = embeddings(s, d)
    Similarity.ivfPqTopKJoin(
      Similarity.ivfPqIndexBuild(emb, "vec_id", "embedding"),
      emb, "vec_id", "embedding", k = 5)
  }

  /** SQ8 scalar-quantized ANN, HASH-CERTIFIED end to end — the only
    * compressed-ANN family member whose quantizer needs NO iterative
    * replay: training is one exact per-dimension min/max pass over the
    * unit corpus, so the oracle restates it directly (per-dim agg via the
    * list-valued `unnest(range(…))` fan-out), reconstructs each corpus
    * vector at the cell midpoint with the IDENTICAL IEEE double tree
    * (`mn + (clamp(floor((u−mn)/sp·256)) + 0.5)/256·sp`), and ranks by
    * the same asymmetric `1 − 2·q·r + ‖r‖²` distance. q_x1's query/k
    * shape, so recall against exact cosine is directly comparable
    * (RecallSpec pins the floor). */
  /** The SQ8 replay block shared by q_x11/q_x12 — assumes a CTE
    * `e(vec_id, v)` with double vectors: unit corpus, exact per-dim
    * min/max bounds (the whole "training"), and each corpus vector
    * reconstructed at its quantization-cell midpoint with the IDENTICAL
    * IEEE double tree the engine's [[Similarity.sq8ReconCol]] evaluates
    * (`mn + (clamp(floor((u−mn)/sp·256)) + 0.5)/256·sp`). */
  private def sq8Ctes: String =
    """uv AS (SELECT vec_id,
      |         list_transform(v, x -> x /
      |           sqrt(list_sum(list_transform(v, y -> y * y)))) AS u
      |       FROM e),
      |dims AS (SELECT i, min(u[i]) AS mn, max(u[i]) - min(u[i]) AS sp
      |         FROM (SELECT u, unnest(range(1, len(u) + 1)) AS i FROM uv)
      |         GROUP BY i),
      |mm AS (SELECT list(mn ORDER BY i) AS mn, list(sp ORDER BY i) AS sp
      |       FROM dims),
      |recon AS (SELECT c.vec_id,
      |            list_transform(range(1, len(c.u) + 1), i ->
      |              CASE WHEN m.sp[i] = 0 THEN m.mn[i]
      |                   ELSE m.mn[i]
      |                        + (least(greatest(floor((c.u[i] - m.mn[i])
      |                             / m.sp[i] * 256.0), 0.0), 255.0) + 0.5)
      |                          / 256.0 * m.sp[i] END) AS rv
      |          FROM uv c CROSS JOIN mm m)""".stripMargin

  val qX11Sq8TopK = Q(
    "q_x11_ann_sq8",
    s"""WITH e AS (SELECT vec_id,
      |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |$sq8Ctes,
      |p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |             (1.0 - 2.0 * list_dot_product(q.u, c.rv))
      |               + list_dot_product(c.rv, c.rv) AS d2
      |      FROM uv q JOIN recon c
      |        ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
      |r AS (SELECT query_id, cand_id, d2,
      |             row_number() OVER (PARTITION BY query_id
      |                                ORDER BY d2, cand_id) AS rn
      |      FROM p)
      |SELECT query_id, cand_id, CAST(rn AS BIGINT) AS rank, d2
      |FROM r WHERE rn <= 5""".stripMargin) { (s, d) =>
    val n = Similarity.normed(embeddings(s, d), "vec_id", "embedding")
    Similarity.sq8TopK(n.filter(col("vec_id") < 8), n, k = 5)
  }

  /** IVF-SQ8 composed ANN, HASH-CERTIFIED: the oracle composes the two
    * already-replayed quantizers — the coarse Lloyd-trained lists
    * ([[quantizerCtes]], soft-assigned corpus top-2 / query probes top-6
    * by raw-vector dot, the q_x3 shape) and the closed-form SQ8
    * min/max bounds + midpoint reconstruction ([[sq8Ctes]], the q_x11
    * shape) — then candidates are the DISTINCT (query, corpus) pairs
    * meeting in a probed list (the engine's min-agg dedup in mirror),
    * ranked by the same asymmetric `1 − 2·q·r + ‖r‖²`. Probabilistic
    * recall (RecallSpec floor), deterministic computation. */
  val qX12IvfSq8TopK = Q(
    "q_x12_ann_ivfsq8",
    s"""WITH $quantizerCtes,
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
       |$sq8Ctes,
       |cand AS (
       |  SELECT DISTINCT q.q_id AS query_id, cl.vec_id AS cand_id
       |  FROM qrylists q JOIN corplists cl ON q.list_id = cl.list_id
       |  WHERE cl.vec_id <> q.q_id),
       |p AS (SELECT cand.query_id, cand.cand_id,
       |             (1.0 - 2.0 * list_dot_product(q.u, c.rv))
       |               + list_dot_product(c.rv, c.rv) AS d2
       |      FROM cand JOIN uv q ON q.vec_id = cand.query_id
       |                JOIN recon c ON c.vec_id = cand.cand_id),
       |r AS (SELECT query_id, cand_id, d2,
       |             row_number() OVER (PARTITION BY query_id
       |                                ORDER BY d2, cand_id) AS rn
       |      FROM p)
       |SELECT query_id, cand_id, CAST(rn AS BIGINT) AS rank, d2
       |FROM r WHERE rn <= 5""".stripMargin) { (s, d) =>
    Similarity.ivfSq8TopK(embeddings(s, d), "vec_id", "embedding",
      queryPred = col("vec_id") < 8, k = 5)
  }

  /** The DISTRIBUTED large-batch external-query IVF-SQ8 path,
    * HASH-CERTIFIED: the whole embeddings table probes its own prebuilt
    * [[Similarity.IvfSq8Index]] as an external query frame — no driver
    * collect of queries, candidates from the (list_id) equi-join, the
    * codegen'd [[graft.functions.Sq8AdcDistance]] bit-equal to the
    * Column formulation, exact salted two-level shortlist. The oracle is
    * the q_x12 replay with every corpus vector as a query and no
    * self-exclusion (the external-query contract — the q_x10 shape for
    * the SQ8 family); certifying it pins the whole distributed
    * pipeline — probe join, packed-query ADC kernel, min-agg dedup,
    * salted rank — against the independent SQL restatement, row-for-row
    * including float d². */
  val qX13IvfSq8Join = Q(
    "q_x13_ann_ivfsq8_join",
    s"""WITH $quantizerCtes,
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
       |        FROM corpd)
       |  WHERE rn <= 6),
       |$sq8Ctes,
       |cand AS (
       |  SELECT DISTINCT q.q_id AS query_id, cl.vec_id AS cand_id
       |  FROM qrylists q JOIN corplists cl ON q.list_id = cl.list_id),
       |p AS (SELECT cand.query_id, cand.cand_id,
       |             (1.0 - 2.0 * list_dot_product(q.u, c.rv))
       |               + list_dot_product(c.rv, c.rv) AS d2
       |      FROM cand JOIN uv q ON q.vec_id = cand.query_id
       |                JOIN recon c ON c.vec_id = cand.cand_id),
       |r AS (SELECT query_id, cand_id, d2,
       |             row_number() OVER (PARTITION BY query_id
       |                                ORDER BY d2, cand_id) AS rn
       |      FROM p)
       |SELECT query_id, cand_id, CAST(rn AS BIGINT) AS rank, d2
       |FROM r WHERE rn <= 5""".stripMargin) { (s, d) =>
    val emb = embeddings(s, d)
    Similarity.ivfSq8TopKJoin(
      Similarity.ivfSq8IndexBuild(emb, "vec_id", "embedding"),
      emb, "vec_id", "embedding", k = 5)
  }

  /** q_x13 at a NON-DEFAULT operating point (probes=3 instead of 6,
    * salts=7 instead of 64), HASH-CERTIFIED — knob-plumbing insurance:
    * the oracle's probed-lists CTE is `rn <= 3`, so an engine that
    * silently ignored the probes knob would reproduce the default-6
    * candidates and hash-MISMATCH here (the r14 false-certification
    * episode is why the knobs get their own certified point), while a
    * broken salt path would break the exact two-level shortlist, whose
    * results must be salt-count-invariant. */
  val qX13bIvfSq8JoinTuned = Q(
    "q_x13b_ann_ivfsq8_join_tuned",
    s"""WITH $quantizerCtes,
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
       |        FROM corpd)
       |  WHERE rn <= 3),
       |$sq8Ctes,
       |cand AS (
       |  SELECT DISTINCT q.q_id AS query_id, cl.vec_id AS cand_id
       |  FROM qrylists q JOIN corplists cl ON q.list_id = cl.list_id),
       |p AS (SELECT cand.query_id, cand.cand_id,
       |             (1.0 - 2.0 * list_dot_product(q.u, c.rv))
       |               + list_dot_product(c.rv, c.rv) AS d2
       |      FROM cand JOIN uv q ON q.vec_id = cand.query_id
       |                JOIN recon c ON c.vec_id = cand.cand_id),
       |r AS (SELECT query_id, cand_id, d2,
       |             row_number() OVER (PARTITION BY query_id
       |                                ORDER BY d2, cand_id) AS rn
       |      FROM p)
       |SELECT query_id, cand_id, CAST(rn AS BIGINT) AS rank, d2
       |FROM r WHERE rn <= 5""".stripMargin) { (s, d) =>
    val emb = embeddings(s, d)
    Similarity.ivfSq8TopKJoin(
      Similarity.ivfSq8IndexBuild(emb, "vec_id", "embedding"),
      emb, "vec_id", "embedding", k = 5, probes = 3, salts = 7)
  }

  val all: Seq[Q] =
    Seq(qX1TopK, qX2LshTopK, qX3IvfTopK, qX4KMeans, qX5Diversity,
      qX6RandomProjection, qX7PqTopK, qX8CentroidOutliers, qX9IvfPqTopK,
      qX10IvfPqJoin, qX11Sq8TopK, qX12IvfSq8TopK, qX13IvfSq8Join,
      qX13bIvfSq8JoinTuned)
}
