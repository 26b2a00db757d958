package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Recall floors for the approximate ANN paths. Rows-only certification
  * checks shape, not quality — this spec turns the LSH and IVF operators
  * into testable contracts by measuring recall@5 against the exact
  * brute-force result on the sf0.1 embeddings (2,000 × 64-dim vectors,
  * 32 query vectors). Both operators are fully deterministic (fixed-seed
  * hyperplanes; hash-sampled k-means), so these are stable bounds, not
  * flaky statistics.
  *
  * The fixture is near-uniform random — the HARDEST regime for ANN (true
  * neighbors sit barely above background cosine), so the floors are set at
  * the measured operating points, not aspirational numbers: they exist to
  * catch structural regressions (single-table LSH measured 0.06 before the
  * multi-table rewrite; 2-probe IVF measured 0.39), and they hold with
  * margin on clustered real-world corpora.
  */
class RecallSpec extends AnyFunSuite {
  import GraftSpark.spark

  private val sf = "/root/testdata/sf0.1"
  private val K = 5
  private val pred = col("vec_id") < 32

  private def topSets(
      df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "cand_id").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

  private lazy val exact: Map[Long, Set[Long]] = {
    val n = Similarity.normed(Tables.embeddings(spark, sf),
      "vec_id", "embedding")
    topSets(Similarity.bruteForceTopK(n.filter(pred), n, K))
  }

  private def recallAt5(approx: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).count(truth).toDouble / truth.size
    }
    per.sum / per.size
  }

  test("hyperplane-LSH top-k recall@5 >= 0.9 on the sf0.1 embeddings") {
    val approx = topSets(Similarity.lshTopK(
      Tables.embeddings(spark, sf), "vec_id", "embedding", pred, K, dim = 64))
    val r = recallAt5(approx)
    println(f"lsh recall@5 = $r%.3f over ${exact.size} queries")
    assert(r >= 0.9, f"LSH recall collapsed: $r%.3f (12 tables + " +
      "single-bit multi-probe measured 0.99; single-table with no probing " +
      "measured 0.06)")
  }

  test("IVF top-k recall@5 >= 0.8 on the sf0.1 embeddings") {
    val approx = topSets(Similarity.ivfTopK(
      Tables.embeddings(spark, sf), "vec_id", "embedding", pred, K))
    val r = recallAt5(approx)
    println(f"ivf recall@5 = $r%.3f over ${exact.size} queries")
    assert(r >= 0.8, f"IVF recall collapsed: $r%.3f (16 lists, 6 probes, " +
      "2-way soft assignment measured 0.89 on this near-uniform fixture; " +
      "hard assignment measured 0.67)")
  }
}
