package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** The exact-vs-approx agreement contract of [[TextAnalysis.lmBuckets]]:
  * the approx path (GK sketch, `approx_percentile`) may relabel a document
  * relative to the exact-percentile path ONLY when that document's xent
  * rank sits within the sketch's guaranteed rank band (±n/accuracy, plus
  * one rank position because the exact path interpolates between values
  * while the sketch returns an actual element) of a tertile boundary.
  * This is the contract a 100×-scale user relies on when the exact path's
  * [[TextAnalysis.LmBucketsExactMaxDocs]] guard forces `exact = false`.
  */
class LmBucketsSpec extends AnyFunSuite {
  import GraftSpark.{spark, sf}

  private def docs = Tables.documents(spark, sf)

  private def labels(exact: Boolean, acc: Int = 10000): Map[Long, String] =
    TextAnalysis.lmBuckets(docs, "doc_id", "text",
        exact = exact, accuracyInverseEps = acc)
      .select(col("doc_id"), col("bucket"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  /** Doc ids relabeled by the approx path whose ascending-xent rank is
    * OUTSIDE `band + 1` of every tertile boundary — the contract says
    * this set must be empty. */
  private def offenders(acc: Int): Iterable[Long] = {
    val ex = labels(exact = true)
    val ap = labels(exact = false, acc)
    assert(ex.keySet == ap.keySet, "same scoreable documents on both paths")
    // minCount must match lmBuckets' default (2) or the xents differ
    val xents = TextAnalysis.lmScore(docs, "doc_id", "text", minCount = 2L)
      .select(col("doc_id"), col("xent"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val n = xents.length
    val band = n.toDouble / acc
    // tie-safe ranks: docs sharing an xent value share the whole tie
    // group's rank INTERVAL (sortBy's arbitrary tie order would
    // otherwise smear a boundary-straddling group and flag members far
    // from the boundary as spurious offenders)
    val sorted = xents.sortBy { case (id, x) => (x, id) }.zipWithIndex
    val rankRange: Map[Long, (Double, Double)] = sorted
      .groupBy(_._1._2)
      .flatMap { case (_, es) =>
        val lo = es.map(_._2).min + 1.0
        val hi = es.map(_._2).max + 1.0
        es.map { case ((id, _), _) => id -> ((lo, hi)) }
      }
    val boundaries = Seq(n / 3.0, 2.0 * n / 3.0)
    ex.keys.filter(k => ex(k) != ap(k)).filter { k =>
      val (lo, hi) = rankRange(k)
      // offender only when the ENTIRE tie interval sits outside the
      // band+1 window of every tertile boundary
      boundaries.forall(b => b < lo - band - 1.0 || b > hi + band + 1.0)
    }
  }

  test("default accuracy: any relabel is adjacent to a tertile boundary") {
    // rank error <= n/10000 < 1 on this corpus, so the only permitted
    // divergence is the interpolated-vs-element threshold at the cut
    // itself (the +1 in the band)
    val off = offenders(acc = 10000)
    assert(off.isEmpty,
      s"docs relabeled away from any boundary: ${off.take(5).toSeq}")
    assert(labels(exact = true).values.toSet ==
      Set("head", "middle", "tail"),
      "tertile split should populate all three buckets")
  }

  test("low-accuracy disagreements sit within the GK rank band of a " +
      "tertile boundary") {
    val off = offenders(acc = 10) // deliberately coarse: error up to n/10
    assert(off.isEmpty,
      s"${off.size} docs relabeled outside the rank band: " +
        s"${off.take(5).toSeq}")
  }

  test("non-positive accuracy is refused at the API boundary") {
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.lmBuckets(docs, "doc_id", "text",
        exact = false, accuracyInverseEps = 0)
    }
    assert(e.getMessage.contains("accuracyInverseEps"))
  }
}
