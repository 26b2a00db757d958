package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The distributed large-batch IVF-SQ8 query path: row-for-row equality
  * with the broadcast external-query overload — the Column formulation
  * (`sq8ReconCol` + two HOF folds) versus the codegen'd
  * [[graft.functions.Sq8AdcDistance]] packed-byte kernel. Any IEEE
  * drift between the two distance evaluations (accumulation order,
  * endianness of the packed query, midpoint reconstruction) breaks the
  * float d² equality here, so this spec IS the kernel's bit-equality
  * pin (the SQ8 mirror of IvfPqJoinSpec). */
class IvfSq8JoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf
  private val K = 5

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val idx = Similarity.ivfSq8IndexBuild(emb, "vec_id", "embedding")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("join path equals the broadcast Column path row-for-row") {
    val queries = emb.filter(col("vec_id") % 9 === 0)
    val viaColumn = rows(Similarity.ivfSq8TopK(
      idx, queries, "vec_id", "embedding", K))
    val viaJoin = rows(Similarity.ivfSq8TopKJoin(
      idx, queries, "vec_id", "embedding", K))
    assert(viaColumn.nonEmpty, "fixture produced no query rows")
    assert(viaJoin == viaColumn,
      s"missing ${(viaColumn -- viaJoin).take(3)}, " +
        s"extra ${(viaJoin -- viaColumn).take(3)}")
    // and with a non-default salt count (exactness must not depend on it)
    assert(rows(Similarity.ivfSq8TopKJoin(
      idx, queries, "vec_id", "embedding", K, salts = 3)) == viaColumn)
  }

  test("non-default probes reach the plan: fewer probes, different shortlist") {
    // the q_x13b operating point: probes=3 must probe exactly 3 lists —
    // equal to the Column path at the SAME probes, and NOT equal to the
    // default-6 result (a knob silently ignored reproduces the default;
    // the r14 false-certification episode is why this pin exists)
    val queries = emb.filter(col("vec_id") % 9 === 0)
    val tuned = rows(Similarity.ivfSq8TopKJoin(
      idx, queries, "vec_id", "embedding", K, probes = 3, salts = 7))
    val columnTuned = rows(Similarity.ivfSq8TopK(
      idx, queries, "vec_id", "embedding", K, probes = 3, salts = 7))
    assert(tuned == columnTuned,
      "probes=3 join path diverged from the probes=3 Column path")
    val default6 = rows(Similarity.ivfSq8TopKJoin(
      idx, queries, "vec_id", "embedding", K))
    assert(tuned != default6,
      "probes=3 reproduced the default-probes shortlist — the knob " +
        "is not reaching the candidate join")
  }

  test("join path scales past a broadcastable query batch") {
    // 1500 external queries: the corpus replicated under shifted ids —
    // replicas must retrieve exactly the original's neighbors
    val big = emb.select(col("vec_id"), col("embedding"))
      .unionByName(emb.select((col("vec_id") + 100000L).as("vec_id"),
        col("embedding")))
      .unionByName(emb.select((col("vec_id") + 200000L).as("vec_id"),
        col("embedding")))
    assert(big.count() == 1500)
    val out = Similarity.ivfSq8TopKJoin(idx, big, "vec_id", "embedding", K)
      .collect()
    val perQuery = out.groupBy(_.getLong(0))
    assert(perQuery.size == 1500, s"only ${perQuery.size} queries answered")
    assert(perQuery.values.forall(_.length == K))
    val base = perQuery.filter(_._1 < 100000L)
    base.foreach { case (qid, rs) =>
      val shifted = perQuery(qid + 100000L)
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val orig = rs.map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(shifted == orig, s"replica of $qid diverged")
    }
  }
}
