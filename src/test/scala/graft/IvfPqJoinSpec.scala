package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The distributed large-batch IVF-PQ query path: row-for-row equality
  * with the driver-collect overload on a small query set, and genuine
  * operation past the collect path's 1024-query guard. */
class IvfPqJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf
  private val K = 5

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val idx = Similarity.ivfPqIndexBuild(emb, "vec_id", "embedding")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("join path equals the collect path row-for-row") {
    val queries = emb.filter(col("vec_id") % 9 === 0)
    val viaCollect = rows(Similarity.ivfPqTopK(
      idx, queries, "vec_id", "embedding", K,
      Similarity.PqRerank, Similarity.IvfProbes))
    val viaJoin = rows(Similarity.ivfPqTopKJoin(
      idx, queries, "vec_id", "embedding", K))
    assert(viaJoin == viaCollect,
      s"missing ${(viaCollect -- viaJoin).take(3)}, " +
        s"extra ${(viaJoin -- viaCollect).take(3)}")
    // and with a non-default salt count (exactness must not depend on it)
    assert(rows(Similarity.ivfPqTopKJoin(
      idx, queries, "vec_id", "embedding", K, salts = 3)) == viaCollect)
  }

  test("join path handles a query batch past the collect-path guard") {
    // fabricate 1500 external queries by replicating the corpus under
    // shifted ids — past the 1024 driver-collect guard
    val big = emb.select(col("vec_id"), col("embedding"))
      .unionByName(emb.select((col("vec_id") + 100000L).as("vec_id"),
        col("embedding")))
      .unionByName(emb.select((col("vec_id") + 200000L).as("vec_id"),
        col("embedding")))
    assert(big.count() == 1500)
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(idx, big, "vec_id", "embedding", K,
        Similarity.PqRerank, Similarity.IvfProbes).collect()
    }
    val out = Similarity.ivfPqTopKJoin(idx, big, "vec_id", "embedding", K)
      .collect()
    val perQuery = out.groupBy(_.getLong(0))
    assert(perQuery.size == 1500, s"only ${perQuery.size} queries answered")
    assert(perQuery.values.forall(_.length == K))
    // replicated queries must retrieve exactly the original's neighbors
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
