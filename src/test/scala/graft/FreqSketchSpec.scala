package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark.spark
import graft.operators.TextAnalysis

/** Misra–Gries frequent-items guarantees, pinned against exact counts:
  * the bound is deterministic even though the estimates themselves
  * depend on encounter order.
  */
class FreqSketchSpec extends AnyFunSuite {

  private val docs = Tables.documents(spark, GraftSpark.sf)

  test("every >N/(k+1) token is present and estimates undercount <= N/(k+1)") {
    val cap = 64
    val exact = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val err = n / (cap + 1)
    val got = TextAnalysis.frequentTokens(docs, "doc_id", "text", cap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= cap)
    // guarantee 1: all genuinely heavy tokens survive
    val heavy = exact.filter(_._2 > err).keySet
    assert(heavy.nonEmpty, "fixture must have heavy tokens for this test")
    val missing = heavy -- got.keySet
    assert(missing.isEmpty, s"heavy tokens lost: ${missing.take(5)}")
    // guarantee 2: undercount, bounded by N/(k+1)
    got.foreach { case (tok, est) =>
      val truth = exact.getOrElse(tok, 0L)
      assert(est <= truth, s"$tok overcounted: est $est > true $truth")
      assert(truth - est <= err,
        s"$tok undercount ${truth - est} exceeds bound $err")
    }
  }

  test("summary survives repartitioning with the same guarantees") {
    val cap = 32
    val exact = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val err = n / (cap + 1)
    val got = TextAnalysis.frequentTokens(docs.repartition(13),
      "doc_id", "text", cap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val heavy = exact.filter(_._2 > err).keySet
    assert((heavy -- got.keySet).isEmpty, "merge path lost a heavy token")
    got.foreach { case (tok, est) =>
      assert(est <= exact.getOrElse(tok, 0L) &&
        exact.getOrElse(tok, 0L) - est <= err)
    }
  }

  test("SQL surface: graft_freq over an exploded token column") {
    graft.functions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("freq_docs")
    val rows = spark.sql(
      """SELECT e.item, e.cnt FROM (
        |  SELECT explode(graft_freq(tok, 8)) AS e FROM (
        |    SELECT explode(split(text, ' ')) AS tok FROM freq_docs))
        |""".stripMargin).collect()
    assert(rows.nonEmpty && rows.length <= 8)
    assert(rows.forall(_.getLong(1) > 0))
  }
}
