package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.operators.TextAnalysis.{bpeTokens, trainBpeMerges}

/** The trained-subword flow end to end: a real 512-merge BPE vocabulary
  * trained in-engine becomes the TOKEN COUNTER for the downstream budget
  * operators (packShards / tokenBudgetSample / mixtureSample), with totals
  * pinned against an independent per-document aggregation — the "state
  * your budgets in real subword tokens" loop, closed. */
class BpeEndToEndSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private lazy val docs = Tables.documents(spark, sf)
    .select("doc_id", "text", "source")
  private lazy val merges512: Seq[(String, String)] =
    trainBpeMerges(docs, "doc_id", "text",
      nMerges = 512, minPairCount = 1L).map(m => (m._1, m._2))
  private def counter(t: org.apache.spark.sql.Column) =
    size(bpeTokens(t, merges512)).cast("long")

  /** Independent truth: per-doc BPE token counts via a plain aggregation
    * (no packShards machinery). */
  private lazy val perDoc: Map[Long, Long] = docs
    .select(col("doc_id"), counter(col("text")).as("n"))
    .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("the trained 512-merge vocab compresses vs character segmentation") {
    val trained = perDoc.values.sum
    val charLevel = docs
      .select(size(bpeTokens(col("text"), Seq.empty)).cast("long").as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    val toy = {
      val m32 = merges512.take(32)
      docs.select(size(bpeTokens(col("text"), m32)).cast("long").as("n"))
        .agg(sum("n")).collect().head.getLong(0)
    }
    assert(trained < toy && toy < charLevel,
      s"expected monotone compression: 512-merge $trained < 32-merge $toy" +
        s" < char-level $charLevel")
    // and subword counts sit between whitespace words and characters
    val words = docs.select(TextAnalysis.tokenCount(col("text")).as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    assert(trained >= words,
      s"BPE tokens $trained below whitespace words $words — impossible " +
        "for a 512-merge vocab on this corpus")
  }

  test("packShards budgets in trained subword tokens, totals pinned") {
    val budget = 4096L
    val packed = TextAnalysis.packShards(
        docs, "doc_id", "text", "source", budget, counter)
      .collect()
    // every document's n_tokens equals the independent per-doc count
    packed.foreach { r =>
      assert(r.getLong(2) == perDoc(r.getLong(0)),
        s"doc ${r.getLong(0)}: packed ${r.getLong(2)} != ${perDoc(r.getLong(0))}")
    }
    // shard ids replay exactly from the independent counts in pack order
    // (within each source, ascending doc_id; shard = start offset / budget)
    packed.groupBy(_.getString(1)).foreach { case (_, rows) =>
      var run = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(3) == run / budget,
          s"doc ${r.getLong(0)}: shard ${r.getLong(3)} != ${run / budget}")
        run += perDoc(r.getLong(0))
      }
    }
  }

  test("tokenBudgetSample takes-until-full in trained subword tokens") {
    val budget = 20000L
    val kept = TextAnalysis.tokenBudgetSample(
        docs, "doc_id", "text", budget, counter = counter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    kept.foreach { case (id, n) => assert(n == perDoc(id)) }
    // replay the draw: md5("budget"‖id) order, keep while start < budget
    val order = docs.select(col("doc_id"),
        md5(concat(lit("budget"), col("doc_id").cast("string"))
          .cast("binary")).as("hk"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, hk) => (hk, id) }
    var run = 0L
    val expected = scala.collection.mutable.Set.empty[Long]
    order.foreach { case (id, _) =>
      if (run < budget) expected += id
      run += perDoc(id)
    }
    assert(kept.keySet == expected.toSet,
      s"missing ${expected -- kept.keySet}, extra ${kept.keySet -- expected}")
    val total = kept.values.sum
    assert(total >= budget || kept.size == perDoc.size,
      "sample stopped before exhausting the budget")
  }

  test("bpeDetokenize inverts bpeTokens up to whitespace normalization") {
    val back = docs
      .select(col("doc_id"), col("text"),
        TextAnalysis.bpeDetokenize(bpeTokens(col("text"), merges512))
          .as("rt"))
      .collect()
    assert(back.nonEmpty)
    back.foreach { r =>
      val norm = r.getString(1).split(" ").filter(_.nonEmpty).mkString(" ")
      assert(r.getString(2) == norm,
        s"round trip diverged for doc ${r.getLong(0)}")
    }
    // and under the empty (character-level) vocab too
    val charBack = docs.limit(20)
      .select(col("text"),
        TextAnalysis.bpeDetokenize(bpeTokens(col("text"), Seq.empty))
          .as("rt"))
      .collect()
    charBack.foreach { r =>
      val norm = r.getString(0).split(" ").filter(_.nonEmpty).mkString(" ")
      assert(r.getString(1) == norm)
    }
  }

  test("mixtureSample states the mix in trained subword token mass") {
    val weights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val out = TextAnalysis.mixtureSample(
        docs, "doc_id", "text", "source", weights, counter)
      .collect()
    assert(out.nonEmpty)
    // columns: doc_id, source, n_tokens, rate, keep
    out.foreach { r =>
      assert(r.getLong(2) == perDoc(r.getLong(0)),
        s"mixture n_tokens diverged for doc ${r.getLong(0)}")
    }
    // replay the rate arithmetic from the independent counts
    val srcTok = docs.collect()
      .groupBy(_.getString(2))
      .view.mapValues(_.map(r => perDoc(r.getLong(0))).sum).toMap
    val present = weights.filter { case (s, _) => srcTok.contains(s) }
    val budget = present.map { case (s, w) => srcTok(s) / w }.min
    out.foreach { r =>
      val s = r.getString(1)
      val expectedRate = present(s) * budget / srcTok(s)
      assert(math.abs(r.getDouble(3) - expectedRate) < 1e-12,
        s"rate for $s: ${r.getDouble(3)} != $expectedRate")
    }
  }
}
