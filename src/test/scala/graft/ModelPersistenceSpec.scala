package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** save/load round-trips for the trained driver-side model artifacts
  * (LM bigram tables, NB quality weights, BPE merge lists): a loaded
  * model must behave BIT-IDENTICALLY to the freshly trained one — long
  * hash keys round-trip through dedicated long tables, doubles through
  * binary-exact parquet. */
class ModelPersistenceSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf
  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_model_$tag").toString

  test("LM model: save → load scores bit-identically") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val m = TextAnalysis.lmTrain(docs, "doc_id", "text", minCount = 1)
    val dir = tmp("lm")
    TextAnalysis.lmSave(m, spark, dir)
    val loaded = TextAnalysis.lmLoad(spark, dir)
    assert(loaded.vocabSize == m.vocabSize)
    assert(loaded.nBigrams == m.nBigrams)
    val a = TextAnalysis.lmScoreWith(m, docs, "doc_id", "text")
      .collect().map(_.toString).toSet
    val b = TextAnalysis.lmScoreWith(loaded, docs, "doc_id", "text")
      .collect().map(_.toString).toSet
    assert(a == b, "loaded LM scores diverged")
  }

  test("NB model: save → load scores bit-identically") {
    import spark.implicits._
    val labeled = ((0 until 30).map(i =>
      (i.toLong, s"alpha beta g$i the and", true)) ++
      (0 until 30).map(i => (100L + i, s"spam click z$i the and", false)))
      .toDF("doc_id", "text", "pos")
    val m = TextAnalysis.trainQualityNb(
      labeled, "doc_id", "text", col("pos"), b = 256)
    val dir = tmp("nb")
    TextAnalysis.nbSave(m, spark, dir)
    val loaded = TextAnalysis.nbLoad(spark, dir)
    assert(loaded.numBuckets == m.numBuckets)
    assert(java.util.Arrays.equals(loaded.weights, m.weights),
      "NB weights drifted through save/load")
    assert(loaded.bias == m.bias)
    val a = labeled.select(m.score(col("text"))).collect().map(_.toString)
    val b = labeled.select(loaded.score(col("text"))).collect()
      .map(_.toString)
    assert(a.sameElements(b))
  }

  test("BPE merges: save → load segments identically, rank order kept") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val merges = TextAnalysis.trainBpeMerges(
      docs, "doc_id", "text", nMerges = 64, minPairCount = 1L)
    val dir = tmp("bpe")
    TextAnalysis.bpeSave(merges, spark, dir)
    val loaded = TextAnalysis.bpeLoad(spark, dir)
    assert(loaded == merges, "merge list changed through save/load")
    val m2 = loaded.map(m => (m._1, m._2))
    val orig = docs.limit(50)
      .select(TextAnalysis.bpeTokens(col("text"),
        merges.map(m => (m._1, m._2))))
      .collect().map(_.toString)
    val back = docs.limit(50)
      .select(TextAnalysis.bpeTokens(col("text"), m2))
      .collect().map(_.toString)
    assert(orig.sameElements(back))
  }

  test("derived vocab: save → load keeps order and tokenization") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val vocab = TextAnalysis.deriveVocab(docs, "doc_id", "text",
      maxWords = 512)
    val dir = tmp("vocab")
    TextAnalysis.vocabSave(vocab, spark, dir)
    val loaded = TextAnalysis.vocabLoad(spark, dir)
    assert(loaded == vocab, "vocab order changed through save/load")
    val f = graft.functions.GraftFunctions
    val a = docs.limit(50)
      .select(f.wordpieceTokens(col("text"), vocab))
      .collect().map(_.toString)
    val b = docs.limit(50)
      .select(f.wordpieceTokens(col("text"), loaded))
      .collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("model kind validation refuses cross-loads") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val m = TextAnalysis.lmTrain(docs, "doc_id", "text", minCount = 1)
    val dir = tmp("wrongkind")
    TextAnalysis.lmSave(m, spark, dir)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.nbLoad(spark, dir)
    }
    assert(e.getMessage.contains("kind"))
  }
}
