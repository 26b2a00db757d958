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
      labeled, "text", col("pos"), b = 256)
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

  test("daily-restart lifecycle: a pipeline on loaded artifacts equals fresh") {
    import spark.implicits._
    import graft.operators.{Curation, Similarity}
    import graft.streaming.Streams
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val emb = Tables.embeddings(spark, sf)
    // ── day 0: train everything, save everything ──
    val labeled = docs.withColumn("pos", col("doc_id") % 2 === 1)
    val nb = TextAnalysis.trainQualityNb(
      labeled, "text", col("pos"), b = 512)
    val lm = TextAnalysis.lmTrain(docs, "doc_id", "text", minCount = 1)
    val merges = TextAnalysis.trainBpeMerges(
      docs, "doc_id", "text", nMerges = 64, minPairCount = 1L)
    val ndIdx = Streams.nearDupIndexBuild(docs, "doc_id", "text")
    val annIdx = Similarity.ivfPqIndexBuild(emb, "vec_id", "embedding")
    val root = tmp("daily")
    TextAnalysis.nbSave(nb, spark, s"$root/nb")
    TextAnalysis.lmSave(lm, spark, s"$root/lm")
    TextAnalysis.bpeSave(merges, spark, s"$root/bpe")
    Streams.nearDupIndexSave(ndIdx, s"$root/neardup")
    Similarity.ivfPqIndexSave(annIdx, s"$root/ann")
    // ── day 1: load everything, run the composed day ──
    def runDay(
        nbM: TextAnalysis.NbQualityModel, lmM: TextAnalysis.LmModel,
        ms: Seq[(String, String, Long)],
        nd: Streams.NearDupBaseIndex,
        ann: Similarity.IvfPqIndex): (Set[Long], Set[String], Set[String]) = {
      val xents = TextAnalysis.lmScoreWith(lmM, docs, "doc_id", "text")
        .agg(max(col("xent"))).collect().head.getDouble(0)
      val curated = Curation.pipeline(docs, "doc_id", "text",
        Curation.Config(minQuality = 0.0, repetitionDropAt = 0.9,
          nbScreen = Some((nbM, 0.0)), lmXentMax = Some(xents)))
        .df.select("doc_id").collect().map(_.getLong(0)).toSet
      val counter = (t: org.apache.spark.sql.Column) =>
        size(TextAnalysis.bpeTokens(t, ms.map(m => (m._1, m._2))))
          .cast("long")
      val packed = TextAnalysis.packShards(
          docs, "doc_id", "text", "text", 4096L, counter)
        .collect().map(_.toString).toSet
      // incoming crawl screened against yesterday's near-dup index +
      // its embeddings probed against yesterday's ANN index
      val incoming = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id") + 100000L as "doc_id", col("text"))
      val screened = Streams.nearDupAgainstBase(
          incoming, nd, "doc_id", "text", 0.6, watermark = None)
        .collect().map(_.toString).toSet
      val probed = Similarity.ivfPqTopKJoin(
          ann, emb.filter(col("vec_id") % 7 === 0),
          "vec_id", "embedding", k = 3)
        .collect().map(_.toString).toSet
      (curated, packed, screened ++ probed)
    }
    val fresh = runDay(nb, lm, merges, ndIdx, annIdx)
    val loaded = runDay(
      TextAnalysis.nbLoad(spark, s"$root/nb"),
      TextAnalysis.lmLoad(spark, s"$root/lm"),
      TextAnalysis.bpeLoad(spark, s"$root/bpe"),
      Streams.nearDupIndexLoad(spark, s"$root/neardup"),
      Similarity.ivfPqIndexLoad(spark, s"$root/ann"))
    assert(loaded._1 == fresh._1, "curation survivors diverged after reload")
    assert(loaded._2 == fresh._2, "packed shards diverged after reload")
    assert(loaded._3 == fresh._3, "near-dup/ANN results diverged after reload")
    assert(fresh._1.nonEmpty && fresh._2.nonEmpty && fresh._3.nonEmpty)
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
