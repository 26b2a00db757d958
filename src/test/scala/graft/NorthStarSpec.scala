package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, Similarity}

class NorthStarSpec extends AnyFunSuite {
  import GraftSpark.{spark, sf}

  private def docs = Tables.documents(spark, sf)
  private def embs = Tables.embeddings(spark, sf)

  test("MinHash+LSH pairs equal the exact n-gram Jaccard pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.6)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", 0.6)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(exact.nonEmpty, "corpus should contain near-duplicates")
    assert(lsh == exact,
      s"LSH missed ${exact -- lsh} / extra ${lsh -- exact}")
  }

  test("SimHash candidates recall the true near-duplicate pairs") {
    val truePairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.6)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val sim = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val recall = (truePairs & sim).size.toDouble / truePairs.size
    assert(recall >= 0.8, s"simhash recall $recall over ${truePairs.size} pairs")
  }

  test("exact dedup groups partition the corpus") {
    val total = docs.count()
    val grouped = Dedup.exactGroups(docs, "doc_id", "text")
      .agg(sum("cnt")).collect().head.getLong(0)
    assert(grouped == total)
  }

  test("LSH ANN finds neighbors and sims agree with brute force") {
    val n = Similarity.normed(embs, "vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(n.filter(col("vec_id") < 8), n, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val lsh = Similarity.lshTopK(embs, "vec_id", "embedding",
      col("vec_id") < 8, k = 5, dim = 64).collect()
    assert(lsh.nonEmpty, "LSH buckets should yield candidates")
    // every LSH hit present in the brute-force scoring must carry the same
    // similarity value (same arithmetic path)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(s => assert(math.abs(s - r.getDouble(3)) < 1e-12))
    }
  }

  test("IVF ANN probes lists and sims agree with brute force") {
    val n = Similarity.normed(embs, "vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(n.filter(col("vec_id") < 8), n, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val ivf = Similarity.ivfTopK(embs, "vec_id", "embedding",
      col("vec_id") < 8, k = 5).collect()
    assert(ivf.nonEmpty)
    // ivf returns ≤ k per query, every sim matches the brute-force scoring
    val perQuery = ivf.groupBy(_.getLong(0))
    perQuery.foreach { case (_, rows) => assert(rows.length <= 5) }
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(s => assert(math.abs(s - r.getDouble(3)) < 1e-12))
    }
  }

  test("quality scores live in [0,1]") {
    val mm = SparkEntry.queries("q_t2_quality")(spark, sf)
      .agg(min("quality"), max("quality")).collect().head
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("langid emits only known labels") {
    val labels = SparkEntry.queries("q_t3_langid")(spark, sf)
      .select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("en", "es", "de", "fr", "und")))
  }

  test("multimodal feature extraction is deterministic with stable schema") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val a = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val b = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(a == b)
    val schema = Multimodal.extractFeatures(media).schema.fieldNames.toSeq
    assert(schema == Seq("media_id", "kind", "n_bytes", "width", "height",
      "duration_ms", "features"))
  }
}
