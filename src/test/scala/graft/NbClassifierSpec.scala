package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, TextAnalysis}

/** The in-engine curated-vs-crawl labeling loop: train the hashed-token
  * NB quality model on labeled documents, verify the trained screen
  * separates the planted classes, and run it as the opt-in
  * `Curation.Config.nbScreen` stage. */
class NbClassifierSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  // planted classes over disjoint core vocabularies; BOTH carry the same
  // English stopwords (so langId agrees) and per-doc unique fillers (so
  // the near-dup screen doesn't collapse the template)
  private val posVocab = Vector("quick", "brown", "fox", "jumps",
    "over", "lazy", "dog", "house", "garden", "river", "stone", "cloud")
  private val negVocab = Vector("zzkw", "spam", "click", "buy", "now",
    "cheap", "pills", "casino", "winner", "prize", "free", "offer")

  private def doc(vocab: Vector[String], seed: Int): String = {
    val cls = (0 until 12).map(i => vocab((seed + i * 5) % vocab.size))
    val uniq = (0 until 4).map(i => s"u${seed}q$i")
    (cls ++ Seq("the", "and", "of") ++ uniq).mkString(" ")
  }

  private lazy val labeled = {
    val pos = (0 until 40).map(i => (i.toLong, doc(posVocab, i), true))
    val neg = (0 until 40).map(i => (100L + i, doc(negVocab, i), false))
    (pos ++ neg).toDF("doc_id", "text", "curated")
  }

  test("trained NB model separates the planted classes") {
    val m = TextAnalysis.trainQualityNb(
      labeled, "text", col("curated"), b = 512)
    assert(m.weights.length == 512)
    val scored = labeled
      .select(col("doc_id"), col("curated"), m.score(col("text")).as("s"))
      .collect()
    val (pos, neg) = scored.partition(_.getBoolean(1))
    assert(pos.forall(_.getDouble(2) > 0),
      s"curated docs below boundary: ${pos.filter(_.getDouble(2) <= 0).mkString(",")}")
    assert(neg.forall(_.getDouble(2) < 0),
      s"crawl docs above boundary: ${neg.filter(_.getDouble(2) >= 0).mkString(",")}")
  }

  test("trained model generalizes to held-out docs from the same classes") {
    val m = TextAnalysis.trainQualityNb(
      labeled, "text", col("curated"), b = 512)
    val held = ((40 until 60).map(i => (i.toLong, doc(posVocab, i), true)) ++
      (40 until 60).map(i => (200L + i, doc(negVocab, i), false)))
      .toDF("doc_id", "text", "curated")
    val scored = held
      .select(col("curated"), m.score(col("text")).as("s")).collect()
    assert(scored.forall(r => r.getBoolean(0) == (r.getDouble(1) > 0)),
      "held-out docs misclassified")
  }

  test("training refuses a single-class corpus") {
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.trainQualityNb(
        labeled.filter(col("curated")), "text",
        col("curated"), b = 64)
    }
    assert(e.getMessage.contains("both classes"))
    // the EMPTY corpus must hit the same loud refusal, not an NPE
    // (sum() over no rows is null)
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.trainQualityNb(
        labeled.filter(lit(false)), "text", col("curated"), b = 64)
    }
    assert(e2.getMessage.contains("both classes"))
  }

  test("nbScreen composes into the curation pipeline as the trained filter") {
    val m = TextAnalysis.trainQualityNb(
      labeled, "text", col("curated"), b = 512)
    val corpus = labeled.select("doc_id", "text")
    def ids(cfg: Curation.Config): Set[Long] = {
      val r = Curation.pipeline(corpus, "doc_id", "text", cfg)
      r.df.select("doc_id").collect().map(_.getLong(0)).toSet
    }
    // permissive on the OTHER screens (the short synthetic docs trip the
    // bigram-repetition default) so the NB stage's effect is isolated
    val permissive = Curation.Config(
      minQuality = 0.0, repetitionDropAt = 0.5)
    val without = ids(permissive)
    val withNb = ids(permissive.copy(nbScreen = Some((m, 0.0))))
    // the NB stage may only REMOVE docs, and must remove exactly the
    // below-boundary ones among the survivors
    val scores = corpus
      .select(col("doc_id"), m.score(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(withNb == without.filter(scores(_) >= 0.0),
      s"nbScreen kept ${withNb -- without.filter(scores(_) >= 0.0)}, " +
        s"dropped ${without.filter(scores(_) >= 0.0) -- withNb}")
    assert(withNb.nonEmpty && (without -- withNb).nonEmpty,
      "fixture should exercise both keep and drop paths")
  }

  test("streaming screen applies the same trained model under one Config") {
    import graft.streaming.Streams
    val m = TextAnalysis.trainQualityNb(
      labeled, "text", col("curated"), b = 512)
    val corpus = labeled.select("doc_id", "text")
    val cfg = Curation.Config(
      minQuality = 0.0, repetitionDropAt = 0.5, nbScreen = Some((m, 0.0)))
    // batch invocation of the STREAMING operator (the stream twin is
    // structural — same Column fold); nb_score must equal the model's
    // score and gate the verdict exactly like the batch pipeline stage
    val out = Streams.curationScreenStream(corpus, "doc_id", "text",
        None, cfg)
      .select(col("doc_id"), col("nb_score"), col("verdict"),
        col("rep_fraction"), col("quality"), col("pred_lang"))
      .collect()
    val scores = corpus
      .select(col("doc_id"), m.score(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getDouble(1) == scores(id),
        s"nb_score diverged for $id")
      val othersPass = r.getDouble(3) < cfg.repetitionDropAt &&
        r.getDouble(4) >= cfg.minQuality && r.getString(5) == cfg.lang
      assert((r.getString(2) == "keep") ==
        (othersPass && scores(id) >= 0.0),
        s"verdict for $id did not respect the NB gate")
    }
    assert(out.exists(r => r.getString(2) == "keep") &&
      out.exists(r => r.getString(2) == "drop" && scores(r.getLong(0)) < 0),
      "fixture should exercise NB keep and drop in the stream screen")
  }
}
