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

  test("cross-corpus near-dup pairs equal the cross subset of all pairs") {
    val isNew = substring(
      md5(col("doc_id").cast("string").cast("binary")), 1, 1) >= "8"
    val newIds = docs.filter(isNew).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val exactCross = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.6)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => newIds(a) != newIds(b) }
      .map { case (a, b) => if (newIds(b)) (a, b) else (b, a) }
      .toSet
    val across = Dedup.minHashLshPairsAcross(
      docs.filter(!isNew), docs.filter(isNew), "doc_id", "text", 0.6)
      .select("base_id", "new_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactCross.nonEmpty, "fixture should contain cross-split pairs")
    // verification recomputes true Jaccard on every candidate, so false
    // positives are impossible by construction — assert that exactly
    assert(across.subsetOf(exactCross),
      s"false positives: ${across -- exactCross}")
    // recall is a floor, not equality: 32×4 banding misses a borderline
    // pair with ~1% probability, so exact set equality would be brittle to
    // any fixture or hash change even though it holds today
    val recall = (exactCross & across).size.toDouble / exactCross.size
    assert(recall >= 0.95,
      s"recall $recall: missed ${exactCross -- across} of ${exactCross.size}")
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

  test("ImageIO path decodes an authored PNG to exact dims and luma features") {
    import spark.implicits._
    // 4×8 PNG, rows paired into 4 bands of known solid color: the decoded
    // mean-luma features are exactly the Rec.601 coefficients
    val img = new java.awt.image.BufferedImage(
      4, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bandColors = Seq(0xFFFFFF, 0x000000, 0xFF0000, 0x00FF00)
    for (y <- 0 until 8; x <- 0 until 4)
      img.setRGB(x, y, bandColors(y / 2))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq((7L, "image", bos.toByteArray))
      .toDF("media_id", "kind", "bytes")
    val out = Multimodal.extractFeatures(media, featureDim = 4).collect().head
    assert(out.width == 4 && out.height == 8 && out.duration_ms == 0L)
    val expected = Seq(1.0f, 0.0f, 0.299f, 0.587f)
    out.features.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-6f, s"${out.features.toSeq} vs $expected")
    }
  }

  test("unrecognizable image bytes fall back to the labeled stub decoder") {
    import spark.implicits._
    val junk = "definitely not a png".getBytes("UTF-8")
    val media = Seq((3L, "image", junk)).toDF("media_id", "kind", "bytes")
    val out = Multimodal.extractFeatures(media, featureDim = 8).collect().head
    val (w, h, d, feats) = Multimodal.StubDecoder.decode("image", junk, 8)
    assert(out.width == w && out.height == h && out.duration_ms == d
      && out.features.sameElements(feats))
  }

  test("synthetic image corpus round-trips through the real decoder") {
    val imgs = Multimodal.syntheticImages(
      docs.filter(col("doc_id") % 8 === 0), "doc_id")
    val feats = Multimodal.extractFeatures(imgs).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.width == 8 + (f.media_id % 16).toInt
        && f.height == 8 + (f.media_id % 12).toInt,
        s"decoded dims disagree with authored dims: $f")
      // gradient images are mid-toned: stub features live in [-1,1) and
      // would violate this band often; real luma means never do
      f.features.foreach(v => assert(v >= 0f && v <= 1f))
    }
  }

  test("javax.sound path decodes an authored WAV to exact duration and RMS") {
    import spark.implicits._
    // 800 frames at 8 kHz = exactly 100 ms; 4 bands of 200 frames, each a
    // square wave of known amplitude — band RMS equals the amplitude
    val amps = Seq(2000, 8000, 16000, 32000)
    val frames = 800
    val pcm = new Array[Byte](frames * 2)
    for (i <- 0 until frames) {
      val a = amps(i * 4 / frames)
      val s = (if ((i / 50) % 2 == 0) a else -a).toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val media = Seq(
      (5L, "audio", bos.toByteArray),
      (6L, "audio", "not a wav".getBytes("UTF-8")))
      .toDF("media_id", "kind", "bytes")
    val out = Multimodal.extractFeatures(media, featureDim = 4).collect()
      .map(f => f.media_id -> f).toMap
    assert(out(5L).duration_ms == 100L
      && out(5L).width == 0 && out(5L).height == 0)
    out(5L).features.zip(amps).foreach { case (got, a) =>
      assert(math.abs(got - a / 32768.0) < 1e-7,
        s"${out(5L).features.toSeq} vs $amps")
    }
    // unrecognizable audio bytes fall back to the labeled stub
    val (w, h, d, feats) =
      Multimodal.StubDecoder.decode("audio", "not a wav".getBytes("UTF-8"), 4)
    assert(out(6L).width == w && out(6L).height == h
      && out(6L).duration_ms == d && out(6L).features.sameElements(feats))
  }

  test("synthetic audio corpus round-trips through the real decoder") {
    val wavs = Multimodal.syntheticAudio(
      docs.filter(col("doc_id") % 8 === 1), "doc_id")
    val feats = Multimodal.extractFeatures(wavs).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val expected = (800 + (f.media_id % 32) * 80) * 1000 / 8000
      assert(f.duration_ms == expected,
        s"decoded duration disagrees with authored frames: $f")
      // square wave of amplitude 1000 + (id%7)*4000 → every band's RMS is
      // exactly that amplitude
      val amp = (1000 + (f.media_id % 7) * 4000) / 32768.0
      f.features.foreach(v => assert(math.abs(v - amp) < 1e-7, s"$f"))
    }
  }

  test("resize fits within bounds, never upscales, and is deterministic") {
    import spark.implicits._
    // 4×8 authored PNG → fit 4×4: scale min(1, 4/4, 4/8) = 0.5 → 2×4
    val img = new java.awt.image.BufferedImage(
      4, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 4) img.setRGB(x, y, 0x336699)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(
      (1L, "image", bos.toByteArray),
      (2L, "image", "not an image".getBytes("UTF-8")))
      .toDF("media_id", "kind", "bytes")
    def run() = Multimodal.resizeImages(media, 4, 4).collect()
      .map(r => r.media_id -> r).toMap
    val out = run()
    assert(out(1L).width == 2 && out(1L).height == 4)
    // resized payload must itself decode to the stated dimensions
    val decoded = Multimodal.ImageCodec.decode(out(1L).bytes, 4)
    assert(decoded.exists { case (w, h, _) => w == 2 && h == 4 })
    // undecodable rows are flagged, not dropped
    assert(out(2L).width == -1 && out(2L).height == -1
      && out(2L).bytes.sameElements("not an image".getBytes("UTF-8")))
    // bilinear resample + PNG encode are deterministic across runs
    assert(run()(1L).bytes.sameElements(out(1L).bytes))
    // an image already inside the bounds is not upscaled
    val small = Multimodal.resizeImages(media, 64, 64).collect()
      .filter(_.media_id == 1L).head
    assert(small.width == 4 && small.height == 8)
  }

  test("frame sampling fans out per stub duration and frames feed the image path") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, everyMs = 60000L)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    // cardinality: min(cap, duration/interval + 1) per video, ts arithmetic
    val byMedia = rows.groupBy(_.media_id)
    val durations = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.duration_ms).toMap
    byMedia.foreach { case (id, fs) =>
      val expected = math.min(32L, durations(id) / 60000L + 1).toInt
      assert(fs.length == expected, s"media $id: ${fs.length} != $expected")
      fs.sortBy(_.frame_idx).zipWithIndex.foreach { case (f, i) =>
        assert(f.frame_idx == i && f.ts_ms == i * 60000L)
      }
    }
    // every frame is a REAL PNG: decodable by the image codec at 8×8
    rows.take(5).foreach { f =>
      val d = Multimodal.ImageCodec.decode(f.frame, 4)
      assert(d.exists { case (w, h, _) => w == 8 && h == 8 }, s"frame $f")
    }
    // deterministic across runs (stable digests for the rows-only gate)
    val again = Multimodal.sampleFrames(media, everyMs = 60000L).collect()
      .map(f => (f.media_id, f.frame_idx) -> f.frame.toSeq).toMap
    rows.foreach(f => assert(again((f.media_id, f.frame_idx)) == f.frame.toSeq))
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

  test("decontamination flags a planted verbatim inclusion at containment 1.0") {
    import spark.implicits._
    // doc 100 embeds doc 1's full text: every probe trigram is contained
    val probe = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, probe),
      (100L, s"intro words here $probe trailing words after"),
      (101L, "completely unrelated content with different tokens entirely"))
      .toDF("doc_id", "text")
    val hits = graft.operators.Decontaminate.contamination(
      corpus, "doc_id", "text",
      probePred = col("doc_id") < 10, minContainment = 0.9)
      .collect()
    assert(hits.length == 1)
    val h = hits.head
    assert(h.getAs[Long]("doc_id") == 100L
      && h.getAs[Long]("probe_id") == 1L
      && h.getAs[Double]("containment") == 1.0, s"unexpected hit: $h")
  }

  test("decontamination refuses a probe predicate that selects a corpus slice") {
    val e = intercept[IllegalArgumentException] {
      graft.operators.Decontaminate.contamination(
        docs, "doc_id", "text",
        probePred = col("doc_id") >= 0, minContainment = 0.9,
        maxProbeRows = 10L)
    }
    assert(e.getMessage.contains("maxProbeRows"))
  }

  test("redaction removes every injected PII instance") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "reach me at bob99@corp.net or 123-45-6789 thanks"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextAnalysis.redact(col("text")).as("r"),
      TextAnalysis.piiCount(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L)._1 == "reach me at <EMAIL> or <SSN> thanks")
    assert(out(1L)._2 == 2L && out(2L)._2 == 0L)
  }

  test("repetition screen separates looped text from varied text") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, Seq.fill(50)("buy now").mkString(" ")), // one bigram dominates
      (2L, (1 to 100).map(i => s"w$i").mkString(" "))) // all bigrams unique
      .toDF("doc_id", "text")
    val fr = df.select(col("doc_id"),
      TextAnalysis.topBigramFraction(col("text")).as("f")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fr(1L) > 0.4, s"looped text must concentrate: ${fr(1L)}")
    assert(fr(2L) < 0.05, s"varied text must not: ${fr(2L)}")
  }

  test("LM scoring ranks gibberish above corpus-typical text") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // 40 fluent docs drawn from a tiny repetitive grammar (high bigram
    // reuse = what the corpus LM learns) + 4 gibberish docs whose tokens
    // are document-unique (every transition takes the add-one floor)
    val fluent = (0 until 40).map { i =>
      val subj = Seq("the cat", "the dog", "a bird")(i % 3)
      val verb = Seq("sat on", "ran to", "looked at")(i % 3)
      val obj = Seq("the mat", "the door", "the tree")((i / 3) % 3)
      (i.toLong, s"$subj $verb $obj and then $subj $verb $obj again")
    }
    val gibberish = (100 until 104).map { i =>
      (i.toLong, (0 until 12).map(j => s"zq${i}x$j").mkString(" "))
    }
    val df = (fluent ++ gibberish).toDF("doc_id", "text")
    val xent = TextAnalysis.lmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val fluentMax = fluent.map(d => xent(d._1)).max
    val gibMin = gibberish.map(d => xent(d._1)).min
    assert(gibMin > fluentMax,
      f"LM must separate gibberish (min $gibMin%.2f) from fluent " +
        f"(max $fluentMax%.2f)")
    // and scoring is deterministic across retrains
    val again = TextAnalysis.lmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again == xent, "LM retrain must be bit-reproducible")
  }

  test("broadcast-model LM scorer agrees bit-for-bit with the join scorer") {
    import graft.operators.TextAnalysis
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val joinSide = key(TextAnalysis.lmScore(docs, "doc_id", "text",
      minCount = 2))
    val model = TextAnalysis.lmTrain(docs, "doc_id", "text", minCount = 2)
    assert(model.nBigrams > 0, "pruned LM must retain repeated bigrams")
    val mapSide = key(TextAnalysis.lmScoreWith(model, docs,
      "doc_id", "text"))
    assert(mapSide == joinSide,
      "closure scorer must reproduce the declarative join scorer exactly")
  }

  test("curation LM screen drops exactly the high-xent documents") {
    import spark.implicits._
    import graft.operators.{Curation, TextAnalysis}
    // fluent docs share a tiny grammar; gibberish docs interleave 'the'
    // (so langid keeps them 'en') with document-unique tokens (so every
    // transition takes the add-one floor and xent runs high)
    val fluent = (0 until 40).map { i =>
      val subj = Seq("the cat", "the dog", "a bird")(i % 3)
      val verb = Seq("sat on", "ran to", "looked at")(i % 3)
      val obj = Seq("the mat", "the door", "the tree")((i / 3) % 3)
      (i.toLong, s"$subj $verb $obj and then $subj $verb $obj again")
    }
    val gibberish = (100 until 104).map { i =>
      (i.toLong,
        (0 until 12).map(j => s"the zq${i}x$j").mkString(" "))
    }
    val df = (fluent ++ gibberish).toDF("doc_id", "text")
    val xent = TextAnalysis.lmScore(df, "doc_id", "text", minCount = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val cap = (fluent.map(d => xent(d._1)).max
      + gibberish.map(d => xent(d._1)).min) / 2
    // disable the screens orthogonal to this test; dedup still runs (the
    // grammar collapses to 9 distinct docs) but runs identically in both
    val base = Curation.Config(repetitionDropAt = 1.0, minQuality = 0.0)
    def ids(cfg: Curation.Config): Set[Long] = {
      val r = Curation.pipeline(df, "doc_id", "text", cfg)
      r.df.select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val without = ids(base)
    val withLm = ids(base.copy(lmXentMax = Some(cap)))
    assert(gibberish.map(_._1).toSet.subsetOf(without),
      "fixture: gibberish must survive every other screen")
    assert(withLm == without -- gibberish.map(_._1),
      s"LM screen must drop exactly the gibberish: $withLm vs $without")
  }

  test("bloomed decontamination equals exact even with a saturated filter") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Decontaminate
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toSet
    val exactR = key(Decontaminate.contamination(
      docs, "doc_id", "text", col("doc_id") < 10, 0.5))
    // grossly undersized filter → fpp ≈ 1: every shingle passes the
    // pre-screen, so this exercises the verify join at its worst — the
    // result must STILL be exact (false positives die in the equi-join)
    val saturated = key(Decontaminate.contaminationBloomed(
      docs, "doc_id", "text", col("doc_id") < 10, 0.5,
      expectedProbeShingles = 1L))
    assert(saturated == exactR,
      "a saturated Bloom pre-screen must not change the result")
    // and a properly-sized filter agrees too
    val sized = key(Decontaminate.contaminationBloomed(
      docs, "doc_id", "text", col("doc_id") < 10, 0.5,
      expectedProbeShingles = 2000L))
    assert(sized == exactR, "bloomed path diverged from exact")
  }

  test("curation gopher screen drops rule-breaking docs; default is off") {
    import spark.implicits._
    import graft.operators.Curation
    // both docs pass quality/lang; only doc 2 breaks the Gopher rules
    // (symbol spam tanks the symbol and alphabetic-word ratios)
    val clean = (1 to 60).map(i => s"word$i with the stuff").mkString(" ")
    val spam = (1 to 60).map(i => s"### the w$i ...").mkString(" ")
    val df = Seq((1L, clean), (2L, spam)).toDF("doc_id", "text")
    val base = Curation.Config(repetitionDropAt = 1.0, minQuality = 0.0,
      lang = "en")
    def ids(cfg: Curation.Config): Set[Long] =
      Curation.pipeline(df, "doc_id", "text", cfg)
        .df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(base) == Set(1L, 2L),
      "fixture: both docs must survive with the screen off")
    assert(ids(base.copy(gopherScreen = true)) == Set(1L),
      "gopher screen must drop exactly the rule-breaking doc")
  }

  test("defined-corpus materialization modes are semantics-free") {
    import org.apache.spark.sql.functions._
    import graft.operators.Curation
    import graft.operators.Curation.Materialize
    // corpus-definition stages active → the pipeline materializes the
    // defined corpus; all three fault-tolerance modes must yield the
    // same rows AND the same funnel
    val withUrl = docs.withColumn("url",
      concat(lit("http://Example.COM/p/"),
        floor(col("doc_id") / 3).cast("string")))
    def run(m: Curation.Materialize) = {
      val r = Curation.pipeline(withUrl, "doc_id", "text",
        Curation.Config(maxPerSource = Some(("source", 18)),
          urlDedup = Some("url"), materialize = m))
      val rows = r.df.select("doc_id", "split", "clean_text")
        .collect().map(_.toString).toSet
      (rows, r.stageRows)
    }
    val lc = run(Materialize.LocalCheckpoint)
    assert(run(Materialize.PersistDisk) == lc,
      "DISK_ONLY persist diverged from localCheckpoint")
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft_curation_ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    assert(run(Materialize.ReliableCheckpoint) == lc,
      "reliable checkpoint diverged from localCheckpoint")
  }

  test("reliable-checkpoint mode refuses when no checkpoint dir is set") {
    import graft.operators.Curation
    import graft.operators.Curation.Materialize
    // run in a throwaway context? cheaper: only assert the require fires
    // when the dir is unset — skip if a prior test set one (ordering)
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val e = intercept[IllegalArgumentException] {
        Curation.pipeline(docs, "doc_id", "text",
          Curation.Config(maxPerSource = Some(("source", 18)),
            materialize = Materialize.ReliableCheckpoint))
      }
      assert(e.getMessage.contains("setCheckpointDir"))
    }
  }

  test("temperature sampling flattens the source mixture (alpha < 1)") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    val d = docs
    val natural = d.groupBy("source")
      .agg(sum(TextAnalysis.tokenCount(col("text"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = natural.values.sum.toDouble
    val emitted = TextAnalysis
      .temperatureResample(d, "doc_id", "text", "source", alpha = 0.5)
      .groupBy("source")
      .agg(sum(col("n_copies") * col("n_tokens")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val eTotal = emitted.values.sum.toDouble
    val scarcest = natural.minBy(_._2)._1
    val richest = natural.maxBy(_._2)._1
    assert(natural(scarcest) < natural(richest), "fixture must be skewed")
    // α = 0.5 must move shares toward uniform: the scarcest source gains
    // share, the richest loses share, and the total stays ~1 epoch
    assert(emitted(scarcest) / eTotal > natural(scarcest) / total,
      s"scarce source must upsample: $emitted vs $natural")
    assert(emitted(richest) / eTotal < natural(richest) / total,
      s"rich source must downsample: $emitted vs $natural")
    assert(math.abs(eTotal / total - 1.0) < 0.1,
      s"1-epoch target drifted: $eTotal vs $total")
  }

  test("gopher rules at paper defaults separate clean text from junk") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val clean = (1 to 60).map(i => s"word$i with the stuff").mkString(" ")
    val df = Seq(
      (1L, clean), // 240 words, stopwords 'the'+'with', all alphabetic
      (2L, "too short to pass the word count rule with anything"),
      (3L, (1 to 60).map(i => s"### $i ...").mkString(" ")), // symbol spam
      (4L, (1 to 60).map(i => s"w$i xx the").mkString(" "))) // no 2nd stopword
      .toDF("doc_id", "text")
    val v = TextAnalysis.gopherRules(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(v == Map(1L -> "keep", 2L -> "drop", 3L -> "drop", 4L -> "drop"),
      s"unexpected verdicts: $v")
  }

  test("lmTrain refuses a model too big to broadcast") {
    import graft.operators.TextAnalysis
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.lmTrain(docs, "doc_id", "text",
        minCount = 1, maxEntries = 10)
    }
    assert(e.getMessage.contains("minCount"),
      s"refusal must point at the prune lever: ${e.getMessage}")
  }

  test("Y4M path decodes an authored video to exact metadata and luma bands") {
    import spark.implicits._
    // 4 frames of 4×2 C420, constant luma per frame: header + frame walk,
    // fps 5:1 → duration 4/5 s, band means = Y/255 exactly
    val lumas = Seq(16, 66, 116, 216)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("YUV4MPEG2 W4 H2 F5:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
    lumas.foreach { l =>
      bos.write("FRAME\n".getBytes("US-ASCII"))
      for (_ <- 0 until 8) bos.write(l) // Y plane 4×2
      for (_ <- 0 until 4) bos.write(128) // U, V planes 2×1 each
    }
    val y4m = bos.toByteArray
    val junk = "definitely not y4m".getBytes("UTF-8")
    val media = Seq((7L, "video", y4m), (8L, "video", junk))
      .toDF("media_id", "kind", "bytes")
    val out = Multimodal.extractFeatures(media, featureDim = 4).collect()
      .map(f => f.media_id -> f).toMap
    assert(out(7L).width == 4 && out(7L).height == 2
      && out(7L).duration_ms == 800L)
    out(7L).features.zip(lumas).foreach { case (got, l) =>
      assert(math.abs(got - l / 255.0) < 1e-7,
        s"${out(7L).features.toSeq} vs $lumas")
    }
    // unrecognizable video bytes fall back to the labeled stub
    val (w, h, d, feats) = Multimodal.StubDecoder.decode("video", junk, 4)
    assert(out(8L).width == w && out(8L).height == h
      && out(8L).duration_ms == d && out(8L).features.sameElements(feats))
    // frame extraction: gray frame (U=V=128) → R=G=B=(298·(Y−16)+128)>>8,
    // so the PNG's mean Rec.601 luma equals that value exactly
    val png = Multimodal.VideoCodec.frameAt(y4m, 2).get
    val decoded = Multimodal.ImageCodec.decode(png, 1).get
    assert(decoded._1 == 4 && decoded._2 == 2)
    val expected = ((298 * (116 - 16) + 128) >> 8) / 255.0
    assert(math.abs(decoded._3.head - expected) < 1e-7,
      s"${decoded._3.head} vs $expected")
    assert(Multimodal.VideoCodec.frameAt(y4m, 4).isEmpty, "past-end frame")
  }

  test("synthetic video corpus round-trips through the real decoder") {
    val vids = Multimodal.syntheticVideos(
      docs.filter(col("doc_id") % 8 === 2), "doc_id")
    val feats = Multimodal.extractFeatures(vids).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.width == 8 + (f.media_id % 8).toInt * 2
        && f.height == 8 + (f.media_id % 6).toInt * 2,
        s"decoded dims disagree with authored dims: $f")
      assert(f.duration_ms == (4 + f.media_id % 16) * 100,
        s"decoded duration disagrees with authored frames: $f")
      f.features.foreach(v => assert(v >= 0f && v <= 1f))
    }
  }

  test("sampled video frames are the real decoded frames at the sampled ts") {
    val vids = Multimodal.syntheticVideos(
      docs.filter(col("doc_id") % 8 === 2).limit(6), "doc_id")
    val payloads = vids.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](2)).toMap
    val frames = Multimodal.sampleFrames(vids, everyMs = 250L).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.media_id).foreach { case (id, fs) =>
      val durMs = (4 + id % 16) * 100
      assert(fs.length == (durMs / 250 + 1).toInt, s"media $id: ${fs.length}")
      fs.foreach { f =>
        assert(f.ts_ms == f.frame_idx * 250L)
        // the emitted PNG is byte-identical to decoding that frame directly
        val nFrames =
          Multimodal.VideoCodec.frameCount(payloads(id)).get
        val idx = math.min(nFrames - 1L, f.ts_ms * 10 / 1000).toInt // 10 fps
        val direct = Multimodal.VideoCodec.frameAt(payloads(id), idx).get
        assert(f.frame.sameElements(direct), s"media $id frame ${f.frame_idx}")
      }
      // different sampled timestamps hit different frames → distinct bytes
      assert(fs.map(f => java.util.Arrays.hashCode(f.frame)).distinct.length
        == fs.length, s"media $id frames should differ")
    }
  }

  test("aggregation repetition screen equals the per-row HOF form") {
    import graft.operators.TextAnalysis
    val agg = TextAnalysis.repetitionScreen(docs, "doc_id", "text")
      .select("doc_id", "top_bigram_frac").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hof = docs.select(col("doc_id"),
      TextAnalysis.topBigramFraction(col("text")).as("f")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(agg.keySet == hof.keySet)
    agg.foreach { case (id, f) =>
      assert(f == hof(id), s"doc $id: agg $f vs hof ${hof(id)}")
    }
  }

  test("bloom-filtered join equals the plain join row-for-row") {
    import graft.operators.BloomJoin
    val build = Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_mktsegment"))
    val probe = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("o_orderkey"), col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val bloom = rows(BloomJoin.bloomFilteredJoin(
      probe, build, "o_custkey", "c_custkey", expectedBuildRows = 10000L))
    val plain = rows(
      probe.join(build, col("o_custkey") === col("c_custkey")))
    assert(plain.nonEmpty, "fixture join should produce rows")
    assert(bloom == plain)
  }

  test("z-value interleaves bits exactly; zOrderBy ranges are disjoint") {
    import graft.operators.Layout
    def zRef(x: Long, y: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val ev = Tables.events(spark, sf)
    val sample = ev.select(col("user_id"), col("event_id"),
      Layout.zValue2(col("user_id"), col("event_id")).as("z"))
      .limit(2000).collect()
    sample.foreach { r =>
      val want = zRef(r.getLong(0) & 0xFFFFL, r.getLong(1) & 0xFFFFL)
      assert(r.getLong(2) == want,
        s"(${r.getLong(0)}, ${r.getLong(1)}): got ${r.getLong(2)}, " +
          s"want $want")
    }
    // clustering property: each range partition covers a disjoint z-range
    val ranges = Layout.zOrderBy(ev, "user_id", "event_id", 8)
      .select(col("user_id"), col("event_id")).rdd
      .mapPartitionsWithIndex { (pi, it) =>
        val zs = it.map(r => zRef(r.getLong(0) & 0xFFFFL,
          r.getLong(1) & 0xFFFFL)).toSeq
        if (zs.isEmpty) Iterator.empty
        else Iterator.single((pi, zs.min, zs.max))
      }.collect().sortBy(_._1)
    assert(ranges.length > 1, "should spread over multiple partitions")
    ranges.sliding(2).foreach {
      case Array((_, _, maxA), (_, minB, _)) =>
        assert(maxA <= minB,
          s"overlapping z-ranges: ${ranges.mkString(", ")}")
      case _ => ()
    }
  }

  test("Hilbert index is a bijective unit-step walk over the full grid") {
    import graft.operators.Layout
    import spark.implicits._
    // the defining space-filling-curve property on the complete 16x16
    // grid: every cell gets a distinct d in [0, 256), and consecutive d
    // are Manhattan-adjacent cells (Morton violates this at power-of-two
    // seams - the very reason Hilbert exists)
    val cells = (0 until 16).flatMap(x => (0 until 16).map(y => (x, y)))
      .toDF("x", "y")
    val got = Layout.withHilbert2(cells, "x", "y", "d", bits = 4)
      .select("x", "y", "d").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(got.map(_._3).toSet == (0L until 256L).toSet,
      "Hilbert d must be a bijection onto [0, 4^bits)")
    val walk = got.sortBy(_._3)
    walk.sliding(2).foreach { case Array((x0, y0, _), (x1, y1, d1)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"non-adjacent step at d=$d1: ($x0,$y0) -> ($x1,$y1)")
    }
  }

  test("3-D Hilbert is a bijective unit-step walk over the full cube") {
    import graft.operators.Layout
    import spark.implicits._
    // the defining property in 3-D on the complete 8x8x8 cube: a
    // bijection onto [0, 8^bits) whose consecutive values are
    // face-adjacent cells (Manhattan distance exactly 1)
    val cells = (0 until 8).flatMap(x => (0 until 8).flatMap(y =>
      (0 until 8).map(z => (x, y, z)))).toDF("x", "y", "z")
    val got = Layout.withHilbert3(cells, "x", "y", "z", "d", bits = 3)
      .select("x", "y", "z", "d").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(got.map(_._4).toSet == (0L until 512L).toSet,
      "Hilbert d must be a bijection onto [0, 8^bits)")
    val walk = got.sortBy(_._4)
    walk.sliding(2).foreach {
      case Array((x0, y0, z0, _), (x1, y1, z1, d1)) =>
        assert(math.abs(x1 - x0) + math.abs(y1 - y0) +
          math.abs(z1 - z0) == 1,
          s"non-adjacent step at d=$d1: ($x0,$y0,$z0) -> ($x1,$y1,$z1)")
      case _ => ()
    }
  }

  test("3-D Hilbert at full 16-bit width matches the bit-loop reference") {
    import graft.operators.Layout
    import spark.implicits._
    // driver-side Skilling reference, independent of the Column fold
    def ref(x: Long, y: Long, z: Long, bits: Int): Long = {
      val mask = (1L << bits) - 1
      val X = Array(x & mask, y & mask, z & mask)
      var q = 1L << (bits - 1)
      while (q > 1) {
        val p = q - 1
        var i = 0
        while (i < 3) {
          if ((X(i) & q) != 0) X(0) ^= p
          else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t }
          i += 1
        }
        q >>= 1
      }
      X(1) ^= X(0); X(2) ^= X(1)
      var t = 0L
      q = 1L << (bits - 1)
      while (q > 1) { if ((X(2) & q) != 0) t ^= q - 1; q >>= 1 }
      X(0) ^= t; X(1) ^= t; X(2) ^= t
      var d = 0L
      var j = 0
      while (j < bits) {
        d |= ((X(0) >> j) & 1L) << (j * 3 + 2)
        d |= ((X(1) >> j) & 1L) << (j * 3 + 1)
        d |= ((X(2) >> j) & 1L) << (j * 3)
        j += 1
      }
      d
    }
    val pts = (0 until 500).map { i =>
      ((i * 7919L) % 65536, (i * 104729L) % 65536, (i * 1299709L) % 65536)
    }
    val got = Layout.withHilbert3(
        pts.toDF("x", "y", "z"), "x", "y", "z", "d")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    pts.foreach { p =>
      assert(got(p) == ref(p._1, p._2, p._3, 16),
        s"$p: ${got(p)} != ${ref(p._1, p._2, p._3, 16)}")
    }
  }

  test("N-D Hilbert is a bijective unit-step walk over full hypercubes") {
    import graft.operators.Layout
    import spark.implicits._
    // the defining property for every supported dimension count, on a
    // complete cube small enough to enumerate: a bijection onto
    // [0, 2^(n·bits)) whose consecutive values are face-adjacent cells
    for ((n, bits) <- Seq((2, 3), (4, 2), (5, 2), (6, 2))) {
      val side = 1 << bits
      val total = 1L << (n * bits)
      val cells = (0L until total).map { c =>
        (0 until n).map(i => ((c >> (i * bits)) & (side - 1)).toInt)
      }
      val names = (0 until n).map(i => s"c$i")
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          cells.map(org.apache.spark.sql.Row.fromSeq(_)), 4),
        org.apache.spark.sql.types.StructType(names.map(
          org.apache.spark.sql.types.StructField(_,
            org.apache.spark.sql.types.IntegerType, nullable = false))))
      val got = Layout.withHilbertN(df, names, "d", bits)
        .select((names :+ "d").map(col): _*).collect()
        .map(r => (0 until n).map(r.getInt).toVector -> r.getLong(n))
      assert(got.map(_._2).toSet == (0L until total).toSet,
        s"n=$n bits=$bits: d must be a bijection onto [0, 2^(n*bits))")
      val walk = got.sortBy(_._2)
      walk.sliding(2).foreach {
        case Array((p0, _), (p1, d1)) =>
          val manhattan = p0.lazyZip(p1).map((a, b) => math.abs(a - b)).sum
          assert(manhattan == 1,
            s"n=$n: non-adjacent step at d=$d1: $p0 -> $p1")
        case _ => ()
      }
    }
  }

  test("N-D Hilbert at full bit width matches the bit-loop reference") {
    import graft.operators.Layout
    import spark.implicits._
    // driver-side Skilling reference, generalized; independent of the
    // Column fold (mirrors the 3-D reference above)
    def ref(xs: Seq[Long], bits: Int): Long = {
      val n = xs.length
      val mask = (1L << bits) - 1
      val X = xs.map(_ & mask).toArray
      var q = 1L << (bits - 1)
      while (q > 1) {
        val p = q - 1
        var i = 0
        while (i < n) {
          if ((X(i) & q) != 0) X(0) ^= p
          else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t }
          i += 1
        }
        q >>= 1
      }
      var i = 1
      while (i < n) { X(i) ^= X(i - 1); i += 1 }
      var t = 0L
      q = 1L << (bits - 1)
      while (q > 1) { if ((X(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
      i = 0
      while (i < n) { X(i) ^= t; i += 1 }
      var d = 0L
      var j = 0
      while (j < bits) {
        i = 0
        while (i < n) {
          d |= ((X(i) >> j) & 1L) << (j * n + (n - 1 - i))
          i += 1
        }
        j += 1
      }
      d
    }
    for ((n, bits) <- Seq((2, 16), (4, 15), (5, 12), (6, 10))) {
      val pts = (0 until 300).map { k =>
        (0 until n).map(i =>
          (k.toLong * Seq(7919L, 104729L, 1299709L, 15485863L, 32452843L,
            49979687L)(i)) & ((1L << bits) - 1))
      }
      val names = (0 until n).map(i => s"c$i")
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          pts.map(org.apache.spark.sql.Row.fromSeq(_)), 4),
        org.apache.spark.sql.types.StructType(names.map(
          org.apache.spark.sql.types.StructField(_,
            org.apache.spark.sql.types.LongType, nullable = false))))
      val got = Layout.withHilbertN(df, names, "d", bits)
        .select((names :+ "d").map(col): _*).collect()
        .map(r => (0 until n).map(r.getLong).toVector -> r.getLong(n))
        .toMap
      pts.foreach { p =>
        assert(got(p.toVector) == ref(p, bits),
          s"n=$n bits=$bits $p: ${got(p.toVector)} != ${ref(p, bits)}")
      }
    }
  }

  test("Hilbert native expression matches the Column fold bit-for-bit") {
    import graft.operators.Layout
    import spark.implicits._
    // two fully independent formulations of the Skilling transform — the
    // codegen'd static-loop expression (production path) and the
    // (bits−1)·n-stage Column fold (differential twin). Moderate widths:
    // the fold's big CaseWhen chains make full-width ANALYSIS quadratic
    // (minutes per plan at 16 bits); the per-bit loop is width-uniform,
    // and full width is already pinned on the production path against
    // the driver-side bit loop (test above) and DuckDB (q_z4/q_z5).
    for ((n, bits) <- Seq((2, 8), (3, 8), (4, 6), (5, 6), (6, 6))) {
      val pts = (0 until 400).map { k =>
        (0 until n).map(i =>
          (k.toLong * 2654435761L + i * 40503L) & ((1L << bits) - 1))
      }
      val names = (0 until n).map(i => s"c$i")
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          pts.map(org.apache.spark.sql.Row.fromSeq(_)), 4),
        org.apache.spark.sql.types.StructType(names.map(
          org.apache.spark.sql.types.StructField(_,
            org.apache.spark.sql.types.LongType, nullable = false))))
      val native = Layout.withHilbertN(df, names, "d", bits)
        .select((names :+ "d").map(col): _*).collect()
        .map(r => (0 until n).map(r.getLong).toVector -> r.getLong(n))
        .toMap
      val fold = Layout.withHilbertNFold(df, names, "d", bits)
        .select((names :+ "d").map(col): _*).collect()
        .map(r => (0 until n).map(r.getLong).toVector -> r.getLong(n))
        .toMap
      assert(native == fold, s"n=$n bits=$bits: native != fold")
    }
    // null coordinate -> null index on both paths. A REAL (non-foldable)
    // source, not literals: an all-literal one-row plan makes every fold
    // stage "cheap", so CollapseProject inlines the whole chain into one
    // exponentially-duplicated expression and optimization takes minutes.
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(null, java.lang.Long.valueOf(7L))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c0",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("c1",
          org.apache.spark.sql.types.LongType, nullable = true))))
    assert(Layout.withHilbertN(withNull, Seq("c0", "c1"), "d", 8)
      .select("d").collect().head.isNullAt(0))
    assert(Layout.withHilbertNFold(withNull, Seq("c0", "c1"), "d", 8)
      .select("d").collect().head.isNullAt(0))
  }

  test("hilbertOrderBy3 partitions are contiguous Hilbert segments") {
    import graft.operators.Layout
    import spark.implicits._
    val cube = (0 until 16).flatMap(x => (0 until 16).flatMap(y =>
      (0 until 16).map(z => (x, y, z)))).toDF("x", "y", "z")
    val parts = Layout.hilbertOrderBy3(cube, "x", "y", "z",
      numPartitions = 8, bits = 4)
    // every partition's rows, re-indexed, must form one contiguous run
    val ranges = parts.rdd.mapPartitions { it =>
      val ds = it.map { r =>
        // recompute d driver-free via the certified operator? the rows
        // lost the index by design — recompute from coords with the
        // same fold (already pinned against the reference above)
        (r.getInt(0), r.getInt(1), r.getInt(2))
      }.toArray
      Iterator.single(ds)
    }.collect().filter(_.nonEmpty)
    val dOf = Layout.withHilbert3(cube, "x", "y", "z", "d", bits = 4)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    assert(ranges.map(_.length).sum == 4096)
    ranges.foreach { cells =>
      val ds = cells.map(dOf).sorted
      assert(ds.last - ds.head + 1 == ds.length,
        s"partition holds a non-contiguous Hilbert range " +
          s"(${ds.head}..${ds.last}, ${ds.length} cells)")
    }
  }

  test("hilbertOrderByN partitions are contiguous 4-D Hilbert segments") {
    import graft.operators.Layout
    import spark.implicits._
    val cube = (0 until 8).flatMap(a => (0 until 8).flatMap(b =>
      (0 until 8).flatMap(c => (0 until 8).map(d => (a, b, c, d)))))
      .toDF("a", "b", "c", "d")
    val names = Seq("a", "b", "c", "d")
    val parts = Layout.hilbertOrderByN(cube, names, numPartitions = 8,
      bits = 3)
    val cells = parts.rdd.mapPartitions { it =>
      Iterator.single(it.map(r =>
        (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))).toArray)
    }.collect().filter(_.nonEmpty)
    val dOf = Layout.withHilbertN(cube, names, "h", bits = 3)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
        -> r.getLong(4))
      .toMap
    assert(cells.map(_.length).sum == 4096)
    cells.foreach { cs =>
      val ds = cs.map(dOf).sorted
      assert(ds.last - ds.head + 1 == ds.length,
        s"partition holds a non-contiguous Hilbert range " +
          s"(${ds.head}..${ds.last}, ${ds.length} cells)")
    }
  }

  test("hilbertOrderBy clusters tighter than Morton on unaligned splits") {
    import graft.operators.Layout
    import spark.implicits._
    // 100x100 uniform grid, 12 range partitions: power-of-two seams
    // fragment Morton segments while every Hilbert segment stays one
    // connected region, so the summed bounding-box area must not lose
    val grid = (0 until 100).flatMap(x => (0 until 100).map(y => (x, y)))
      .toDF("x", "y")
    def bboxAreaSum(parts: org.apache.spark.sql.DataFrame): Long =
      parts.rdd.mapPartitions { it =>
        var (x0, x1, y0, y1, n) =
          (Int.MaxValue, Int.MinValue, Int.MaxValue, Int.MinValue, 0L)
        it.foreach { r =>
          val x = r.getInt(0); val y = r.getInt(1)
          x0 = math.min(x0, x); x1 = math.max(x1, x)
          y0 = math.min(y0, y); y1 = math.max(y1, y); n += 1
        }
        if (n == 0) Iterator.empty
        else Iterator.single((x1 - x0 + 1).toLong * (y1 - y0 + 1))
      }.collect().sum
    val h = bboxAreaSum(Layout.hilbertOrderBy(grid, "x", "y", 12, bits = 7))
    val z = bboxAreaSum(Layout.zOrderBy(grid, "x", "y", 12))
    assert(h <= z, s"Hilbert bbox area $h worse than Morton $z")
    // and genuinely tight: each of 12 partitions covers ~833 cells, so
    // a connected region's bbox stays within a small constant of that
    assert(h <= 12 * 3 * 900, s"Hilbert clustering degenerate: $h")
  }

  test("zValueN generalizes the interleave: 2-D equals zValue2, 4-D exact") {
    import graft.operators.Layout
    // n-dim reference interleave, written independently of the Column tree
    def zRefN(vs: Seq[Long], bits: Int): Long = {
      var z = 0L
      val n = vs.length
      for (i <- vs.indices; j <- 0 until bits)
        z |= ((vs(i) >> j) & 1L) << (j * n + i)
      z
    }
    val ev = Tables.events(spark, sf)
    // 2-D zValueN must equal the magic-number zValue2 bit-for-bit
    val two = ev.select(
      Layout.zValue2(col("user_id"), col("event_id")).as("a"),
      Layout.zValueN(Seq(col("user_id"), col("event_id"))).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(two == 0, s"zValueN(2) diverged from zValue2 on $two rows")
    // 4-D: 15 bits per dim, against the reference loop
    val sample = ev.select(col("user_id"), col("event_id"),
      Layout.zValueN(Seq(col("user_id"), col("event_id"),
        col("user_id") + 7, col("event_id") * 3)).as("z"))
      .limit(1000).collect()
    sample.foreach { r =>
      val mask = (1L << 15) - 1
      val want = zRefN(Seq(r.getLong(0) & mask, r.getLong(1) & mask,
        (r.getLong(0) + 7) & mask, (r.getLong(1) * 3) & mask), 15)
      assert(r.getLong(2) == want,
        s"4-D interleave wrong for (${r.getLong(0)}, ${r.getLong(1)})")
    }
    // every code fits the positive-long budget (no sign-bit use)
    assert(sample.forall(_.getLong(2) >= 0L))
    intercept[IllegalArgumentException] {
      Layout.zValueN(Seq(col("user_id")))
    }
  }

  test("mixture sampling: bounded rates, binding source, determinism") {
    import graft.operators.TextAnalysis
    val weights = Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.3)
    val out = TextAnalysis.mixtureSample(
      docs, "doc_id", "text", "source", weights).collect()
    // only weighted sources survive
    assert(out.map(_.getString(1)).toSet == weights.keySet)
    val rates = out.map(r => r.getString(1) -> r.getDouble(3)).toMap
    // every rate in (0, 1] up to FP slack; the binding source keeps ~all
    rates.values.foreach(r => assert(r > 0 && r <= 1.0 + 1e-9, s"rate $r"))
    assert(rates.values.max > 1.0 - 1e-9,
      s"some source must bind the budget at rate 1: $rates")
    // kept-token mass per source approximates the target mixture: each
    // source's realized share of rate*tokens equals the weight exactly by
    // construction (w·B tokens each in expectation)
    val expTokens = out.groupBy(_.getString(1)).map { case (s0, rows) =>
      s0 -> rows.map(r => r.getLong(2) * r.getDouble(3)).sum
    }
    val total = expTokens.values.sum
    weights.foreach { case (s0, w) =>
      val share = expTokens(s0) / total
      assert(math.abs(share - w) < 0.02,
        f"expected token share of $s0 to be ~$w, got $share%.3f")
    }
    // deterministic end to end (no RNG anywhere)
    val again = TextAnalysis.mixtureSample(
      docs, "doc_id", "text", "source", weights).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("mixture resampling degenerates to mixture sampling at the cap") {
    // when the resample target equals the downsampler's implied budget
    // (B = min t_s/w_s), every factor is <= 1 and the two operators must
    // keep EXACTLY the same documents — same thresholds, same md5 rule
    import graft.operators.TextAnalysis
    val weights = Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.3)
    val sampled = TextAnalysis.mixtureSample(
      docs, "doc_id", "text", "source", weights).collect()
    val totals = sampled.groupBy(_.getString(1)).map { case (s0, rows) =>
      s0 -> rows.map(_.getLong(2)).sum
    }
    val budget = weights.keys.map(s0 => totals(s0) / weights(s0)).min
    val multiple = budget / totals.values.sum
    val resampled = TextAnalysis.mixtureResample(
      docs, "doc_id", "text", "source", weights, multiple).collect()
    assert(resampled.forall(_.getDouble(3) <= 1.0 + 1e-9),
      "at the cap no source may upsample")
    val kept = sampled.filter(_.getBoolean(4)).map(_.getLong(0)).toSet
    val emitted = resampled.filter(_.getLong(4) == 1L)
      .map(_.getLong(0)).toSet
    assert(emitted == kept,
      s"the two mixers disagree at the cap: ${(emitted -- kept).take(3)} " +
        s"extra, ${(kept -- emitted).take(3)} missing")
  }

  test("semantic dedup: intra-cluster pairs are a subset of exact pairs") {
    val exact = Similarity
      .cosineNearDupPairs(embs, "vec_id", "embedding", 0.45)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = Similarity
      .semanticDedupPairs(embs, "vec_id", "embedding", 0.45)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((sem -- exact).isEmpty,
      s"semantic dedup invented pairs not in the exact set: ${sem -- exact}")
    // verdict output covers the whole corpus exactly once, and drops are
    // precisely the pair losers
    val verdict = Similarity
      .semanticDedup(embs, "vec_id", "embedding", 0.45).collect()
    assert(verdict.length == embs.count())
    val dropped = verdict.filter(_.getString(2) == "drop")
      .map(_.getLong(0)).toSet
    assert(dropped == sem.map(_._2),
      "drop set must equal the distinct pair losers")
    // determinism: hash-sampled k-means + fixed block hash → bit-stable
    val again = Similarity
      .semanticDedupPairs(embs, "vec_id", "embedding", 0.45)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == sem)
  }

  test("semantic dedup finds planted duplicates (co-clustering recall)") {
    // 32 planted modes × 32 members; every even id has a near-identical
    // twin (odd id, 2% jitter, cos ≈ 0.999): semantic duplicates share a
    // nearest centroid, so the intra-cluster search must recover nearly
    // every twin pair at a fraction of the exact all-pairs cost.
    import spark.implicits._
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def u(seed: Long): Double =
      (Math.floorMod(mix(seed), 1000001L) / 500000.0) - 1.0
    val dim = 64
    val rows = for (c <- 0 until 32; m <- 0 until 32) yield {
      val id = (c * 32 + m).toLong
      val pairBase = id / 2 * 2 // twins share the base vector
      val v = Array.tabulate(dim) { d =>
        (u(c.toLong * 7919 + d) + 0.3 * u(pairBase * 104729 + d)
          + 0.02 * u(id * 15485863 + d)).toFloat
      }
      (id, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val twins = rows.indices.collect {
      case i if i % 2 == 0 => (rows(i)._1, rows(i + 1)._1)
    }.toSet
    val found = Similarity
      .semanticDedupPairs(emb, "vec_id", "embedding", threshold = 0.99,
        k = 32)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (twins & found).size.toDouble / twins.size
    println(f"semdedup planted-twin recall = $recall%.3f over ${twins.size}")
    assert(recall >= 0.9,
      f"semantic dedup lost planted twins: $recall%.3f")
  }

  test("MP4 probe: exact metadata, v1 boxes, never throws on garbage") {
    import spark.implicits._
    val ids = docs.filter(col("doc_id") % 8 === 3).limit(16)
    val payloads = Multimodal.syntheticMp4s(ids, "doc_id")
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect()
    assert(payloads.nonEmpty)
    payloads.foreach { case (mid, bytes) =>
      val got = Multimodal.Mp4Probe.probe(bytes)
      val want = Some((160 + (mid % 16).toInt * 8, 120 + (mid % 12).toInt * 8,
        (2 + mid % 20) * 1000L))
      assert(got == want, s"mp4 probe wrong for $mid: $got vs $want")
      // every truncation of a valid payload must return cleanly — a crawl
      // probe sees torn downloads constantly
      Seq(0, 3, 8, 11, 20, bytes.length / 2, bytes.length - 1).foreach { n =>
        Multimodal.Mp4Probe.probe(bytes.take(n)) // must not throw
      }
      // bit-flipped sizes must not throw either (hostile/corrupt input)
      val corrupt = bytes.clone(); corrupt(0) = 0x7f.toByte
      Multimodal.Mp4Probe.probe(corrupt)
    }
    // version-1 mvhd/tkhd: 64-bit times, wider layout
    def box(tp: String, p: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + p.length)
      b.putInt(8 + p.length).put(tp.getBytes("US-ASCII")).put(p).array()
    }
    val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(16)
      .put("isom".getBytes("US-ASCII")).putInt(0)
      .put("isom".getBytes("US-ASCII"))
      .put("mp41".getBytes("US-ASCII")).array())
    val mvhd1 = {
      val b = java.nio.ByteBuffer.allocate(112)
      b.putInt(0x01000000)             // version 1
      b.putLong(0L).putLong(0L)        // creation, modification (64-bit)
      b.putInt(1000)                   // timescale
      b.putLong(7500L)                 // duration -> 7500 ms
      b.position(b.position() + 80)    // rest zeroed
      box("mvhd", b.array())
    }
    val tkhd1 = {
      val b = java.nio.ByteBuffer.allocate(96)
      b.putInt(0x01000007)             // version 1, flags
      b.putLong(0L).putLong(0L)        // creation, modification
      b.putInt(1).putInt(0)            // track_ID, reserved
      b.putLong(7500L)                 // duration
      b.position(b.position() + 8 + 8 + 36) // reserved, shorts, matrix
      b.putInt(640 << 16).putInt(480 << 16)
      box("tkhd", b.array())
    }
    val v1 = ftyp ++ box("moov", mvhd1 ++ box("trak", tkhd1))
    assert(Multimodal.Mp4Probe.probe(v1) == Some((640, 480, 7500L)),
      s"v1 boxes misparsed: ${Multimodal.Mp4Probe.probe(v1)}")
    // non-MP4 payloads (Y4M, PNG) must not be claimed
    val y4m = Multimodal.syntheticVideos(ids.limit(1), "doc_id")
      .select("bytes").as[Array[Byte]].head()
    assert(Multimodal.Mp4Probe.probe(y4m).isEmpty)
  }

  test("FLAC probe: exact STREAMINFO fields, never throws on garbage") {
    import spark.implicits._
    val ids = docs.filter(col("doc_id") % 8 === 4).limit(16)
    val payloads = Multimodal.syntheticFlacs(ids, "doc_id")
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect()
    assert(payloads.nonEmpty)
    val rates = Array(8000, 16000, 22050, 44100, 48000)
    payloads.foreach { case (mid, bytes) =>
      val sr = rates((mid % 5).toInt)
      val total = 8000L + (mid % 32) * 1600L
      val want = Some((sr, 1 + (mid % 2).toInt, total * 1000L / sr))
      assert(Multimodal.FlacProbe.probe(bytes) == want,
        s"flac probe wrong for $mid")
      Seq(0, 3, 7, 20, bytes.length - 1).foreach { n =>
        Multimodal.FlacProbe.probe(bytes.take(n)) // must not throw
      }
    }
    // a real WAV must not be claimed by the FLAC probe
    val wav = Multimodal.syntheticAudio(ids.limit(1), "doc_id")
      .select("bytes").as[Array[Byte]].head()
    assert(Multimodal.FlacProbe.probe(wav).isEmpty)
  }

  test("MP3 frame walk: exact frame count, junk tolerance, no false sync") {
    import spark.implicits._
    val ids = docs.filter(col("doc_id") % 8 === 5).limit(16)
    val payloads = Multimodal.syntheticMp3s(ids, "doc_id")
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect()
    assert(payloads.nonEmpty)
    payloads.foreach { case (mid, bytes) =>
      val sr = Array(44100, 48000, 32000)((mid % 3).toInt)
      val frames = 20 + (mid % 40).toInt
      val want = Some((sr, frames, frames * 1152L * 1000L / sr))
      assert(Multimodal.Mp3Probe.probe(bytes) == want,
        s"mp3 walk wrong for $mid: ${Multimodal.Mp3Probe.probe(bytes)}")
      // leading junk (ID3-tag stand-in) must be skipped to the first sync
      val tagged = Array.fill[Byte](37)(0x49) ++ bytes
      assert(Multimodal.Mp3Probe.probe(tagged) == want, "junk prefix broke")
      // truncations must never throw
      Seq(0, 3, 5, bytes.length / 2).foreach { n =>
        Multimodal.Mp3Probe.probe(bytes.take(n))
      }
    }
    // a single spurious sync in noise must not be claimed (needs >= 2
    // consecutive frames)
    val noise = Array[Byte](0x12, 0xFF.toByte, 0xFB.toByte, 0x92.toByte,
      0x00, 0x01, 0x02, 0x03)
    assert(Multimodal.Mp3Probe.probe(noise).isEmpty)
    // WAV must not be claimed
    val wav = Multimodal.syntheticAudio(ids.limit(1), "doc_id")
      .select("bytes").as[Array[Byte]].head()
    assert(Multimodal.Mp3Probe.probe(wav).isEmpty)
  }

  test("WebM probe: exact EBML metadata, unknown-size segments, garbage") {
    import spark.implicits._
    val ids = docs.filter(col("doc_id") % 8 === 6).limit(16)
    val payloads = Multimodal.syntheticWebms(ids, "doc_id")
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect()
    assert(payloads.nonEmpty)
    payloads.foreach { case (mid, bytes) =>
      val want = Some((320 + (mid % 16).toInt * 16,
        180 + (mid % 12).toInt * 16, (3 + mid % 25) * 1000L))
      assert(Multimodal.WebmProbe.probe(bytes) == want,
        s"webm probe wrong for $mid: ${Multimodal.WebmProbe.probe(bytes)}")
      // truncations and bit flips must never throw
      Seq(0, 2, 5, 11, bytes.length / 2, bytes.length - 1).foreach { n =>
        Multimodal.WebmProbe.probe(bytes.take(n))
      }
      val corrupt = bytes.clone(); corrupt(6) = 0xFF.toByte
      Multimodal.WebmProbe.probe(corrupt)
    }
    // a live-streamed WebM declares its Segment with UNKNOWN size
    // (all-ones varint) — the walk must extend it to payload end
    val (_, sample) = payloads.head
    val segIdx = {
      // locate the 4-byte Segment id in the generated payload
      var i = 0
      while (!(sample(i) == 0x18.toByte && sample(i + 1) == 0x53.toByte
        && sample(i + 2) == 0x80.toByte && sample(i + 3) == 0x67.toByte))
        i += 1
      i
    }
    // write an all-ones (unknown) size varint of the SAME length as the
    // generated one (1-byte 0x80-form or 2-byte 0x40-form), so the
    // following bytes still line up
    val unknown = sample.clone()
    if ((sample(segIdx + 4) & 0x80) != 0) {
      unknown(segIdx + 4) = 0xFF.toByte
    } else {
      assert((sample(segIdx + 4) & 0x40) != 0, "unexpected size form")
      unknown(segIdx + 4) = 0x7F.toByte
      unknown(segIdx + 5) = 0xFF.toByte
    }
    assert(Multimodal.WebmProbe.probe(unknown)
      == Multimodal.WebmProbe.probe(sample),
      "unknown-size Segment must parse like the sized one")
    // MP4 and Y4M must not be claimed
    val mp4 = Multimodal.syntheticMp4s(ids.limit(1), "doc_id")
      .select("bytes").as[Array[Byte]].head()
    assert(Multimodal.WebmProbe.probe(mp4).isEmpty)
  }

  test("every codec and probe survives arbitrary bytes without throwing") {
    // a crawl decode stage sees garbage constantly: truncated downloads,
    // mislabeled content types, adversarial payloads. Every entry point
    // must return None/empty — never throw — on arbitrary input.
    // Deterministic splitmix-seeded corpus: failures reproduce exactly.
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val interesting = Seq[Array[Byte]](
      Array.empty,
      "fLaC".getBytes("US-ASCII"),
      "YUV4MPEG2".getBytes("US-ASCII"),
      Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte), // EBML magic alone
      Array(0, 0, 0, 8, 'f', 't', 'y', 'p').map(_.toByte), // bare ftyp
      Array(0xFF, 0xFB).map(_.toByte), // lone mp3 sync
      Array.fill[Byte](64)(0xFF.toByte),
      Array.fill[Byte](64)(0x00.toByte))
    val random = (0 until 500).map { i =>
      val n = (mix(i * 7L + 1).abs % 200).toInt
      Array.tabulate[Byte](n)(j => mix(i * 1000003L + j).toByte)
    }
    (interesting ++ random).zipWithIndex.foreach { case (b, i) =>
      withClue(s"fuzz case $i (${b.length} bytes): ") {
        Multimodal.Mp4Probe.probe(b)
        Multimodal.WebmProbe.probe(b)
        Multimodal.FlacProbe.probe(b)
        Multimodal.Mp3Probe.probe(b)
        Multimodal.imageDHash(b)
        Multimodal.audioFingerprint(b)
        Multimodal.videoDHash(b)
        Multimodal.ImageCodec.decode(b, 8)
        Multimodal.AudioCodec.decode(b, 8)
        Multimodal.VideoCodec.decode(b, 8)
      }
    }
  }

  test("image dHash survives the lossy JPEG container") {
    import spark.implicits._
    // same gradient per id, PNG vs JPEG container: the pixels differ (JPEG
    // is lossy) but the perceptual hash must stay within the near-dup
    // banding threshold, or a crawl's JPEG copy of a PNG would be invisible
    // to the media dedup screen
    val ids = docs.filter(col("doc_id") % 8 === 0).limit(32)
    val png = Multimodal.imageDHashes(
      Multimodal.syntheticImages(ids, "doc_id"))
      .select(col("media_id"), col("dhash").as("h_png"))
    val jpeg = Multimodal.imageDHashes(
      Multimodal.syntheticImages(ids, "doc_id", format = "jpeg"))
      .select(col("media_id"), col("dhash").as("h_jpg"))
    val dists = png.join(jpeg, Seq("media_id"))
      .select(col("media_id"),
        bit_count(col("h_png").bitwiseXOR(col("h_jpg"))).as("d"))
      .as[(Long, Int)].collect()
    assert(dists.length == 32, s"JPEG path dropped rows: ${dists.length}")
    val far = dists.filter(_._2 > 7)
    assert(far.isEmpty,
      s"JPEG moved the perceptual hash past the banding threshold: " +
        s"${far.take(5).toSeq}")
  }

  test("BMP decodes to pixels bit-equal with the PNG twin; GIF stays near") {
    import spark.implicits._
    val ids = docs.filter(col("doc_id") % 8 === 0).limit(32)
    val png = Multimodal.imageDHashes(
      Multimodal.syntheticImages(ids, "doc_id"))
      .select(col("media_id"), col("dhash").as("h_png"))
    // BMP is lossless: the decoded pixels — hence the dHash — must be
    // IDENTICAL to the PNG twin, bit for bit
    val bmp = Multimodal.imageDHashes(
      Multimodal.syntheticImages(ids, "doc_id", format = "bmp"))
      .select(col("media_id"), col("dhash").as("h_bmp"))
    val bmpDiff = png.join(bmp, Seq("media_id"))
      .filter(col("h_png") =!= col("h_bmp")).count()
    assert(bmpDiff == 0, s"BMP decode diverged from PNG on $bmpDiff images")
    // GIF palettizes to 256 colors: lossy, but the perceptual hash must
    // stay within the near-dup banding threshold like JPEG does
    val gif = Multimodal.imageDHashes(
      Multimodal.syntheticImages(ids, "doc_id", format = "gif"))
      .select(col("media_id"), col("dhash").as("h_gif"))
    val far = png.join(gif, Seq("media_id"))
      .select(col("media_id"),
        bit_count(col("h_png").bitwiseXOR(col("h_gif"))).as("d"))
      .as[(Long, Int)].collect().filter(_._2 > 7)
    assert(far.isEmpty,
      s"GIF moved the perceptual hash past the banding threshold: " +
        s"${far.take(5).toSeq}")
  }

  test("image dHash: re-encode invariant, edit tolerant, finds planted dups") {
    import spark.implicits._
    val imgs = Multimodal.syntheticImages(
      docs.filter(col("doc_id") % 8 === 0).limit(20), "doc_id")
    val base = imgs.select("media_id", "bytes")
      .as[(Long, Array[Byte])].collect()
    assert(base.length >= 10)
    def reencode(bytes: Array[Byte], tweak: Boolean): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (tweak) img.setRGB(0, 0, img.getRGB(0, 0) ^ 0x00FFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos) // different container
      bos.toByteArray
    }
    base.take(5).foreach { case (mid, bytes) =>
      val h0 = Multimodal.imageDHash(bytes).get
      // PNG → BMP re-encode: identical pixels, identical hash
      assert(Multimodal.imageDHash(reencode(bytes, tweak = false))
        .contains(h0), s"re-encode changed the hash for $mid")
      // one flipped pixel: nearly all gradient comparisons survive
      val hTweak = Multimodal.imageDHash(reencode(bytes, tweak = true)).get
      assert(java.lang.Long.bitCount(h0 ^ hTweak) <= 7,
        s"one-pixel edit moved $mid too far")
    }
    // pair search needs genuinely DISTINCT images — the synthetic
    // gradient corpus is one near-identical family by construction (its
    // members share gradient structure, which is precisely what dHash
    // keys on). Per-id noise images are pairwise far apart; a one-pixel
    // edited copy under id+1000 is the only near neighbor.
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def noiseImage(seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        27, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 27) {
        img.setRGB(x, y, (mix(seed * 6007 + y * 27 + x) & 0xFFFFFF).toInt)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val noisy = (0L until 10L).map(i => (i, noiseImage(i)))
    val planted = noisy.take(5).map { case (mid, bytes) =>
      (mid + 1000L, reencode(bytes, tweak = true))
    }
    val corpus = (noisy ++ planted).toDF("media_id", "bytes")
    val pairs = Multimodal.imageNearDupPairs(corpus)
      .select("media_a", "media_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = noisy.take(5).map { case (mid, _) =>
      (mid, mid + 1000L)
    }.toSet
    assert(expected.subsetOf(pairs),
      s"planted image dups missed: ${expected -- pairs}")
    val falsePairs = pairs.filterNot { case (a, b) => b - a == 1000L }
    assert(falsePairs.isEmpty, s"unrelated images paired: $falsePairs")
  }

  test("audio/video fingerprints: container invariant, content distinct") {
    import spark.implicits._
    // the registered synthetic corpus is constant-amplitude square waves —
    // energy-FLAT by design (its RMS oracle needs that), so an
    // energy-profile fingerprint correctly reports every clip alike.
    // Build amplitude-MODULATED clips for the distinctness claims.
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def modulatedWav(seed: Long): Array[Byte] = {
      val frames = 6500
      val pcm = new Array[Byte](frames * 2)
      for (i <- 0 until frames) {
        val band = i * 65 / frames
        val amp = 500 + Math.floorMod(mix(seed * 131 + band), 20000L).toInt
        val s = (if ((i / 50) % 2 == 0) amp else -amp).toShort
        pcm(2 * i) = (s & 0xFF).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true,
        false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val audio = (0L until 8L).map(i => (i, modulatedWav(i)))
    def toAiff(wav: Array[Byte]): Array[Byte] = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
      bos.toByteArray
    }
    audio.take(4).foreach { case (mid, wav) =>
      val fp = Multimodal.audioFingerprint(wav)
      assert(fp.isDefined, s"audio $mid must decode")
      // WAV → AIFF: same PCM samples, same fingerprint
      assert(Multimodal.audioFingerprint(toAiff(wav)) == fp,
        s"container re-encode moved audio fingerprint for $mid")
    }
    // distinct synthetic clips must not share a fingerprint
    val fps = audio.map { case (_, wav) =>
      Multimodal.audioFingerprint(wav).get
    }
    assert(fps.distinct.length == fps.length,
      "distinct audio clips collided")

    // video: the synthetic gradient clips are one visual family (tiny
    // first frames share gradient signs), so build noise-luma Y4M clips —
    // a spec-side writer, independent of the main parser — where content
    // is genuinely distinct and trailing-frame edits must not move the
    // first-frame fingerprint
    def noiseY4m(seed: Long, nFrames: Int): Array[Byte] = {
      val (w, h) = (16, 16)
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(s"YUV4MPEG2 W$w H$h F10:1 C420jpeg\n".getBytes("US-ASCII"))
      for (f <- 0 until nFrames) {
        bos.write("FRAME\n".getBytes("US-ASCII"))
        // frame 0 depends only on the seed; later frames vary freely
        val fseed = if (f == 0) seed else seed * 977 + f
        for (y <- 0 until h; x <- 0 until w) {
          bos.write((Math.floorMod(mix(fseed * 4099 + y * w + x), 256L))
            .toInt)
        }
        for (_ <- 0 until 2 * (w / 2) * (h / 2)) bos.write(128)
      }
      bos.toByteArray
    }
    val vfps = (0L until 6L).map { seed =>
      val v = noiseY4m(seed, nFrames = 3)
      val fp = Multimodal.videoDHash(v)
      assert(fp.isDefined, s"video $seed must decode")
      // the fingerprint IS the first frame's image dHash, and editing
      // trailing frames must not move it
      assert(Multimodal.VideoCodec.frameAt(v, 0)
        .flatMap(Multimodal.imageDHash) == fp)
      assert(Multimodal.videoDHash(noiseY4m(seed, nFrames = 5)) == fp,
        s"trailing frames moved the fingerprint for $seed")
      fp.get
    }
    assert(vfps.distinct.length == vfps.length,
      "distinct videos collided on first-frame dHash")
  }

  test("curation pipeline reports its stage funnel on one pass") {
    import graft.operators.{Curation, TextAnalysis}
    val res = Curation.pipeline(docs, "doc_id", "text")
    val finalRows = res.df.count() // ONE action resolves every metric
    val stages = res.stageRows
    assert(stages.map(_._1) == Seq("repetition_screen",
      "near_dup_removal", "decontamination", "quality_lang_filters"))
    // no probe suite passed → the decontamination stage is a no-op and
    // its count must equal dedup's
    assert(stages(2)._2 == stages(1)._2, s"no-probe decontam moved: $stages")
    val counts = stages.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel must be monotone: $stages")
    assert(counts.last == finalRows,
      s"last stage metric must equal the output: $stages vs $finalRows")
    // stage 1 equals an independent recomputation of the screen
    val repKeep = TextAnalysis.repetitionScreen(docs, "doc_id", "text")
      .filter(col("verdict") === "keep").count()
    assert(counts.head == repKeep, s"stage1 ${counts.head} vs $repKeep")
  }

  test("corpus-derived vocab: deterministic, and beats the toy vocab") {
    import graft.operators.TextAnalysis
    import graft.queries.Text.WpVocab
    graft.functions.GraftFunctions.register(spark)
    val v1 = TextAnalysis.deriveVocab(docs, "doc_id", "text", maxWords = 512)
    val v2 = TextAnalysis.deriveVocab(docs, "doc_id", "text", maxWords = 512)
    assert(v1 == v2, "vocab derivation must be deterministic")
    assert(v1.distinct.length == v1.length)
    // fallback alphabet always present → clean ASCII text segments fully
    assert(('a' to 'z').forall(c => v1.contains(c.toString)))
    def pieceStats(vocab: Seq[String]): (Double, Double) = {
      val pieces = graft.functions.GraftFunctions
        .wordpieceTokens(col("text"), vocab)
      val r = docs.select(
        sum(size(filter(pieces, p => p === "[UNK]"))).cast("double")
          .as("unk"),
        sum(size(pieces)).cast("double").as("all")).head()
      (r.getDouble(0) / r.getDouble(1), r.getDouble(1))
    }
    val (derivedUnk, derivedPieces) = pieceStats(v1)
    val (toyUnk, toyPieces) = pieceStats(WpVocab)
    println(f"unk: derived=$derivedUnk%.4f toy=$toyUnk%.4f; " +
      f"pieces: derived=$derivedPieces%.0f toy=$toyPieces%.0f")
    // the corpus-driven vocab must tokenize the corpus at least as well
    // as the hand-listed toy vocab on BOTH axes: no more [UNK]s, and
    // STRICTLY fewer total pieces (frequent words tokenize whole — the
    // compression property a trained vocab has and a toy list lacks)
    assert(derivedUnk <= toyUnk,
      f"derived vocab worse than toy: $derivedUnk%.4f vs $toyUnk%.4f")
    assert(derivedPieces < toyPieces,
      f"derived vocab does not compress: $derivedPieces%.0f vs " +
        f"$toyPieces%.0f pieces")
  }

  test("subword-budgeted packing equals a window recount on piece counts") {
    import graft.operators.TextAnalysis
    import graft.queries.Text.WpVocab
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val budget = 2048L
    val pieces = graft.functions.GraftFunctions
      .wordpieceTokens(col("text"), WpVocab)
    // independent recount: window-sum the piece counts per source and
    // derive shard ids the closed-form way (the distributed pack must
    // reproduce this exactly — the same oracle shape q_t11 certifies for
    // whitespace budgets)
    val w = Window.partitionBy("source").orderBy("doc_id")
    val expected = docs
      .select(col("doc_id"), col("source"),
        size(pieces).cast("long").as("n_tokens"))
      .withColumn("start",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor(col("start") / lit(budget)).cast("long").as("shard_id"))
      .collect().map(_.toString).sorted.toSeq
    val actual = TextAnalysis.packShards(
        docs, "doc_id", "text", "source", budgetTokens = budget,
        counter = t => size(
          graft.functions.GraftFunctions.wordpieceTokens(t, WpVocab)))
      .collect().map(_.toString).sorted.toSeq
    assert(actual == expected)
    // subword budgets genuinely differ from whitespace budgets here
    // (pieces per doc > whitespace tokens), or this test proves nothing
    val diff = TextAnalysis.packShards(
        docs, "doc_id", "text", "source", budgetTokens = budget)
      .collect().map(_.toString).sorted.toSeq
    assert(diff != expected, "piece counts degenerate to whitespace counts")
  }

  test("subword-budgeted mixture rates derive from piece totals") {
    import graft.operators.TextAnalysis
    import graft.queries.Text.WpVocab
    import spark.implicits._
    val weights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val pieceCounter: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column =
      t => size(graft.functions.GraftFunctions.wordpieceTokens(t, WpVocab))
    val out = TextAnalysis.mixtureSample(
      docs, "doc_id", "text", "source", weights, counter = pieceCounter)
    // independent recount of the budget arithmetic from raw piece totals
    val totals = docs
      .select(col("source"), pieceCounter(col("text")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("t")).as[(String, Long)]
      .collect().toMap
    val budget = weights.map { case (s, w) => totals(s) / w }.min
    val expectedRates = weights.map { case (s, w) =>
      s -> w * budget / totals(s)
    }
    val gotRates = out.select("source", "rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(gotRates == expectedRates,
      s"rates diverged: $gotRates vs $expectedRates")
    // the binding source keeps everything
    val binding = weights.keys.minBy(s => totals(s) / weights(s))
    assert(gotRates(binding) == 1.0, s"binding source $binding must keep all")
  }

  test("curation decontamination stage drops exactly the screened docs") {
    import graft.operators.{Curation, Decontaminate}
    import spark.implicits._
    // probe suite = copies of two corpus documents under fresh ids: their
    // sources are 100%-contained and must fall at the decontam stage
    val probes = docs.filter(col("doc_id").isin(20L, 21L))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val res = Curation.pipeline(docs, "doc_id", "text",
      probes = Some(probes))
    val base = Curation.pipeline(docs, "doc_id", "text")
    val survivors = res.df.select("doc_id").as[Long].collect().toSet
    val baseSurvivors = base.df.select("doc_id").as[Long].collect().toSet
    // independent recount of what the standalone screen flags
    val tagged = docs.select(col("doc_id"), col("text"),
        lit(false).as("__probe"))
      .unionByName(probes.select(col("doc_id"), col("text"),
        lit(true).as("__probe")))
    val flagged = Decontaminate.contamination(tagged, "doc_id", "text",
        probePred = col("__probe"), minContainment = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged.nonEmpty, "planted probe copies must be flagged")
    assert(survivors == baseSurvivors -- flagged,
      s"decontam stage diverged: flagged=$flagged")
    // the funnel's decontamination drop is visible and monotone
    val stages = res.stageRows
    assert(stages(2)._2 < stages(1)._2,
      s"decontam stage should have dropped rows: $stages")
  }

  test("curation span-cut hook rewrites survivors' text, never the funnel") {
    import graft.operators.{Curation, Dedup, TextAnalysis}
    val base = Curation.pipeline(docs, "doc_id", "text")
    val cut = Curation.pipeline(docs, "doc_id", "text",
      Curation.Config(spanCutMinDocs = Some(2)))
    val baseRows = base.df.select("doc_id", "clean_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cutRows = cut.df.select("doc_id", "clean_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // verdict stability: exactly the same survivors either way
    assert(cutRows.keySet == baseRows.keySet,
      "span cut must not change who survives")
    assert(base.stageRows == cut.stageRows,
      s"funnel moved: ${base.stageRows} vs ${cut.stageRows}")
    // emitted text equals redact(cutDuplicatedSpans) recomputed standalone
    val expected = Dedup.cutDuplicatedSpans(docs, "doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.redact(col("clean_text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bad = cutRows.filter { case (k, v) => expected(k) != v }
    assert(bad.isEmpty, s"cut text diverged for ${bad.keys.take(3)}")
    // and the cut genuinely bites on this corpus (it has duplicated spans)
    assert(cutRows.exists { case (k, v) => v != baseRows(k) },
      "span cut was a no-op on a corpus with known duplicated spans")
  }

  test("curation per-source cap redefines the corpus the pipeline sees") {
    import graft.operators.{Curation, TextAnalysis}
    import spark.implicits._
    val capped = Curation.pipeline(docs, "doc_id", "text",
      Curation.Config(maxPerSource = Some(("source", 3))))
    // independent recount: pipeline-on-capped-survivors must be identical
    val kept = TextAnalysis.capPerKey(
      docs.select(col("doc_id"), col("source")), "doc_id", "source", 3)
      .select("doc_id")
    val expected = Curation.pipeline(docs.join(kept, "doc_id"),
      "doc_id", "text")
    val got = capped.df.select("doc_id").as[Long].collect().toSet
    val want = expected.df.select("doc_id").as[Long].collect().toSet
    assert(got == want, s"cap stage diverged: ${(got -- want).take(3)}")
    // the cap genuinely bites and survivors respect it per source
    val bySource = docs.join(capped.df.select("doc_id"), "doc_id")
      .groupBy("source").count().collect()
    assert(bySource.forall(_.getLong(1) <= 3))
    assert(capped.stageRows.head._2 <= 3L * 20,
      s"funnel head exceeds cap x sources: ${capped.stageRows}")
  }

  test("compaction collapses a fragmented directory, data intact") {
    import graft.operators.Layout
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_spec")
    val frag = s"$tmp/frag"
    val out = s"$tmp/out"
    val src = Tables.orders(spark, sf)
    src.repartition(32).write.mode("overwrite").parquet(frag)
    val fragFiles = new java.io.File(frag).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(fragFiles >= 16, s"fixture should fragment: $fragFiles files")
    val rows = src.count()
    val target = math.max(1L, rows / 4)
    val outFiles = Layout.compact(spark, frag, out,
      targetRecordsPerFile = target)
    val expected = math.max(1L, (rows + target - 1) / target)
    assert(outFiles == expected,
      s"expected $expected files for $rows rows, got $outFiles")
    // byte-identical content: same rows, nothing lost or duplicated
    val before = src.collect().map(_.toSeq).toSet
    val after = spark.read.parquet(out).collect().map(_.toSeq).toSet
    assert(after == before)
  }

  test("compaction refuses to overwrite its own input") {
    import graft.operators.Layout
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_guard")
    val dir = s"$tmp/data"
    Tables.region(spark, sf).write.mode("overwrite").parquet(dir)
    // same dir, nested out, nested in — all three would delete the input
    // under mode("overwrite") before the lazy read ran
    for (out <- Seq(dir, s"$dir/out", tmp.toString)) {
      val e = intercept[IllegalArgumentException] {
        Layout.compact(spark, dir, out, targetRecordsPerFile = 10)
      }
      assert(e.getMessage.contains("overwrite its own input"), e.getMessage)
    }
    // sibling dir stays legal
    assert(Layout.compact(spark, dir, s"$tmp/ok",
      targetRecordsPerFile = 10) >= 1)
  }

  test("wordpiece segmentation matches an independent reference") {
    import graft.queries.Text.WpVocab
    // reference implementation, written separately from the expression
    def ref(text: String): Seq[String] = {
      val vocab = WpVocab.toSet
      text.split(" ", -1).toSeq.flatMap { word =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < word.length) {
          val l = (math.min(16, word.length - i) to 1 by -1)
            .find(n => vocab.contains(word.substring(i, i + n)))
          l match {
            case Some(n) => out += word.substring(i, i + n); i += n
            case None => out += "[UNK]"; i += 1
          }
        }
        out
      }
    }
    val got = docs.limit(100).select(col("doc_id"), col("text"),
      graft.functions.GraftFunctions
        .wordpieceTokens(col("text"), WpVocab).as("pieces"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val expected = ref(r.getString(1))
      val actual = r.getSeq[String](2)
      assert(actual == expected, s"doc ${r.getLong(0)} diverged")
      // character conservation: every non-space char is consumed exactly
      // once — known pieces by their length, [UNK] by one char each
      val chars = r.getString(1).count(_ != ' ')
      val consumed = actual.map(p => if (p == "[UNK]") 1 else p.length).sum
      assert(consumed == chars, s"doc ${r.getLong(0)}: $consumed vs $chars")
    }
    // subword counts upper-bound whitespace counts on single-space-
    // separated text (pieces never merge across spaces; an EMPTY
    // whitespace token — "a  b", trailing space — counts for tokenCount
    // but yields no piece, so the bound holds only without empty tokens,
    // which this corpus guarantees and this assert verifies)
    assert(docs.filter(col("text").contains("  ")
      || col("text").startsWith(" ") || col("text").endsWith(" "))
      .count() == 0, "corpus must be single-space separated for the bound")
    val counts = graft.queries.Text.qT18Wordpiece.fn(spark, sf)
      .select("n_pieces", "n_whitespace_tokens").collect()
    assert(counts.forall(r => r.getLong(0) >= r.getLong(1)))
  }

  test("semantic dedup refuses a degenerate one-cluster corpus") {
    // 150k near-identical vectors: every row lands in one cluster, so the
    // "intra-cluster" search would be full quadratic — the skew guard
    // must refuse and point at the exact path
    import spark.implicits._
    val emb = spark.range(150000).select(col("id").as("vec_id"),
      array((0 until 8).map(d =>
        lit(d + 1.0) + col("id").cast("double") * lit(1e-12)): _*)
        .as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticDedupPairs(emb, "vec_id", "embedding",
        threshold = 0.99)
    }
    assert(e.getMessage.contains("degenerated"), e.getMessage)
  }

  test("duplicated spans: boilerplate shows up, unique text does not") {
    import spark.implicits._
    val boiler = "please subscribe to our newsletter for updates today"
    val df = Seq(
      (1L, s"$boiler alpha beta gamma"),
      (2L, s"$boiler delta epsilon zeta"),
      (3L, "entirely original words with no shared phrasing at all"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: 11 tokens → 9 distinct trigrams, 6 inside the shared 8-token
    // boilerplate prefix appear in doc 2 as well
    assert(out(1L)._1 == 9L && out(1L)._2 == 6L)
    assert(out(2L)._2 == 6L)
    assert(out(3L)._3 == 0.0, s"unique doc flagged: ${out(3L)}")
    assert(out(1L)._3 == 6.0 / 9.0)
  }

  test("canonicalUrl: case scope, ports, tracking params, fragments, null") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val cases = Seq(
      ("  HTTP://WWW.Foo.COM:80/A/B?b=2&a=1#x  ",
        "http://www.foo.com/A/B?a=1&b=2"),   // case folds host only
      ("https://Foo.com:443", "https://foo.com/"),
      ("https://foo.com:8443/p", "https://foo.com:8443/p"), // non-default
      ("http://foo.com:443/p", "http://foo.com:443/p"),     // wrong scheme
      ("ftp://Host/PATH", "ftp://host/PATH"),
      ("http://foo.com/?utm_source=a", "http://foo.com/"),
      ("http://foo.com/p?ref=x&Key=V&utm_campaign", "http://foo.com/p?Key=V"),
      ("http://foo.com?b=2", "http://foo.com/?b=2"),
      ("not a url", null),
      ("", null))
    val got = cases.map(_._1).toDF("u")
      .select(TextAnalysis.canonicalUrl(col("u"))).as[String].collect()
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"canonicalUrl($in) = $g, want $want")
    }
  }

  test("urlHost and registeredDomain: userinfo, ports, eTLD+1, IPs") {
    import graft.operators.TextAnalysis.{registeredDomain, urlHost}
    import spark.implicits._
    val cases = Seq(
      ("https://User:Pw@A.B.Site.CO.UK:8443/x", "a.b.site.co.uk", "site.co.uk"),
      ("http://WWW.Site.COM/x", "www.site.com", "site.com"),
      ("http://site.com", "site.com", "site.com"),
      ("http://co.uk/", "co.uk", "co.uk"),           // bare suffix
      ("http://localhost:9000/", "localhost", "localhost"),
      ("http://192.168.0.1:8080/x", "192.168.0.1", "192.168.0.1"),
      ("http://a.b.c.d.site.com.au", "a.b.c.d.site.com.au", "site.com.au"),
      ("no scheme here", null, null))
    val got = cases.map(_._1).toDF("u")
      .select(urlHost(col("u")).as("h"),
        registeredDomain(urlHost(col("u"))).as("d"))
      .as[(String, String)].collect()
    cases.zip(got).foreach { case ((in, wh, wd), (gh, gd)) =>
      assert(gh == wh, s"urlHost($in) = $gh, want $wh")
      assert(gd == wd, s"registeredDomain($in) = $gd, want $wd")
    }
  }

  test("curation urlDedup stage keeps one doc per canonical URL") {
    import graft.operators.Curation
    import spark.implicits._
    // URL spellings: docs 10/11 and 12/13 are the same page twice
    // (case/port/tracking/fragment variants); doc 14 has no URL
    val urls = Map(
      10L -> "HTTP://Site.COM:80/a?b=2&a=1#x",
      11L -> "http://site.com/a?utm_source=f&a=1&b=2",
      12L -> "https://Other.ORG/p",
      13L -> "https://other.org:443/p",
      14L -> null)
    val withUrl = docs.filter(col("doc_id").isin(urls.keys.toSeq: _*))
      .withColumn("url",
        coalesce(urls.map { case (k, v) =>
          when(col("doc_id") === k, lit(v))
        }.toSeq: _*))
    val base = Curation.pipeline(withUrl, "doc_id", "text")
    val deduped = Curation.pipeline(withUrl, "doc_id", "text",
      Curation.Config(urlDedup = Some("url")))
    val baseIds = base.df.select("doc_id").as[Long].collect().toSet
    val gotIds = deduped.df.select("doc_id").as[Long].collect().toSet
    // 11 and 13 lose to their smaller-id spellings; 14 (null URL) and
    // every other survivor of the base pipeline are untouched
    assert(gotIds == baseIds -- Set(11L, 13L),
      s"urlDedup diverged: base=$baseIds got=$gotIds")
    // with a crawl-derived alias mapping (site.com/a is a redirect
    // alias of other.org/p), all four spellings collapse onto ONE
    // dedup key — min id 10 survives; matching is against the
    // canonicalUrl form, the frontier convention
    val mapping = Seq(("http://site.com/a?a=1&b=2", "https://other.org/p"))
      .toDF("alias_url", "canonical_url")
    val collapsed = Curation.pipeline(withUrl, "doc_id", "text",
      Curation.Config(urlDedup = Some("url"),
        urlCanonicalMap = Some(mapping)))
    val colIds = collapsed.df.select("doc_id").as[Long].collect().toSet
    assert(colIds == baseIds -- Set(11L, 12L, 13L),
      s"alias collapse diverged: base=$baseIds got=$colIds")
  }

  test("canonicalUrl is idempotent on the q_t40 corpus") {
    import graft.operators.TextAnalysis
    val once = graft.queries.Text.qT40UrlCanonical.fn(spark, sf)
    val twice = once.select(col("doc_id"),
      TextAnalysis.canonicalUrl(col("canon_url")).as("canon_url"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty,
      "canonical form is not a fixed point")
  }

  test("calendar trap contained before the fetch plan; legit pages survive") {
    import spark.implicits._
    import graft.operators.Outlinks
    // a calendar-trap host: 2000 near-identical date-grid URLs plus 12
    // genuine articles with letter-distinct slugs, against a clean host
    // with 30 articles. maxPerHost alone (50) would fill the trap
    // host's budget with calendar pages; per-template containment must
    // spend it on the articles first... or rather keep every article
    // AND a bounded calendar sample.
    val slugs = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val frontier = (
      (0 until 2000).map(i =>
        f"https://trap.example/events/${2020 + i / 366}/day/${i % 366}%03d") ++
        slugs.map(s => s"https://trap.example/articles/$s") ++
        (0 until 30).map(i => s"https://clean.example/post/nr$i")
      ).toDF("frontier_url")
    val contained = Outlinks.containTraps(frontier, "frontier_url",
      maxPerTemplate = 40)
    val plan = Outlinks.fetchPlan(contained, "frontier_url",
      Seq.empty[(String, String)].toDF("host", "robots"),
      "host", "robots", "bot", maxPerHost = 50)
    val byHost = plan.collect()
      .groupBy(_.getAs[String]("url_host"))
      .view.mapValues(_.map(_.getAs[String]("frontier_url")).toSet).toMap
    // trap host: all 12 articles survive; calendar capped to 40, so
    // the 50-URL host budget has room for every article (the
    // uncontained plan would have filled all 50 slots with
    // /events/2020/day/0xx — lexicographically before /articles/)
    val trap = byHost("trap.example")
    assert(slugs.forall(s => trap.contains(
      s"https://trap.example/articles/$s")),
      s"articles must survive containment+cap: $trap")
    assert(trap.count(_.contains("/events/")) == 40 - 2,
      "calendar sample bounded by the template cap minus the cross-" +
        s"template host-cap squeeze: ${trap.size}")
    assert(trap.size == 50, "host budget fully spent")
    // clean host: the single /post/nr# template is under the cap —
    // every page unconditionally survives
    assert(byHost("clean.example").size == 30)
  }

  }
