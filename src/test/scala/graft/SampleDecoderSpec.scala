package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, SampleDecoder, SampleDecoders, SampleRef}

/** Deterministic fake decoder for the spec: claims MP4/WebM and renders a
  * 16×16 gradient keyed off the sample's byte range — distinguishable
  * from the 8×8 stub frames and reproducible for reference votes. */
class FakeSampleDecoder extends SampleDecoder {
  override def claims(container: String): Boolean =
    container == "mp4" || container == "webm"
  override def decodeSample(payload: Array[Byte], ref: SampleRef)
      : Option[java.awt.image.BufferedImage] =
    Some(FakeSampleDecoder.render(payload, ref))
}

object FakeSampleDecoder {
  def render(payload: Array[Byte], ref: SampleRef)
      : java.awt.image.BufferedImage = {
    var h = 1469598103934665603L
    var i = ref.offset.toInt
    val end = math.min(payload.length.toLong, ref.offset + ref.size).toInt
    while (i < end) { h ^= (payload(i) & 0xffL); h *= 1099511628211L; i += 1 }
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val v = Math.floorMod(h + x * 37 + y * 101, 256L).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | ((x * 16) & 0xff))
        x += 1
      }
      y += 1
    }
    img
  }
}

/** Registered via the test-resources META-INF/services entry — proves the
  * production ServiceLoader wiring end to end. Claims a container no
  * walker ever produces, so it cannot perturb other suites. */
class ServiceLoadedDecoder extends SampleDecoder {
  override def claims(container: String): Boolean = container == "svc-test"
  override def decodeSample(payload: Array[Byte], ref: SampleRef)
      : Option[java.awt.image.BufferedImage] = None
}

/** Fake MP3 codec for the AUDIO seam: constant PCM per media (value
  * derived from the first frame header byte), so expected band-RMS
  * features are exact in closed form. */
class FakeMp3Decoder extends graft.operators.AudioSampleDecoder {
  override def claims(container: String): Boolean = container == "mp3"
  override def decodeFrame(payload: Array[Byte], ref: SampleRef)
      : Option[Array[Short]] = {
    val v = (500 + 100 * (payload(ref.offset.toInt + 2) & 0x0f)).toShort
    Some(Array.fill(1152 * 2)(v)) // stereo interleaved, constant value
  }
}

/** The compressed-sample decoder seam: fake decoders slot into the
  * existing frame/fingerprint paths with unchanged plans; the labeled
  * stub is reachable only when no registered decoder claims the
  * container; MJPEG-AVI routes through the seam as the first real
  * implementation; ServiceLoader discovery works. */
class SampleDecoderSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private def mp4s = {
    import spark.implicits._
    Multimodal.syntheticMp4s(Seq(3L, 7L, 11L).toDF("doc_id"), "doc_id")
  }

  private def frameDims(png: Array[Byte]): (Int, Int) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    (img.getWidth, img.getHeight)
  }

  test("registered decoder replaces the stub; unregistering restores it") {
    val dec = new FakeSampleDecoder
    // without a claiming decoder: MP4 sampling falls to the 8x8 stub
    val before = Multimodal.sampleFrames(mp4s, everyMs = 500L).collect()
    assert(before.nonEmpty)
    assert(before.forall(f => frameDims(f.frame) == ((8, 8))),
      "stub must serve MP4 frames while no decoder claims the container")
    SampleDecoders.register(dec)
    try {
      val after = Multimodal.sampleFrames(mp4s, everyMs = 500L).collect()
      assert(after.nonEmpty)
      assert(after.forall(f => frameDims(f.frame) == ((16, 16))),
        "every sampled frame must come from the registered decoder")
      // frames are the decoder's actual output for the nearest-preceding
      // sample: re-render the reference from the sample table
      val payloads = mp4s.select("media_id", "bytes").collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
      after.foreach { f =>
        val bytes = payloads(f.media_id)
        val Some((container, refs)) = Multimodal.containerSampleRefs(bytes)
        assert(container == "mp4")
        val ref = refs.takeWhile(_.tsMs <= f.ts_ms)
          .lastOption.getOrElse(refs.head)
        val want = FakeSampleDecoder.render(bytes, ref)
        val got = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(f.frame))
        val same = (0 until 16).forall(y => (0 until 16).forall(x =>
          (got.getRGB(x, y) & 0xffffff) == (want.getRGB(x, y) & 0xffffff)))
        assert(same, s"media ${f.media_id} frame ${f.frame_idx} is not " +
          "the decoder's output for the nearest-preceding sample")
      }
    } finally SampleDecoders.unregister(dec)
    // seam closed again: stub frames return
    val reset = Multimodal.sampleFrames(mp4s, everyMs = 500L).collect()
    assert(reset.forall(f => frameDims(f.frame) == ((8, 8))))
  }

  test("temporal fingerprint votes over decoder-provided frames; plan unchanged") {
    val dec = new FakeSampleDecoder
    val planOf = (df: org.apache.spark.sql.DataFrame) =>
      df.queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "#")
        .replaceAll("@[0-9a-f]+", "@")       // closure identity hashes
        .replaceAll("plan_id=\\d+", "plan_id=")
    val planBefore = planOf(Multimodal.videoTemporalDHashes(mp4s))
    assert(Multimodal.videoTemporalDHashes(mp4s).count() == 0,
      "no decoder claims mp4 yet — no fingerprints")
    SampleDecoders.register(dec)
    try {
      val df = Multimodal.videoTemporalDHashes(mp4s)
      assert(planOf(df) == planBefore,
        "registering a decoder must not change the plan")
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val payloads = mp4s.select("media_id", "bytes").collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
      assert(got.keySet == payloads.map(_._1).toSet)
      // reference: per-sample fake frames -> PNG -> certified image dHash
      // kernel -> strict majority vote
      payloads.foreach { case (mid, bytes) =>
        val Some((_, refs)) = Multimodal.containerSampleRefs(bytes)
        val hashes = refs.map { r =>
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(
            FakeSampleDecoder.render(bytes, r), "png", bos)
          Multimodal.imageDHash(bos.toByteArray).get
        }
        val counts = Array.fill(64)(0)
        hashes.foreach(h => (0 until 64).foreach(b =>
          if (((h >> b) & 1L) == 1L) counts(b) += 1))
        var want = 0L
        (0 until 64).foreach(b =>
          if (2 * counts(b) > hashes.length) want |= 1L << b)
        assert(got(mid) == want, s"media $mid temporal vote diverged")
      }
      // first-frame perceptual hash rides the same seam
      payloads.foreach { case (mid, bytes) =>
        val Some((_, refs)) = Multimodal.containerSampleRefs(bytes)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(
          FakeSampleDecoder.render(bytes, refs.head), "png", bos)
        assert(Multimodal.videoDHash(bytes, Seq(dec)) ==
          Multimodal.imageDHash(bos.toByteArray))
      }
    } finally SampleDecoders.unregister(dec)
  }

  test("MJPEG-AVI is the seam's first real implementation") {
    import spark.implicits._
    assert(SampleDecoders.snapshot().contains(SampleDecoders.MjpegAvi))
    val avis = Multimodal.syntheticAvis(Seq(8L, 9L).toDF("doc_id"), "doc_id")
      .select("media_id", "bytes").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
    avis.foreach { case (mid, bytes) =>
      val Some((container, refs)) = Multimodal.containerSampleRefs(bytes)
      assert(container == "avi" && refs.nonEmpty)
      val img = SampleDecoders.MjpegAvi.decodeSample(bytes, refs.head)
      assert(img.isDefined, s"media $mid: MJPEG sample did not decode")
      assert(img.get.getWidth == (48 + 16 * (mid % 3)).toInt)
    }
  }

  test("ServiceLoader discovers provider-jar implementations") {
    val svc = SampleDecoders.snapshot().filter(_.claims("svc-test"))
    assert(svc.nonEmpty,
      "META-INF/services entry should register ServiceLoadedDecoder")
    assert(svc.head.getClass.getSimpleName == "ServiceLoadedDecoder")
  }

  test("audio seam: a registered MP3 codec lights up real PCM features") {
    import spark.implicits._
    import graft.operators.AudioSampleDecoders
    val mp3s = Multimodal.syntheticMp3s(
      Seq(5L, 13L, 21L).toDF("doc_id"), "doc_id")
    val payloads = mp3s.select("media_id", "bytes").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    def features() = Multimodal.extractFeatures(mp3s).collect()
      .map(f => f.media_id -> f).toMap
    // without a claiming codec: REAL duration from the frame walk, stub
    // features (MP3 Huffman synthesis needs a codec)
    val before = features()
    payloads.foreach { case (mid, bytes) =>
      val sr = Array(44100, 48000, 32000)((mid % 3).toInt)
      val frames = 20 + (mid % 40).toInt
      assert(before(mid).duration_ms == frames * 1152L * 1000L / sr)
      val stub = Multimodal.StubDecoder.decode("audio", bytes, 8)._4
      assert(before(mid).features.sameElements(stub),
        s"media $mid should carry stub features while nothing claims mp3")
    }
    val dec = new FakeMp3Decoder
    AudioSampleDecoders.register(dec)
    try {
      val after = features()
      payloads.foreach { case (mid, bytes) =>
        val sr = Array(44100, 48000, 32000)((mid % 3).toInt)
        val frames = 20 + (mid % 40).toInt
        // duration now comes from the DECODED sample count (equal here)
        assert(after(mid).duration_ms == frames * 1152L * 1000L / sr)
        // constant PCM value v ⇒ every band's RMS is exactly v/32768
        val v = 500 + 100 * (bytes(2) & 0x0f)
        val want = (v / 32768.0).toFloat
        assert(after(mid).features.forall(_ == want),
          s"media $mid: expected all bands $want, got " +
            after(mid).features.toSeq)
      }
    } finally AudioSampleDecoders.unregister(dec)
    // seam closed: stub features return
    val reset = features()
    payloads.foreach { case (mid, bytes) =>
      assert(reset(mid).features.sameElements(
        Multimodal.StubDecoder.decode("audio", bytes, 8)._4))
    }
  }

  test("truncated MP3: no ref may extend past the payload") {
    import spark.implicits._
    val full = Multimodal.syntheticMp3s(Seq(6L).toDF("doc_id"), "doc_id")
      .select("bytes").collect()(0).getAs[Array[Byte]](0)
    // cut mid-frame: the final header still parses but its sized frame
    // runs past EOF — the seam contract forbids emitting that ref
    val cut = full.take(full.length - 50)
    val (_, _, refs) = graft.operators.Multimodal.Mp3Probe
      .frameTable(cut).get
    assert(refs.nonEmpty)
    refs.foreach(r => assert(r.offset + r.size <= cut.length,
      s"ref $r extends past the ${cut.length}-byte payload"))
    // and a registered decoder slicing [offset, offset+size) cannot throw
    refs.foreach(r => cut.slice(r.offset.toInt, (r.offset + r.size).toInt))
  }

  test("mp3FrameTable is a zero-shuffle narrow map") {
    import spark.implicits._
    val mp3s = Multimodal.syntheticMp3s(
      Tables.documents(spark, GraftSpark.sf)
        .filter(col("doc_id") % 64 === 5), "doc_id")
    val df = Multimodal.mp3FrameTable(mp3s)
    val plan = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the synthetic builder's ONE
    // narrow-id round-robin spread (r21 encode parallelization); the
    // walk itself must not shuffle — pin the exact count so a payload
    // round-robin shuffle sneaking in would fail, not just hash/range
    assert("(?i)Exchange roundrobinpartitioning".r
        .findAllMatchIn(plan).size == 1,
      s"exactly one builder round-robin spread expected:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning")
        && !plan.contains("Exchange rangepartitioning")
        && !plan.contains("Exchange SinglePartition"),
      "the frame walk must stay a narrow map")
    assert(df.count() > 0)
  }

  test("webm blocks route through the seam too") {
    import spark.implicits._
    val dec = new FakeSampleDecoder
    val webms = Multimodal.syntheticWebms(Seq(4L).toDF("doc_id"), "doc_id")
    SampleDecoders.register(dec)
    try {
      val frames = Multimodal.sampleFrames(webms, everyMs = 100L).collect()
      assert(frames.nonEmpty)
      assert(frames.forall(f => frameDims(f.frame) == ((16, 16))))
    } finally SampleDecoders.unregister(dec)
  }
}
