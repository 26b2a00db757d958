package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.AviCodec

/** MJPEG-AVI extraction: the RIFF walk + per-frame JPEG decode must
  * recover the closed-form structure of [[Multimodal.syntheticAvis]]
  * exactly (count, dimensions, container clock) and the solid gray level
  * within JPEG round-off; corrupted payloads must degrade to None/fewer
  * frames, never throw. */
class AviSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark

  /** media_id → AVI payload for a handful of synthetic ids. */
  private def corpus(ids: Seq[Long]): Map[Long, Array[Byte]] = {
    import spark.implicits._
    Multimodal.syntheticAvis(ids.toDF("doc_id"), "doc_id")
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])].collect().toMap
  }

  test("container metadata and frame chunks match the closed form") {
    val avis = corpus(Seq(0L, 1L, 5L, 11L, 29L, 59L))
    avis.foreach { case (mid, bytes) =>
      val m = AviCodec.parseMeta(bytes).getOrElse(
        fail(s"media $mid: parseMeta -> None"))
      assert(m.width == (48 + 16 * (mid % 3)).toInt)
      assert(m.height == (32 + 16 * (mid % 2)).toInt)
      assert(m.usPerFrame == (20 + mid % 5) * 1000L)
      assert(m.totalFrames == (2 + mid % 6).toInt)
      assert(m.streamIdx == 0)
      val cks = AviCodec.frameChunks(bytes, m)
      assert(cks.length == m.totalFrames,
        s"media $mid: ${cks.length} chunks != ${m.totalFrames}")
    }
  }

  test("decoded frames carry the source gray within JPEG round-off") {
    val avis = corpus(Seq(2L, 7L, 13L))
    avis.foreach { case (mid, bytes) =>
      val m = AviCodec.parseMeta(bytes).get
      AviCodec.frameChunks(bytes, m).zipWithIndex.foreach {
        case (ck, fi) =>
          val img = AviCodec.frameImage(bytes, ck).getOrElse(
            fail(s"media $mid frame $fi: JPEG decode -> None"))
          assert(img.getWidth == m.width && img.getHeight == m.height)
          val v = ((mid * 37 + fi * 29) % 256).toInt
          // sample corners + center: solid-gray JPEG at quality 1.0
          // survives the DCT round trip to within +-2 per channel
          for ((x, y) <- Seq((0, 0), (m.width - 1, 0),
              (0, m.height - 1), (m.width / 2, m.height / 2))) {
            val rgb = img.getRGB(x, y)
            for (c <- Seq((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF,
                rgb & 0xFF)) {
              assert(math.abs(c - v) <= 2,
                s"media $mid frame $fi ($x,$y): channel $c vs gray $v")
            }
          }
      }
    }
  }

  test("corruption fuzz: mutations never throw, only degrade") {
    val bytes = corpus(Seq(3L))(3L)
    val rnd = new scala.util.Random(42)
    var decodedSome = 0
    (0 until 300).foreach { trial =>
      val mutated = rnd.nextInt(3) match {
        case 0 => // truncate anywhere
          bytes.take(rnd.nextInt(bytes.length + 1))
        case 1 => // flip 1-8 bytes anywhere
          val b = bytes.clone()
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          b
        case _ => // splice garbage into the middle
          val at = rnd.nextInt(bytes.length)
          val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
          bytes.take(at) ++ junk ++ bytes.drop(at)
      }
      try {
        AviCodec.parseMeta(mutated).foreach { m =>
          AviCodec.frameChunks(mutated, m).foreach { ck =>
            AviCodec.frameImage(mutated, ck).foreach(_ => decodedSome += 1)
          }
        }
        AviCodec.decode(mutated, 4)
      } catch {
        case e: Throwable =>
          fail(s"trial $trial threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // most single-byte flips leave a decodable file — the fuzz must
    // actually exercise the decode path, not just reject everything
    assert(decodedSome > 0, "fuzz never reached a successful decode")
    assert(AviCodec.parseMeta(Array[Byte](1, 2, 3)).isEmpty)
    assert(AviCodec.parseMeta("RIFF1234WAVE".getBytes).isEmpty)
  }

  test("aviFrames operator: frame rows feed the image path unchanged") {
    val docs = Tables.documents(spark, GraftSpark.sf)
      .filter(col("doc_id") % 8 === 7).limit(8)
    val avis = Multimodal.syntheticAvis(docs, "doc_id")
    val frames = Multimodal.aviFrames(avis)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.media_id).foreach { case (mid, fs) =>
      assert(fs.length == (2 + mid % 6).toInt,
        s"media $mid: ${fs.length} frames")
      val ms = 20 + mid % 5
      fs.sortBy(_.frame_idx).zipWithIndex.foreach { case (f, i) =>
        assert(f.frame_idx == i && f.ts_ms == i * ms)
        assert(f.width == (48 + 16 * (mid % 3)).toInt)
        assert(f.height == (32 + 16 * (mid % 2)).toInt)
      }
    }
    // every emitted frame is a real PNG the image codec accepts
    val feats = Multimodal.extractFeatures(
      frames.toDF().select(col("media_id"), lit("image").as("kind"),
        col("frame").as("bytes"))).toDF()
    assert(feats.filter(col("width") > 0).count() == rows.length)
  }

  test("extractFeatures and sampleFrames route AVI through real decode") {
    import spark.implicits._
    val avis = Multimodal.syntheticAvis(
      Seq(8L, 9L, 10L).toDF("doc_id"), "doc_id")
    val feats = Multimodal.extractFeatures(avis).collect()
    assert(feats.length == 3)
    feats.foreach { f =>
      val mid = f.media_id
      assert(f.kind == "video")
      assert(f.width == (48 + 16 * (mid % 3)).toInt,
        s"media $mid: stub width ${f.width} — real AVI decode not taken")
      assert(f.height == (32 + 16 * (mid % 2)).toInt)
      assert(f.duration_ms == (2 + mid % 6) * (20 + mid % 5))
      // solid gray frames -> per-band luma near the frame grays
      assert(f.features.forall(v => v >= 0f && v <= 1f))
    }
    // sampleFrames: one sample per cadence tick, decoded from the
    // nearest preceding container frame
    val sampled = Multimodal.sampleFrames(avis, everyMs = 21L).collect()
    assert(sampled.nonEmpty)
    sampled.foreach { s =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(s.frame))
      assert(img != null && img.getWidth == (48 + 16 * (s.media_id % 3)))
    }
  }
}
