package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark.spark
import graft.operators.Multimodal

/** Audio curation stats and video scene-change semantics on constructed
  * payloads with known answers (the certified queries pin the synthetic
  * corpus; these pin the operators' meaning).
  */
class SceneSpec extends AnyFunSuite {

  /** Hand-built Y4M: `scenes` blocks of `perScene` constant-luma frames
    * each, 4×4 C420. */
  private def twoSceneY4m(lumas: Seq[Int], perScene: Int): Array[Byte] = {
    val w = 4; val h = 4
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F10:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
    lumas.foreach { luma =>
      (0 until perScene).foreach { _ =>
        bos.write("FRAME\n".getBytes("US-ASCII"))
        (0 until w * h).foreach(_ => bos.write(luma))
        (0 until 2 * (w / 2) * (h / 2)).foreach(_ => bos.write(128))
      }
    }
    bos.toByteArray
  }

  test("a planted hard cut is the only frame flagged, at its exact size") {
    import spark.implicits._
    val clip = twoSceneY4m(Seq(16, 200), perScene = 3)
    val media = Seq((7L, "video", clip)).toDF("media_id", "kind", "bytes")
    val got = Multimodal.videoSceneChanges(media, threshold = 32.0)
      .orderBy("frame_idx").collect()
    // 6 frames -> 5 consecutive pairs
    assert(got.length == 5)
    val cuts = got.filter(_.getBoolean(3))
    assert(cuts.length == 1)
    assert(cuts(0).getInt(1) == 3) // first frame of scene 2
    assert(cuts(0).getDouble(2) == 184.0) // |200 - 16| on every pixel
    got.filterNot(_.getBoolean(3)).foreach(r => assert(r.getDouble(2) == 0.0))
  }

  test("static clips produce no cuts; undecodable payloads drop") {
    import spark.implicits._
    val media = Seq(
      (1L, "video", twoSceneY4m(Seq(99), perScene = 4)),
      (2L, "video", "not a video".getBytes("UTF-8"))
    ).toDF("media_id", "kind", "bytes")
    val got = Multimodal.videoSceneChanges(media).collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L))
    assert(got.forall(!_.getBoolean(3)))
  }

  test("audio stats recover the square wave's closed forms") {
    import spark.implicits._
    val ids = Seq(9L, 17L).toDF("doc_id")
    val got = Multimodal.audioStatsOf(
      Multimodal.syntheticAudio(ids, "doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getInt(2), r.getDouble(3), r.getLong(4))).toMap
    Seq(9L, 17L).foreach { id =>
      val amp = 1000 + (id % 7) * 4000
      val frames = 800 + (id % 32) * 80
      val (rms, peak, sil, zc) = got(id)
      assert(rms == amp.toDouble) // every sample is ±amp
      assert(peak == amp.toInt)
      assert(sil == 0.0)
      assert(zc == (frames - 1) / 100)
    }
  }

  test("silence ratio and crossings on a half-silent buffer") {
    // 400 silent samples then 400 at full amplitude: silence 0.5, no
    // sign changes (0 -> +amp is not a crossing under the strict
    // prev*cur < 0 rule)
    val frames = 800
    val pcm = new Array[Byte](frames * 2)
    (400 until frames).foreach { i =>
      pcm(2 * i) = (20000 & 0xFF).toByte
      pcm(2 * i + 1) = ((20000 >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val Some((rms, peak, sil, zc)) = Multimodal.audioStats(bos.toByteArray)
    assert(peak == 20000)
    assert(sil == 0.5)
    assert(zc == 0L)
    assert(math.abs(rms - 20000.0 / math.sqrt(2.0)) < 1e-9)
  }
}
