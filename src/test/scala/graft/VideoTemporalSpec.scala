package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The temporal majority-vote video fingerprint: exact frame-reorder
  * invariance (the q_m29 contract), the measured first-frame-hash
  * separation that motivates it, content sensitivity, vote semantics on
  * a hand-built clip, and drop semantics. */
class VideoTemporalSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private def clip(c: Long, reverse: Int): Array[Byte] = {
    import spark.implicits._
    Multimodal.syntheticReorderedVideos(
      Seq((c, c, reverse)).toDF("media_id", "content_id", "reverse"))
      .collect().head.getAs[Array[Byte]]("bytes")
  }

  test("temporal hash is exactly invariant to frame reversal; first-frame hash is not") {
    for (c <- 0L until 8L) {
      val a = clip(c, 0)
      val b = clip(c, 1)
      val ta = Multimodal.videoTemporalDHash(a).get
      val tb = Multimodal.videoTemporalDHash(b).get
      assert(ta == tb, s"content $c: reversal moved the temporal hash")
      val da = Multimodal.videoDHash(a).get
      val db = Multimodal.videoDHash(b).get
      assert(java.lang.Long.bitCount(da ^ db) > 7,
        s"content $c: expected the first-frame hash to move far, " +
          s"got ${java.lang.Long.bitCount(da ^ db)}")
    }
  }

  test("distinct contents land far apart") {
    val hs = (0L until 10L).map(c => Multimodal.videoTemporalDHash(clip(c, 0)).get)
    for (i <- hs.indices; j <- hs.indices if i < j) {
      val d = java.lang.Long.bitCount(hs(i) ^ hs(j))
      assert(d > 7, s"contents $i/$j too close: hamming $d")
    }
  }

  test("majority vote follows the dominant frame on a hand-built clip") {
    // 5 frames: 4 copies of scene S + 1 inverted outlier — the vote must
    // equal the per-frame dHash of S exactly, in any frame order
    def y4m(frameLumas: Seq[(Int, Int) => Int], w: Int, h: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(s"YUV4MPEG2 W$w H$h F10:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
      frameLumas.foreach { lum =>
        bos.write("FRAME\n".getBytes("US-ASCII"))
        for (y <- 0 until h; x <- 0 until w) bos.write(lum(x, y) & 0xFF)
        for (_ <- 0 until 2 * ((w / 2) * (h / 2))) bos.write(128)
      }
      bos.toByteArray
    }
    val scene = (x: Int, y: Int) => 40 + ((x * 37 + y * 91) % 150)
    val outlier = (x: Int, y: Int) => 255 - scene(x, y)
    val w = 16
    val h = 12
    val sceneHash = {
      // single-frame clip: the temporal hash IS the frame dHash
      Multimodal.videoTemporalDHash(y4m(Seq(scene), w, h)).get
    }
    for (order <- Seq(
        Seq(outlier, scene, scene, scene, scene),
        Seq(scene, scene, outlier, scene, scene),
        Seq(scene, scene, scene, scene, outlier))) {
      assert(Multimodal.videoTemporalDHash(y4m(order, w, h)).get == sceneHash,
        "vote did not follow the dominant frame")
    }
  }

  test("videoTemporalDHashes drops undecodable payloads") {
    import spark.implicits._
    val junk = Seq(
      (1L, "video", Array.fill[Byte](48)(0x13)),
      (2L, "video", clip(3L, 0)))
      .toDF("media_id", "kind", "bytes")
    val got = Multimodal.videoTemporalDHashes(junk).select("media_id")
      .as[Long].collect().toSet
    assert(got == Set(2L))
  }
}
