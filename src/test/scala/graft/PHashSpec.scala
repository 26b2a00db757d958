package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The folded-DCT perceptual hash: exact reflection/rotation-180
  * invariance (the q_m28 contract), exact contrast-halving invariance,
  * brightness robustness, content sensitivity, and the measured dHash
  * separation that motivates the operator. */
class PHashSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private def mirrorPng(c: Long, mirror: Int): Array[Byte] = {
    import spark.implicits._
    Multimodal.syntheticMirrorImages(
      Seq((c, c, mirror)).toDF("media_id", "content_id", "mirror"))
      .collect().head.getAs[Array[Byte]]("bytes")
  }

  private def grayPng(vals: Int => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val v = vals(y * 32 + x) & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  test("pHash is exactly invariant under mirror, flip, and 180-degree rotation") {
    for (c <- Seq(0L, 3L, 17L, 42L, 99L)) {
      val base = Multimodal.imagePHash(mirrorPng(c, 0))
        .getOrElse(fail(s"content $c did not hash"))
      for (m <- 1 to 3) {
        assert(Multimodal.imagePHash(mirrorPng(c, m)).get == base,
          s"content $c: mirror code $m changed the pHash")
      }
    }
  }

  test("mirroring moves the dHash far outside the near-dup band") {
    val dists = (0L until 8L).map { c =>
      val a = Multimodal.imageDHash(mirrorPng(c, 0)).get
      val b = Multimodal.imageDHash(mirrorPng(c, 1)).get
      java.lang.Long.bitCount(a ^ b)
    }
    assert(dists.forall(_ > 7),
      s"expected every mirror to move the dHash beyond the <=7 screen: $dists")
  }

  test("distinct contents land far apart") {
    val hs = (0L until 12L).map(c => Multimodal.imagePHash(mirrorPng(c, 0)).get)
    for (i <- hs.indices; j <- hs.indices if i < j) {
      val d = java.lang.Long.bitCount(hs(i) ^ hs(j))
      assert(d > 7, s"contents $i/$j too close: hamming $d")
    }
  }

  test("contrast halving on even gray levels is exactly hash-preserving") {
    // even pixel values make the halved image integral, and halving is
    // exact in floating point at every step of the folded DCT
    val vals = Array.tabulate(1024)(i => 2 * (40 + (mix(i).toInt & 63)))
    val a = Multimodal.imagePHash(grayPng(vals)).get
    val b = Multimodal.imagePHash(grayPng(i => vals(i) / 2)).get
    assert(a == b, "contrast-halved twin moved the pHash")
  }

  test("brightness shift moves at most a couple of near-median bits") {
    // +30 on [40,168]-range gray: mathematically DC-only; floating-point
    // re-rounding can graze bits whose |AC| sits at the median
    val vals = Array.tabulate(1024)(i => 40 + (mix(i ^ 0x5DEECE66DL).toInt & 127))
    val a = Multimodal.imagePHash(grayPng(vals)).get
    val b = Multimodal.imagePHash(grayPng(i => vals(i) + 30)).get
    assert(java.lang.Long.bitCount(a ^ b) <= 2,
      s"brightness shift moved ${java.lang.Long.bitCount(a ^ b)} bits")
  }

  test("imagePHashes drops undecodable payloads") {
    import spark.implicits._
    val junk = Seq(
      (1L, "image", Array.fill[Byte](32)(0x42)),
      (2L, "image", mirrorPng(7L, 0)))
      .toDF("media_id", "kind", "bytes")
    val got = Multimodal.imagePHashes(junk).select("media_id")
      .as[Long].collect().toSet
    assert(got == Set(2L))
  }
}
