package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.GifCodec

/** Animated-GIF extraction: seeded fuzz over logical-screen sizes,
  * partial-rect frames at offsets, disposal methods, and delays — the
  * composited canvases [[GifCodec.frames]] emits must match an
  * independent reference compositing model pixel-for-pixel (solid-color
  * frames survive GIF palettes exactly, so equality is exact). */
class GifSpec extends AnyFunSuite {

  /** (left, top, w, h, rgb, delayCs, disposal) */
  private type FrameSpec = (Int, Int, Int, Int, Int, Int, String)

  private def writeGif(frames: Seq[FrameSpec]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { case (left, top, w, h, rgb, delayCs, disposal) =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(rgb))
        g.fillRect(0, 0, w, h)
        g.dispose()
        val meta = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), null)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        var n = tree.getFirstChild
        while (n != null && n.getNodeName != "ImageDescriptor")
          n = n.getNextSibling
        val desc = n.asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        desc.setAttribute("imageLeftPosition", left.toString)
        desc.setAttribute("imageTopPosition", top.toString)
        val gce = new javax.imageio.metadata.IIOMetadataNode(
          "GraphicControlExtension")
        gce.setAttribute("disposalMethod", disposal)
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", delayCs.toString)
        gce.setAttribute("transparentColorIndex", "0")
        tree.appendChild(gce)
        meta.setFromTree(fmt, tree)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Reference model: composite the frame specs exactly as documented
    * on [[GifCodec.frames]]. Returns per-frame (tsMs, delayMs, canvas). */
  private def reference(sw: Int, sh: Int, frames: Seq[FrameSpec])
      : Seq[(Long, Long, Array[Array[Int]])] = {
    val canvas = Array.fill(sh, sw)(0x000000)
    var ts = 0L
    frames.map { case (left, top, w, h, rgb, delayCs, disposal) =>
      for (y <- top until math.min(top + h, sh);
           x <- left until math.min(left + w, sw)) canvas(y)(x) = rgb
      val snap = canvas.map(_.clone())
      val out = (ts, delayCs.toLong * 10L, snap)
      ts += delayCs.toLong * 10L
      if (disposal == "restoreToBackgroundColor") {
        for (y <- top until math.min(top + h, sh);
             x <- left until math.min(left + w, sw)) canvas(y)(x) = 0x000000
      }
      out
    }
  }

  test("fuzz: composited frames match the reference model bit-for-bit") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 60) {
      val sw = 8 + rnd.nextInt(17)
      val sh = 8 + rnd.nextInt(13)
      val nFrames = 1 + rnd.nextInt(7)
      val specs: Seq[FrameSpec] = (0 until nFrames).map { i =>
        // frame 0 is full-screen (pins the logical screen size); later
        // frames are random partial rects — the animated-GIF norm
        val (l, t, w, h) =
          if (i == 0) (0, 0, sw, sh)
          else {
            val l = rnd.nextInt(sw); val t = rnd.nextInt(sh)
            (l, t, 1 + rnd.nextInt(sw - l), 1 + rnd.nextInt(sh - t))
          }
        val rgb = rnd.nextInt(0x1000000)
        val disposal = rnd.nextInt(3) match {
          case 0 => "none"
          case 1 => "doNotDispose"
          case _ => "restoreToBackgroundColor"
        }
        (l, t, w, h, rgb, rnd.nextInt(11), disposal)
      }
      val bytes = writeGif(specs)
      val got = GifCodec.frames(bytes)
        .getOrElse(fail(s"trial $trial: decode returned None"))
      val want = reference(sw, sh, specs)
      assert(got.length == want.length,
        s"trial $trial: ${got.length} frames, expected ${want.length}")
      got.zip(want).foreach { case (f, (ts, delay, px)) =>
        assert(f.tsMs == ts && f.delayMs == delay,
          s"trial $trial frame ${f.idx}: ts ${f.tsMs}/${f.delayMs} " +
            s"!= $ts/$delay")
        assert(f.image.getWidth == sw && f.image.getHeight == sh,
          s"trial $trial frame ${f.idx}: ${f.image.getWidth}×" +
            s"${f.image.getHeight} != $sw×$sh")
        for (y <- 0 until sh; x <- 0 until sw)
          assert((f.image.getRGB(x, y) & 0xFFFFFF) == px(y)(x),
            s"trial $trial frame ${f.idx} pixel ($x,$y): " +
              f"${f.image.getRGB(x, y) & 0xFFFFFF}%06x != ${px(y)(x)}%06x")
      }
    }
  }

  test("a later frame larger than the declared screen grows the canvas") {
    // frame 0 pins the logical screen at 4×4; frame 1 extends to (2+8,
    // 2+6) — the composite canvas must grow to 10×8, not clip frame 1
    val specs: Seq[FrameSpec] = Seq(
      (0, 0, 4, 4, 0x112233, 2, "none"),
      (2, 2, 8, 6, 0x445566, 3, "none"))
    val got = GifCodec.frames(writeGif(specs))
      .getOrElse(fail("decode returned None"))
    assert(got.length == 2)
    got.foreach { f =>
      assert(f.image.getWidth == 10 && f.image.getHeight == 8,
        s"frame ${f.idx}: ${f.image.getWidth}×${f.image.getHeight}")
    }
    // frame 1's far corner must carry its color, not clipped black
    assert((got(1).image.getRGB(9, 7) & 0xFFFFFF) == 0x445566)
    // and frame 0's painted region survives underneath
    assert((got(1).image.getRGB(0, 0) & 0xFFFFFF) == 0x112233)
  }

  test("maxFrames bounds runaway payloads; non-GIF bytes decode to None") {
    val specs: Seq[FrameSpec] = (0 until 10).map { i =>
      (0, 0, 8, 8, i * 0x010203, 2, "none")
    }
    val bytes = writeGif(specs)
    assert(GifCodec.frames(bytes, maxFrames = 3).get.length == 3)
    assert(GifCodec.frames(Array[Byte](1, 2, 3)).isEmpty)
    assert(GifCodec.frames("GIF89a".getBytes ++ Array[Byte](0)).isEmpty)
  }

  test("gifFrames operator: frame rows feed the image path unchanged") {
    val spark = GraftSpark.spark
    val docs = Tables.documents(spark, GraftSpark.sf)
      .filter(col("doc_id") % 16 === 4).limit(8)
    val gifs = Multimodal.syntheticGifs(docs, "doc_id")
    val frames = Multimodal.gifFrames(gifs)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.media_id).foreach { case (mid, fs) =>
      assert(fs.length == (2 + mid % 6).toInt,
        s"media $mid: ${fs.length} frames")
      // cumulative timestamps at the closed-form delay
      val d = (4 + mid % 3) * 10L
      fs.sortBy(_.frame_idx).zipWithIndex.foreach { case (f, i) =>
        assert(f.frame_idx == i && f.ts_ms == i * d && f.delay_ms == d)
      }
    }
    // every emitted frame is a real PNG the image codec accepts
    val feats = Multimodal.extractFeatures(
      frames.toDF().select(col("media_id"), lit("image").as("kind"),
        col("frame").as("bytes"))).toDF()
    assert(feats.filter(col("width") > 0).count() == rows.length)
  }
}
