package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.FlacCodec

/** The pure-JVM FLAC sample decoder: exact round-trips on the synthetic
  * CONSTANT-frame corpus, a hand-built VERBATIM frame, CRC rejection of
  * corrupted payloads, and transparent consumption by the audio stats /
  * feature paths. */
class FlacDecodeSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private def flacOf(mid: Long): Array[Byte] = {
    import spark.implicits._
    Multimodal.syntheticFlacs(Seq(mid).toDF("id"), "id")
      .collect().head.getAs[Array[Byte]]("bytes")
  }

  test("constant-frame round trip recovers exact samples") {
    for (mid <- Seq(0L, 1L, 7L, 31L, 36L)) {
      val bytes = flacOf(mid)
      val (sr, channels, ss) = FlacCodec.decodeSamples(bytes)
        .getOrElse(fail(s"media $mid did not decode"))
      val total = 8000L + (mid % 32) * 1600L
      assert(channels == 1 + (mid % 2).toInt)
      assert(ss.length == total * channels)
      assert(sr == Array(8000, 16000, 22050, 44100, 48000)((mid % 5).toInt))
      var i = 0L
      while (i < total) {
        val f = (i / 4096L).toInt
        var ch = 0
        while (ch < channels) {
          val got = ss((i * channels + ch).toInt)
          val want = Multimodal.flacAmp(mid, f, ch)
          assert(got == want, s"media $mid sample $i ch $ch: $got != $want")
          ch += 1
        }
        i += 1
      }
    }
  }

  test("corruption anywhere is rejected by a CRC, never decoded as audio") {
    val bytes = flacOf(3L)
    // flip one bit in the first frame's subframe payload (after the
    // 42-byte metadata prologue + 6-byte frame header)
    val corrupt = bytes.clone()
    corrupt(60) = (corrupt(60) ^ 0x10).toByte
    assert(FlacCodec.decodeSamples(corrupt).isEmpty,
      "bit-flipped frame must fail its CRC-16")
    val badHeader = bytes.clone()
    badHeader(46) = (badHeader(46) ^ 0x01).toByte // frame number byte
    assert(FlacCodec.decodeSamples(badHeader).isEmpty,
      "bit-flipped header must fail its CRC-8")
    assert(FlacCodec.decodeSamples("fLaC123".getBytes).isEmpty)
    assert(FlacCodec.decodeSamples(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("fuzz: random single-bit corruption never yields wrong samples") {
    // flip one random bit anywhere in the payload: the decode must
    // either fail a CRC/structure check (None) or — when the flip lands
    // in ignored bytes (e.g. STREAMINFO's md5/frame-size fields) —
    // still produce the EXACT original samples. Wrong samples are the
    // one outcome the CRCs exist to forbid.
    val rnd = new scala.util.Random(20260813L)
    val bytes = flacOf(5L)
    val truth = FlacCodec.decodeSamples(bytes).get._3
    var rejected = 0
    for (_ <- 0 until 200) {
      val corrupt = bytes.clone()
      val pos = rnd.nextInt(bytes.length)
      corrupt(pos) = (corrupt(pos) ^ (1 << rnd.nextInt(8))).toByte
      FlacCodec.decodeSamples(corrupt) match {
        case None => rejected += 1
        case Some((_, _, ss)) =>
          assert(ss.sameElements(truth),
            s"bit flip at byte $pos decoded to DIFFERENT samples")
      }
    }
    assert(rejected > 100,
      s"only $rejected/200 flips rejected — CRC coverage suspiciously low")
  }

  test("hand-built VERBATIM frame decodes sample-for-sample") {
    // mono, 8000 Hz, 192 samples (blocksize code 0001 — no extra bytes),
    // one VERBATIM subframe carrying a ramp
    val total = 192
    val bos = new java.io.ByteArrayOutputStream()
    val b = java.nio.ByteBuffer.allocate(42)
    b.put("fLaC".getBytes("US-ASCII"))
    b.put(0x80.toByte); b.put(0.toByte); b.put(0.toByte); b.put(34.toByte)
    b.putShort(192.toShort); b.putShort(192.toShort)
    (0 until 6).foreach(_ => b.put(0.toByte))
    val sr = 8000
    b.put(((sr >> 12) & 0xff).toByte)
    b.put(((sr >> 4) & 0xff).toByte)
    b.put((((sr & 0xf) << 4) | (0 << 1) | 0).toByte) // mono, bps-1 top bit 0
    b.put(((15 << 4) | 0).toByte)                    // bps-1 low = 15
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
    b.put(total.toByte)
    bos.write(b.array())
    val frame = new java.io.ByteArrayOutputStream()
    frame.write(0xff); frame.write(0xf8)
    frame.write(0x10) // blocksize code 0001 (192), sr from STREAMINFO
    frame.write((0 << 4) | (0x4 << 1))
    frame.write(0)
    val hdr = frame.toByteArray
    frame.write(FlacCodec.crc8(hdr, 0, hdr.length))
    frame.write(0x02) // VERBATIM subframe header
    val samples = Array.tabulate(total)(i => (i * 137 - 12000).toShort)
    samples.foreach { s => frame.write((s >> 8) & 0xff); frame.write(s & 0xff) }
    val body = frame.toByteArray
    val crc = FlacCodec.crc16(body, 0, body.length)
    frame.write((crc >> 8) & 0xff); frame.write(crc & 0xff)
    bos.write(frame.toByteArray)
    val (gotSr, ch, ss) = FlacCodec.decodeSamples(bos.toByteArray)
      .getOrElse(fail("verbatim frame did not decode"))
    assert(gotSr == 8000 && ch == 1)
    assert(ss.sameElements(samples))
  }

  private def compressedFlacOf(mid: Long): Array[Byte] = {
    import spark.implicits._
    Multimodal.syntheticFlacsCompressed(Seq(mid).toDF("id"), "id")
      .collect().head.getAs[Array[Byte]]("bytes")
  }

  test("compressed corpus round-trips sample-exact (FIXED/LPC/Rice)") {
    // mids chosen to cover: mono + stereo (parity), every FIXED order
    // 0-4 and LPC order 1-8 (frames cycle), Rice partition orders 0-2,
    // the raw-bits escape partition ((fi+ch)%7==3), all three stereo
    // decorrelation modes (stereo frames rotate ind→LS→RS→MS), and
    // tail blocks (mid%3∈{1,2} adds a 2048/4096 partial frame)
    for (mid <- 0L to 11L) {
      val bytes = compressedFlacOf(mid)
      val channels = 1 + (mid % 2).toInt
      val total = 4096L * (1 + mid % 4) + 2048L * (mid % 3)
      val (sr, ch, ss) = Multimodal.FlacCodec.decodeSamples(bytes)
        .getOrElse(fail(s"media $mid did not decode"))
      assert(ch == channels)
      assert(sr == Array(8000, 16000, 22050, 44100, 48000)((mid % 5).toInt))
      assert(ss.length == total * channels)
      var i = 0L
      while (i < total) {
        val fi = (i / 4096L).toInt
        val off = (i % 4096L).toInt
        var c = 0
        while (c < channels) {
          val got = ss((i * channels + c).toInt)
          val want = Multimodal.flacWave(mid, c, fi, off)
          assert(got == want,
            s"media $mid frame $fi sample $off ch $c: $got != $want")
          c += 1
        }
        i += 1
      }
    }
  }

  test("fuzz: bit corruption of compressed payloads never yields wrong samples") {
    val rnd = new scala.util.Random(20260814L)
    for (mid <- Seq(3L, 4L)) {
      val bytes = compressedFlacOf(mid)
      val truth = Multimodal.FlacCodec.decodeSamples(bytes).get._3
      var rejected = 0
      for (_ <- 0 until 150) {
        val corrupt = bytes.clone()
        val pos = rnd.nextInt(bytes.length)
        corrupt(pos) = (corrupt(pos) ^ (1 << rnd.nextInt(8))).toByte
        Multimodal.FlacCodec.decodeSamples(corrupt) match {
          case None => rejected += 1
          case Some((_, _, ss)) =>
            assert(ss.sameElements(truth),
              s"media $mid: bit flip at byte $pos decoded DIFFERENT samples")
        }
      }
      assert(rejected > 75,
        s"media $mid: only $rejected/150 flips rejected")
    }
  }

  test("audio stats and features consume FLAC transparently") {
    import spark.implicits._
    val media = Multimodal.syntheticFlacs(
      Seq(2L, 5L, 9L).toDF("id"), "id")
    val stats = Multimodal.audioStatsOf(media).collect()
    assert(stats.length == 3, "every FLAC payload must yield stats")
    stats.foreach { r => assert(r.getAs[Int]("peak") > 0) }
    // extractFeatures: real duration AND real (non-stub) RMS features
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 3)
    feats.foreach { f =>
      val mid = f.media_id
      val total = 8000L + (mid % 32) * 1600L
      val sr = Array(8000, 16000, 22050, 44100, 48000)((mid % 5).toInt)
      assert(f.duration_ms == total * 1000L / sr,
        s"media $mid duration ${f.duration_ms}")
      assert(f.features.exists(_ > 0f), "features must reflect real samples")
    }
  }
}
