package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.Dsp

/** Frequency-domain audio features ([[Multimodal.audioSpectralOf]]):
  * the FFT against a naïve-DFT differential oracle, the shape
  * descriptors against closed-form fixtures (on-bin sine: zero leakage,
  * so centroid/rolloff/bandwidth are exact; off-bin sine: leakage-
  * tolerant windows; two equal tones: centroid at the midpoint,
  * bandwidth at the half-spread; LCG noise vs tone: flatness ordering),
  * WAV-vs-FLAC path agreement on identical samples, and the media-table
  * face that q_m25's oracle states (framing closed form + tonal /
  * low-centroid verdicts on the square-wave corpus, with margin). */
class AudioSpectralSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  // --- fixtures ----------------------------------------------------------

  private def sine(
      f: Double, sr: Int, n: Int, amp: Double = 12000.0): Array[Short] =
    Array.tabulate(n)(i =>
      math.round(amp * math.sin(2 * math.Pi * f * i / sr)).toShort)

  private def wavOf(samples: Array[Short], sr: Int): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Single-frame mono VERBATIM FLAC (16-bit blocksize form) carrying the
    * given samples — the same header layout the synthetic generator's
    * partial-tail frames use. */
  private def verbatimFlacOf(samples: Array[Short], sr: Int): Array[Byte] = {
    import Multimodal.FlacCodec
    val total = samples.length
    val bos = new java.io.ByteArrayOutputStream()
    val b = java.nio.ByteBuffer.allocate(42)
    b.put("fLaC".getBytes("US-ASCII"))
    b.put(0x80.toByte); b.put(0.toByte); b.put(0.toByte); b.put(34.toByte)
    b.putShort(total.toShort); b.putShort(total.toShort)
    (0 until 6).foreach(_ => b.put(0.toByte))
    b.put(((sr >> 12) & 0xff).toByte)
    b.put(((sr >> 4) & 0xff).toByte)
    b.put((((sr & 0xf) << 4) | (0 << 1) | 0).toByte) // mono, bps-1 hi 0
    b.put(((15 << 4) | 0).toByte)                    // bps 16, total hi 0
    b.put(((total >> 24) & 0xff).toByte)
    b.put(((total >> 16) & 0xff).toByte)
    b.put(((total >> 8) & 0xff).toByte)
    b.put((total & 0xff).toByte)
    bos.write(b.array())
    val frame = new java.io.ByteArrayOutputStream()
    frame.write(0xff); frame.write(0xf8)
    frame.write(0x70)              // blocksize code 7 (16-bit at end)
    frame.write((0 << 4) | (0x4 << 1))
    frame.write(0)                 // frame number 0
    frame.write(((total - 1) >> 8) & 0xff); frame.write((total - 1) & 0xff)
    val hdr = frame.toByteArray
    frame.write(FlacCodec.crc8(hdr, 0, hdr.length))
    frame.write(0x02)              // VERBATIM subframe
    samples.foreach { s => frame.write((s >> 8) & 0xff); frame.write(s & 0xff) }
    val body = frame.toByteArray
    val crc = FlacCodec.crc16(body, 0, body.length)
    frame.write((crc >> 8) & 0xff); frame.write(crc & 0xff)
    bos.write(frame.toByteArray)
    bos.toByteArray
  }

  // --- the FFT itself ----------------------------------------------------

  test("fft matches the naive DFT on LCG input") {
    val n = 256
    var seed = 0x9E3779B97F4A7C15L
    def next(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    val re = Array.fill(n)(next())
    val im = Array.fill(n)(next())
    val er = new Array[Double](n)
    val ei = new Array[Double](n)
    var k = 0
    while (k < n) {
      var sr0 = 0.0; var si0 = 0.0
      var t = 0
      while (t < n) {
        val ang = -2.0 * math.Pi * k * t / n
        val c = math.cos(ang); val s = math.sin(ang)
        sr0 += re(t) * c - im(t) * s
        si0 += re(t) * s + im(t) * c
        t += 1
      }
      er(k) = sr0; ei(k) = si0
      k += 1
    }
    Dsp.fft(re, im)
    k = 0
    while (k < n) {
      assert(math.abs(re(k) - er(k)) < 1e-9, s"re bin $k")
      assert(math.abs(im(k) - ei(k)) < 1e-9, s"im bin $k")
      k += 1
    }
  }

  test("fft rejects non-power-of-two lengths") {
    intercept[IllegalArgumentException] {
      Dsp.fft(new Array[Double](100), new Array[Double](100))
    }
  }

  // --- shape descriptors, closed forms -----------------------------------

  test("on-bin sine: Hann-kernel closed forms for every descriptor") {
    // 1000 Hz at 8 kHz, frame 512: exactly 64 cycles/frame, so the Hann
    // window's 3-point kernel (amplitude 1:2:1 → power 1:4:1 on bins
    // 63/64/65) is the ENTIRE spectrum. Closed forms: centroid 1000
    // (symmetric), rolloff one bin above the tone (cum 5/6 < 0.85 at the
    // peak bin), bandwidth Δ/√3 with Δ = 8000/512 = 15.625 Hz.
    val hz = 8000.0 / 512
    val sp = Dsp.spectral(8000, 1, sine(1000, 8000, 4096))
      .getOrElse(fail("no spectrum"))
    assert(sp.nFrames == 15)
    assert(math.abs(sp.centroidHz - 1000.0) < 0.01, s"centroid ${sp.centroidHz}")
    assert(math.abs(sp.rolloffHz - (1000.0 + hz)) < 1e-6,
      s"rolloff ${sp.rolloffHz}")
    assert(math.abs(sp.bandwidthHz - hz / math.sqrt(3.0)) < 0.01,
      s"bandwidth ${sp.bandwidthHz}")
    assert(sp.flatness < 1e-6, s"flatness ${sp.flatness}")
  }

  test("off-bin sine: leakage-tolerant windows around the tone") {
    // 1030 Hz falls between bins (15.625 Hz apart)
    val sp = Dsp.spectral(8000, 1, sine(1030, 8000, 4096))
      .getOrElse(fail("no spectrum"))
    assert(math.abs(sp.centroidHz - 1030.0) < 35.0, s"centroid ${sp.centroidHz}")
    assert(math.abs(sp.rolloffHz - 1030.0) < 35.0, s"rolloff ${sp.rolloffHz}")
    assert(sp.bandwidthHz < 120.0, s"bandwidth ${sp.bandwidthHz}")
    assert(sp.flatness < 0.01, s"flatness ${sp.flatness}")
  }

  test("two equal on-bin tones: centroid at the midpoint, bandwidth at the half-spread") {
    val a = sine(500, 8000, 4096)
    val b = sine(1500, 8000, 4096)
    val both = Array.tabulate(4096)(i => (a(i) + b(i)).toShort)
    val sp = Dsp.spectral(8000, 1, both).getOrElse(fail("no spectrum"))
    assert(math.abs(sp.centroidHz - 1000.0) < 20.0, s"centroid ${sp.centroidHz}")
    assert(math.abs(sp.bandwidthHz - 500.0) < 20.0, s"bandwidth ${sp.bandwidthHz}")
  }

  test("flatness separates noise from tone") {
    var seed = 42L
    val noise = Array.tabulate(4096) { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 40) - 8192).toShort // uniform in [-8192, 8191]
    }
    val flatNoise = Dsp.spectral(8000, 1, noise)
      .getOrElse(fail("no noise spectrum")).flatness
    val flatTone = Dsp.spectral(8000, 1, sine(1000, 8000, 4096))
      .getOrElse(fail("no tone spectrum")).flatness
    assert(flatNoise > 0.2, s"noise flatness $flatNoise")
    assert(flatNoise > 100.0 * flatTone,
      s"no separation: noise $flatNoise vs tone $flatTone")
  }

  test("degenerate inputs drop: short payloads and silence") {
    assert(Dsp.spectral(8000, 1, sine(1000, 8000, 100)).isEmpty)
    assert(Dsp.spectral(8000, 1, new Array[Short](4096)).isEmpty)
  }

  // --- decode paths ------------------------------------------------------

  test("decodePcm round-trips WAV samples exactly") {
    val ss = sine(700, 8000, 1024)
    val (sr, ch, got) = Multimodal.decodePcm(wavOf(ss, 8000))
      .getOrElse(fail("wav did not decode"))
    assert(sr == 8000 && ch == 1)
    assert(got.sameElements(ss))
  }

  test("WAV and VERBATIM-FLAC encodings of the same samples agree exactly") {
    val ss = sine(1030, 8000, 2048)
    val fromWav = Multimodal.decodePcm(wavOf(ss, 8000))
      .getOrElse(fail("wav did not decode"))
    val fromFlac = Multimodal.decodePcm(verbatimFlacOf(ss, 8000))
      .getOrElse(fail("flac did not decode"))
    assert(fromWav._1 == fromFlac._1 && fromWav._2 == fromFlac._2)
    assert(fromWav._3.sameElements(fromFlac._3))
    val a = Dsp.spectral(fromWav._1, 1, fromWav._3).get
    val b = Dsp.spectral(fromFlac._1, 1, fromFlac._3).get
    assert(a == b)
  }

  // --- the media-table face q_m25 certifies ------------------------------

  test("audioSpectralOf: framing closed form + DSP verdicts with oracle margin") {
    import spark.implicits._
    val ids = Seq(1L, 9L, 25L, 33L).toDF("id")
    val rows = Multimodal.audioSpectralOf(
      Multimodal.syntheticAudio(ids, "id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 9L, 25L, 33L))
    rows.foreach { case (mid, r) =>
      val n = 800 + (mid % 32) * 80
      assert(r.getInt(1) == 8000)
      assert(r.getLong(2) == 1 + (n - 512) / 256, s"media $mid frames")
      val centroid = r.getDouble(3)
      val flatness = r.getDouble(6)
      // q_m25's oracle claims centroid < 500 and flatness < 0.1; assert
      // with margin so the certified verdicts cannot sit near the edge
      assert(centroid > 40.0 && centroid < 300.0, s"media $mid centroid $centroid")
      assert(flatness < 0.05, s"media $mid flatness $flatness")
    }
  }

  // --- the spectral hot-band hash (q_m26) --------------------------------

  private def toneBytes(c: Long, scale: Double, trim: Int): Array[Byte] = {
    import spark.implicits._
    Multimodal.syntheticTones(
      Seq((c, c, scale, trim))
        .toDF("media_id", "content_id", "scale", "trim"))
      .collect().head.getAs[Array[Byte]]("bytes")
  }

  test("spectral hash: exactly the five planted hot bands") {
    for (c <- Seq(0L, 3L, 17L, 42L)) {
      val fp = Multimodal.audioSpectralHash(toneBytes(c, 1.0, 0))
        .getOrElse(fail(s"content $c did not hash"))
      val want = Set(
        (c % 11).toInt, 12 + (c % 13).toInt, 26 + (c % 7).toInt,
        34 + (c % 9).toInt, 44 + (c % 16).toInt)
      val got = (0 until 64).filter(b => (fp >> b & 1L) == 1L).toSet
      assert(got == want, s"content $c: hot bands $got != $want")
    }
  }

  test("spectral hash is exactly invariant to volume and trim; sensitive to content") {
    for (c <- Seq(1L, 5L, 23L)) {
      val base = Multimodal.audioSpectralHash(toneBytes(c, 1.0, 0)).get
      assert(Multimodal.audioSpectralHash(toneBytes(c, 0.4, 0)).get == base,
        s"content $c: volume changed the hash")
      assert(Multimodal.audioSpectralHash(toneBytes(c, 1.0, 300)).get == base,
        s"content $c: trim changed the hash")
      assert(Multimodal.audioSpectralHash(toneBytes(c, 0.4, 300)).get == base,
        s"content $c: volume+trim changed the hash")
      assert(Multimodal.audioSpectralHash(toneBytes(c + 1, 1.0, 0)).get != base,
        s"contents $c and ${c + 1} collided")
    }
  }

  test("time-envelope fingerprint breaks on trim where the spectral hash holds") {
    // the motivating separation: audioFingerprint hashes time-band RMS,
    // so cutting the front shifts every band; the spectral hash discards
    // phase and cannot see the cut
    val c = 9L
    val a = toneBytes(c, 1.0, 0)
    val b = toneBytes(c, 1.0, 700)
    assert(Multimodal.audioSpectralHash(a) == Multimodal.audioSpectralHash(b))
    val envA = Multimodal.audioFingerprint(a)
    val envB = Multimodal.audioFingerprint(b)
    assert(envA.isDefined && envB.isDefined && envA != envB,
      "expected the time-envelope fingerprint to move under a 700-sample cut")
  }

  test("audioProfile is bit-identical to the single-facet operators") {
    import spark.implicits._
    val media = Multimodal.syntheticAudio(
      Seq(1L, 9L, 25L, 33L).toDF("id"), "id")
    val fused = Multimodal.audioProfile(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    val stats = Multimodal.audioStatsOf(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    val spect = Multimodal.audioSpectralOf(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(fused.keySet == stats.keySet && fused.keySet == spect.keySet)
    fused.foreach { case (mid, f) =>
      val st = stats(mid)
      val sp = spect(mid)
      assert(f.getDouble(1) == st.getDouble(1), s"$mid rms")
      assert(f.getInt(2) == st.getInt(2), s"$mid peak")
      assert(f.getDouble(3) == st.getDouble(3), s"$mid silence")
      assert(f.getLong(4) == st.getLong(4), s"$mid zc")
      assert(f.getInt(5) == sp.getInt(1), s"$mid sr")
      assert(f.getLong(6) == sp.getLong(2), s"$mid frames")
      assert(f.getDouble(7) == sp.getDouble(3), s"$mid centroid")
      assert(f.getDouble(8) == sp.getDouble(4), s"$mid rolloff")
      assert(f.getDouble(9) == sp.getDouble(5), s"$mid bandwidth")
      assert(f.getDouble(10) == sp.getDouble(6), s"$mid flatness")
    }
  }

  test("decode paths never throw on corrupted payloads") {
    // the decoder contract everywhere in this file is Option, not
    // exceptions: 400 mutations (byte flips, truncations, prefix junk)
    // of valid WAV/FLAC payloads must decode or drop, never crash
    var seed = 0xC0FFEEL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    val wav = wavOf(sine(1030, 8000, 2048), 8000)
    val flac = verbatimFlacOf(sine(700, 8000, 1024), 8000)
    for (i <- 0 until 400) {
      val src = if (i % 2 == 0) wav else flac
      val mutated = nextInt(3) match {
        case 0 => // flip a byte
          val b = src.clone()
          b(nextInt(b.length)) = (b(nextInt(b.length)) ^ 0xFF).toByte
          b
        case 1 => // truncate
          java.util.Arrays.copyOf(src, nextInt(src.length))
        case 2 => // junk prefix
          Array.fill[Byte](nextInt(16) + 1)(nextInt(256).toByte) ++ src
      }
      Multimodal.decodePcm(mutated)
      Multimodal.audioSpectralHash(mutated)
      Dsp.spectral(8000, 1, sine(100, 8000, 600)) // keep Dsp hot-pathed too
    }
    succeed
  }

  test("audioSpectralOf drops undecodable and sub-frame payloads") {
    import spark.implicits._
    val junk = Seq(
      (1L, "audio", Array.fill[Byte](64)(0x5A)),          // unrecognized
      (2L, "audio", wavOf(sine(1000, 8000, 100), 8000)),  // < one frame
      (3L, "audio", wavOf(sine(1000, 8000, 1024), 8000))) // decodes
      .toDF("media_id", "kind", "bytes")
    val got = Multimodal.audioSpectralOf(junk).select("media_id")
      .as[Long].collect().toSet
    assert(got == Set(3L))
  }
}
