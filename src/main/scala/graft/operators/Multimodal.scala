package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The Spark side is real — schema, partition-iterator batch shape, typed
  * Encoders, binary-column handling — and so is every recognized-format
  * decode path: [[ImageCodec]] drives `javax.imageio` (PNG/JPEG/GIF/BMP),
  * [[AudioCodec]] drives `javax.sound.sampled` (PCM WAV/AIFF/AU), and
  * [[VideoCodec]] parses the Y4M/YUV4MPEG2 container (raw planar YUV —
  * self-describing, no native codec needed). Each emits true metadata
  * (dimensions / duration) plus a deterministic feature vector reduced
  * from the decoded samples. [[AviCodec]] adds a fully offline COMPRESSED
  * video path (RIFF walk + per-frame MJPEG decode); [[FlacCodec]] the
  * same for compressed audio. Inter-frame-predicted video (MP4/WebM)
  * plugs in through the [[SampleDecoder]] seam: the offline container
  * walkers provide the sample timeline and byte ranges, a registered
  * decoder (ServiceLoader jar or programmatic — FFmpeg/JNI in
  * production, [[SampleDecoders.MjpegAvi]] real today) provides the
  * frames, and the stub is reachable only when nothing claims the
  * container. [[StubDecoder]] remains only for payloads no codec
  * recognizes (asMediaTable stages text bytes as fake payloads). Either
  * way decode stays a narrow map over partitions: swapping a production
  * codec in changes no plan shape (SampleDecoderSpec pins this).
  */
object Multimodal {

  /** Provable partition width of an analyzed plan: defined iff every
    * leaf-to-root path passes only through partition-count-preserving
    * narrow ops (or Union, which sums its children) down to an explicit
    * shuffling `Repartition` — exactly the synthetic-builder signature.
    * Anything else (scans, joins, aggregates, AQE-coalescible
    * exchanges) returns None: width unknown. A plan walk only — never
    * plans physically, never runs a job (`df.rdd.getNumPartitions`
    * would EXECUTE the upstream stages under AQE). */
  private def plannedWidth(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[Int] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case r: Repartition if r.shuffle => Some(r.numPartitions)
      case u: Union =>
        val ws = u.children.map(plannedWidth)
        if (ws.forall(_.isDefined)) Some(ws.flatten.sum) else None
      case _: Project | _: Filter | _: SerializeFromObject |
          _: DeserializeToObject | _: MapPartitions | _: TypedFilter |
          _: SubqueryAlias =>
        plannedWidth(p.children.head)
      case _ => None
    }
  }

  /** Spread a media frame across the session's cores before a heavy
    * per-row decode — but only when it may arrive NARROWER than that
    * (the real-table case: a compact parquet scan is typically one
    * split). The synthetic-builder outputs are provably already
    * encode-spread over `defaultParallelism` partitions
    * ([[plannedWidth]]), and an unconditional round-robin there
    * shuffles the full payload bytes to buy nothing; skipping it fuses
    * the decode into the encode stage, so the payload never crosses
    * the network at all. Unknown width (scans, joins, streaming
    * frames) keeps the previous unconditional spread.
    *
    * Invariant the skip relies on: the builders pin their spread width
    * to the SAME session's `defaultParallelism` at build time, so the
    * comparison here is same-session by construction. A synthetic
    * frame persisted and re-read, or built under a different
    * parallelism, loses the builder plan signature (it becomes a scan)
    * and safely falls back to the unconditional spread. */
  private def spreadForDecode(media: DataFrame): DataFrame = {
    val p = media.sparkSession.sparkContext.defaultParallelism
    val wide = !media.isStreaming &&
      plannedWidth(media.queryExecution.analyzed).exists(_ >= p)
    if (wide) media else media.repartition(p)
  }

  /** Typed per-media feature row (the post-decode schema). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_ms: Long,
      features: Array[Float])

  /** STUB — deterministic fake decoder for payloads no real codec
    * recognizes (e.g. asMediaTable's staged text bytes, or compressed
    * video containers this sandbox has no codec for). Derives plausible
    * metadata and a feature vector from a FNV-1a hash of the payload, so
    * results are reproducible across runs/executors. A production build
    * replaces `decode` with the real library call; everything around it
    * (batching, schema, partitioning) is unchanged. */
  object StubDecoder {
    private def fnv(bytes: Array[Byte], seed: Long): Long = {
      var h = 1469598103934665603L ^ seed
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= 1099511628211L; i += 1
      }
      h
    }

    /** splitmix64-style finalizer: derives per-index values from the one
      * base hash instead of re-scanning the payload per feature. */
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }

    def decode(kind: String, bytes: Array[Byte], featureDim: Int)
        : (Int, Int, Long, Array[Float]) = {
      val h = fnv(bytes, 0) // single pass over the payload
      val width = 64 + math.floorMod(h, 1856).toInt
      val height = 64 + math.floorMod(h >>> 17, 1016).toInt
      val durationMs = kind match {
        case "image" => 0L
        case _       => 1000L + math.floorMod(h >>> 23, 600000L)
      }
      val feats = Array.tabulate(featureDim) { i =>
        (math.floorMod(mix(h ^ (i + 1)), 2000001L) / 1000000.0f) - 1.0f
      }
      (width, height, durationMs, feats)
    }
  }

  /** Real image decode via the JDK's `javax.imageio` — no external codec
    * needed even offline. Features are `featureDim` equal horizontal bands,
    * each the mean Rec.601 luma (0.299R + 0.587G + 0.114B) of its pixels
    * normalized to [0,1] — a deterministic pure-arithmetic reduction of the
    * decoded pixels (PNG decode is bit-exact, so features are reproducible
    * across runs and executors). */
  object ImageCodec {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors

    /** None when no ImageIO reader recognizes the payload. */
    def decode(bytes: Array[Byte], featureDim: Int)
        : Option[(Int, Int, Array[Float])] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Double](featureDim)
        val counts = new Array[Long](featureDim)
        var y = 0
        while (y < h) {
          val band = math.min(featureDim - 1, y * featureDim / h)
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y) // sRGB regardless of source model
            sums(band) += 0.299 * ((rgb >> 16) & 0xFF) +
              0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
            counts(band) += 1
            x += 1
          }
          y += 1
        }
        val feats = Array.tabulate(featureDim) { i =>
          if (counts(i) == 0) 0f else (sums(i) / (counts(i) * 255.0)).toFloat
        }
        Some((w, h, feats))
      }
    }
  }

  /** 64-bit perceptual difference hash (dHash — the classic
    * gradient-based perceptual hash, public technique): area-mean
    * downsample the decoded luma to a 9×8 grid, bit (y·8 + x) set when
    * cell(x, y) is brighter than cell(x+1, y). Robust to re-encoding and
    * uniform brightness shifts (gradients survive both); Hamming distance
    * ≤ ~7 flags near-duplicate images.
    *
    * The kernel is EXACT integer arithmetic: per-cell luma sums on the
    * ×1000 grid (`299·R + 587·G + 114·B`, a Long sum — summation order
    * can never flip a bit) and the brighter-than comparison
    * cross-multiplied (`sumA·nB > sumB·nA`) instead of dividing into
    * doubles. Same semantics as the float form, but bit-reproducible on
    * any platform AND closed-form computable by an independent SQL
    * engine — q_m9's DuckDB oracle re-derives the full hash from the
    * synthetic gradient and certifies decode → grid → compare → bit
    * assembly end to end. None when the payload is not a decodable
    * image. */
  def imageDHash(bytes: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None else dHashOfImage(img)
  }

  /** The dHash kernel over an already-decoded image — shared by the
    * bytes-level [[imageDHash]] and [[videoDHash]] (which reads the first
    * frame's BufferedImage straight off the Y4M decode, skipping a PNG
    * encode+decode round trip). */
  private def dHashOfImage(
      img: java.awt.image.BufferedImage): Option[Long] = {
    if (img.getWidth < 1 || img.getHeight < 1) None
    else {
      val (gw, gh) = (9, 8)
      val w = img.getWidth
      val h = img.getHeight
      val sums = Array.ofDim[Long](gh, gw) // Σ luma×1000 per cell (exact)
      val npix = Array.ofDim[Long](gh, gw)
      var cy = 0
      while (cy < gh) {
        val y0 = cy * h / gh
        val y1 = math.max(y0 + 1, (cy + 1) * h / gh)
        var cx = 0
        while (cx < gw) {
          val x0 = cx * w / gw
          val x1 = math.max(x0 + 1, (cx + 1) * w / gw)
          var s = 0L
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val rgb = img.getRGB(x, y)
              s += 299L * ((rgb >> 16) & 0xFF) +
                587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
              x += 1
            }
            y += 1
          }
          sums(cy)(cx) = s
          npix(cy)(cx) =
            (math.min(x1, w) - x0).toLong * (math.min(y1, h) - y0)
          cx += 1
        }
        cy += 1
      }
      var hash = 0L
      var y = 0
      while (y < gh) {
        var x = 0
        while (x < 8) {
          // mean(x) > mean(x+1) cross-multiplied: exact, no division.
          // Compared in 128 bits (multiplyHigh + unsigned low word —
          // operands are nonnegative): sum·npix can pass 2^63 once the
          // image nears ~430 MP, and a wrapped sign would silently flip
          // brighter-than bits on panorama-sized inputs.
          val l1 = sums(y)(x) * npix(y)(x + 1)
          val h1 = Math.multiplyHigh(sums(y)(x), npix(y)(x + 1))
          val l2 = sums(y)(x + 1) * npix(y)(x)
          val h2 = Math.multiplyHigh(sums(y)(x + 1), npix(y)(x))
          if (h1 > h2 ||
            (h1 == h2 && java.lang.Long.compareUnsigned(l1, l2) > 0)) {
            hash |= 1L << (y * 8 + x)
          }
          x += 1
        }
        y += 1
      }
      Some(hash)
    }
  }

  /** DCT perceptual hash (pHash) with EXACT mirror invariance — the
    * near-dup axis [[imageDHash]] cannot cover: a mirrored repost
    * reverses every adjacent-cell comparison, so the dHash moves ~half
    * its bits, while the magnitude spectrum of a reflection is the
    * original's. Pipeline: 32×32 area-averaged luma grid → 2-D DCT-II →
    * the 8×8 low-frequency block → 63 bits comparing |AC coefficient|
    * to the block's median |AC| (DC excluded; bit 0 fixed zero).
    *
    * The DCT folds each symmetric sample pair BEFORE multiplying the
    * basis (`Σ_{x<16} B[u][x]·(v[x] ± v[31-x])`, using
    * `B[u][31-x] = (-1)^u B[u][x]`), so a mirrored input produces
    * coefficients that differ by an EXACT ±1 factor — bit-for-bit in
    * floating point, not just mathematically. Hence for images whose
    * luma grid mirrors exactly (any 32×32 source, or multiples where
    * cell sums stay order-identical): horizontal mirror, vertical
    * mirror, and 180° rotation leave the hash IDENTICAL, as do
    * brightness shifts (DC-only) and positive contrast scaling (median
    * scales with the field). q_m28 certifies the planted-mirror join;
    * the spec pins each exact invariance and measures the dHash
    * separation. */
  def imagePHash(bytes: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None else pHashOfImage(img)
  }

  /** cos(π(2x+1)u/64) for u ∈ [0,32), x ∈ [0,16) — the half-kernel the
    * folded DCT needs. */
  private lazy val dctBasis32: Array[Array[Double]] =
    Array.tabulate(32, 16)((u, x) =>
      math.cos(math.Pi * (2 * x + 1) * u / 64.0))

  /** Folded 32-point DCT-II of `v`, first `keep` coefficients. */
  private def dct32(v: Array[Double], keep: Int): Array[Double] = {
    val out = new Array[Double](keep)
    var u = 0
    while (u < keep) {
      val sign = if ((u & 1) == 0) 1.0 else -1.0
      var s = 0.0
      var x = 0
      while (x < 16) {
        s += dctBasis32(u)(x) * (v(x) + sign * v(31 - x))
        x += 1
      }
      out(u) = s
      u += 1
    }
    out
  }

  private def pHashOfImage(
      img: java.awt.image.BufferedImage): Option[Long] = {
    if (img.getWidth < 1 || img.getHeight < 1) None
    else {
      val n = 32
      val w = img.getWidth
      val h = img.getHeight
      val cells = Array.ofDim[Double](n, n)
      var cy = 0
      while (cy < n) {
        val y0 = cy * h / n
        val y1 = math.max(y0 + 1, (cy + 1) * h / n)
        var cx = 0
        while (cx < n) {
          val x0 = cx * w / n
          val x1 = math.max(x0 + 1, (cx + 1) * w / n)
          var s = 0.0
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val rgb = img.getRGB(x, y)
              s += 0.299 * ((rgb >> 16) & 0xFF) +
                0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
              x += 1
            }
            y += 1
          }
          cells(cy)(cx) =
            s / ((math.min(x1, w) - x0) * (math.min(y1, h) - y0))
          cx += 1
        }
        cy += 1
      }
      // rows along x (keep 8), then columns along y (keep 8)
      val rows = Array.tabulate(n)(y => dct32(cells(y), 8))
      val colBuf = new Array[Double](n)
      val block = Array.ofDim[Double](8, 8)
      var u = 0
      while (u < 8) {
        var y = 0
        while (y < n) { colBuf(y) = rows(y)(u); y += 1 }
        val cu = dct32(colBuf, 8)
        var v = 0
        while (v < 8) { block(v)(u) = cu(v); v += 1 }
        u += 1
      }
      val ac = new Array[Double](63)
      var i = 0
      var v = 0
      while (v < 8) {
        var u2 = 0
        while (u2 < 8) {
          if (v != 0 || u2 != 0) { ac(i) = math.abs(block(v)(u2)); i += 1 }
          u2 += 1
        }
        v += 1
      }
      val sorted = ac.sorted
      val median = sorted(31) // 32nd smallest of 63
      var hash = 0L
      i = 0
      while (i < 63) {
        if (ac(i) > median) hash |= 1L << (i + 1) // bit 0 fixed zero
        i += 1
      }
      Some(hash)
    }
  }

  /** [[imagePHash]] over a media table (undecodable payloads drop).
    *
    * @return media_id, phash */
  def imagePHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .transform(spreadForDecode)
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          imagePHash(bytes).map(h => (mid, h))
        }
      }
      .toDF("media_id", "phash")
  }

  /** Deterministic 32×32 PNG corpus for reflection-level image dedup:
    * each row of `keys` — (media_id, content_id, mirror) — renders the
    * SAME content-keyed pseudo-random pixel field, reflected per
    * `mirror` (0 = none, 1 = horizontal, 2 = vertical, 3 = both, i.e.
    * 180° rotation). 32×32 makes the luma grid the identity sampling
    * and PNG is lossless, so [[imagePHash]]'s folded-DCT invariance is
    * exact: two rows hash identically iff they share `content_id` —
    * q_m28's closed form. */
  def syntheticMirrorImages(keys: DataFrame): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys
      .select(col("media_id").cast("long"), col("content_id").cast("long"),
        col("mirror").cast("int"))
      // spread the NARROW key rows before the heavy per-row encode
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        it.map { case (mid, c, mirror) =>
          require(mirror >= 0 && mirror <= 3, s"bad mirror code: $mirror")
          def mix(z0: Long): Long = {
            var z = z0 + 0x9E3779B97F4A7C15L
            z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
            z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
            z ^ (z >>> 31)
          }
          val img = new java.awt.image.BufferedImage(
            32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              val sx = if ((mirror & 1) != 0) 31 - x else x
              val sy = if ((mirror & 2) != 0) 31 - y else y
              img.setRGB(x, y,
                (mix(c * 1031 + sy * 32 + sx) & 0xFFFFFF).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (mid, "image", bos.toByteArray)
        }
      }
      .toDF("media_id", "kind", "bytes")
  }

  /** 64-bit audio fingerprint: the dHash idea in the time domain — 65
    * time-band RMS energies from the real PCM decode, one bit per
    * adjacent-band energy comparison. Re-encoding PCM into another
    * container (WAV↔AIFF) preserves samples, hence the fingerprint;
    * lightly clipped or re-gained copies move few bits. None when the
    * payload is not decodable 16-bit PCM. */
  def audioFingerprint(bytes: Array[Byte]): Option[Long] =
    AudioCodec.decode(bytes, featureDim = 65).map { case (_, feats) =>
      var fp = 0L
      var i = 0
      while (i < 64) {
        if (feats(i) > feats(i + 1)) fp |= 1L << i
        i += 1
      }
      fp
    }

  /** Per-file audio curation stats off the decoded 16-bit PCM samples:
    * RMS and peak amplitude (raw sample units), the fraction of samples
    * under `silenceFraction` of full scale, and the count of
    * sign-change zero crossings — the screens an audio-corpus pipeline
    * drops silent, clipped, or tonal files with. Channels are pooled
    * (interleaved samples treated as one stream). None when the payload
    * is not decodable 16-bit PCM.
    *
    * All four stats are exact integer/rational reductions of the decoded
    * samples: sum-of-squares and counts are integral, so for a corpus
    * whose expected values have a closed form (q_m17's square waves:
    * RMS = peak = the amplitude, exactly) the result is
    * hash-certifiable. */
  def audioStats(bytes: Array[Byte], silenceFraction: Double = 0.01)
      : Option[(Double, Int, Double, Long)] = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case scala.util.control.NonFatal(_) => null
      }
    if (ais == null) statsOfPcm(
      FlacCodec.decodeSamples(bytes).map(_._3), silenceFraction)
    else {
      try {
        val fmt = ais.getFormat
        val ok = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && ais.getFrameLength > 0
        if (!ok) None
        else {
          val raw = ais.readAllBytes()
          val nSamples = raw.length / 2
          if (nSamples == 0) None
          else {
            val silenceFloor = (silenceFraction * 32768.0).toInt
            var sumSq = 0.0
            var peak = 0
            var nSilent = 0L
            var nCross = 0L
            var prev = 0
            var i = 0
            while (i < nSamples) {
              val lo = raw(2 * i) & 0xFF
              val hi = raw(2 * i + 1) & 0xFF
              val s =
                if (fmt.isBigEndian) ((raw(2 * i) << 8) | hi).toShort.toInt
                else ((raw(2 * i + 1) << 8) | lo).toShort.toInt
              sumSq += s.toDouble * s.toDouble
              val a = math.abs(s)
              if (a > peak) peak = a
              if (a < silenceFloor) nSilent += 1
              if (i > 0 && prev.toLong * s < 0) nCross += 1
              prev = s
              i += 1
            }
            Some((math.sqrt(sumSq / nSamples), peak,
              nSilent.toDouble / nSamples, nCross))
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally ais.close()
    }
  }

  /** Exact integral reductions of the REAL FLAC sample decode — the
    * driver-checkable face of [[FlacCodec]] (q_m20): everything emitted
    * is an integer computed from the decoded PCM, so a corpus whose
    * samples have a closed form ([[syntheticFlacs]]' CONSTANT frames)
    * certifies the whole frame walk, CRC checks, and subframe decode
    * against a SQL restatement. Narrow map; undecodable payloads drop.
    *
    * @return media_id, sample_rate, channels, n_samples (interleaved),
    *         peak (max |s|), sum_sq (Σ s², exact long) */
  def flacSampleStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .transform(spreadForDecode)
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          FlacCodec.decodeSamples(bytes).map { case (sr, channels, ss) =>
            var peak = 0
            var sumSq = 0L
            var i = 0
            while (i < ss.length) {
              val s = ss(i).toInt
              val a = math.abs(s)
              if (a > peak) peak = a
              sumSq += s.toLong * s
              i += 1
            }
            (mid, sr, channels, ss.length.toLong, peak, sumSq)
          }
        }
      }
      .toDF("media_id", "sample_rate", "channels", "n_samples", "peak",
        "sum_sq")
  }

  /** [[audioStats]]'s reduction over already-decoded interleaved PCM —
    * shared by the javax.sound path (via its byte loop, same arithmetic)
    * and the [[FlacCodec]] fallback. */
  private def statsOfPcm(
      samples: Option[Array[Short]],
      silenceFraction: Double): Option[(Double, Int, Double, Long)] =
    samples.filter(_.nonEmpty).map { ss =>
      val silenceFloor = (silenceFraction * 32768.0).toInt
      var sumSq = 0.0
      var peak = 0
      var nSilent = 0L
      var nCross = 0L
      var prev = 0
      var i = 0
      while (i < ss.length) {
        val s = ss(i).toInt
        sumSq += s.toDouble * s.toDouble
        val a = math.abs(s)
        if (a > peak) peak = a
        if (a < silenceFloor) nSilent += 1
        if (i > 0 && prev.toLong * s < 0) nCross += 1
        prev = s
        i += 1
      }
      (math.sqrt(sumSq / ss.length), peak,
        nSilent.toDouble / ss.length, nCross)
    }

  /** [[audioStats]] over a media table — the same narrow-map shape as
    * [[extractFeatures]] (undecodable payloads drop).
    *
    * @return media_id, rms, peak, silence_ratio, zero_crossings */
  def audioStatsOf(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .transform(spreadForDecode)
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          audioStats(bytes).map { case (rms, peak, sil, zc) =>
            (mid, rms, peak, sil, zc)
          }
        }
      }
      .toDF("media_id", "rms", "peak", "silence_ratio", "zero_crossings")
  }

  /** Container-agnostic sample byte ranges for the [[SampleDecoder]]
    * seam: the REAL offline walkers (RIFF `movi`, MP4 `stbl`, Matroska
    * Clusters — the q_m22/q_m23/q_m24 machinery) produce one
    * [[SampleRef]] per sample. None when no walker recognizes the
    * payload. */
  def containerSampleRefs(
      bytes: Array[Byte]): Option[(String, Seq[SampleRef])] =
    AviCodec.parseMeta(bytes) match {
      case Some(m) =>
        val cks = AviCodec.frameChunks(bytes, m)
        if (cks.isEmpty) None
        else Some(("avi", cks.toSeq.zipWithIndex.map { case ((st, ln), i) =>
          SampleRef(i, st.toLong, ln.toLong,
            i.toLong * m.usPerFrame / 1000L, keyframe = true)
        }))
      case None =>
        Mp4Samples.sampleTable(bytes).filter(_.nonEmpty).map { ss =>
          ("mp4", ss.map(s =>
            SampleRef(s.idx, s.offset, s.size, s.dtsMs, s.keyframe)))
        }.orElse(WebmBlocks.blockTable(bytes).filter(_.nonEmpty).map { bs =>
          ("webm", bs.map(b =>
            SampleRef(b.idx, b.offset, b.size, b.tsMs, b.keyframe)))
        })
    }

  /** Frames through the [[SampleDecoder]] seam: walk the container's
    * sample table, hand each byte range to the first claiming decoder.
    * Empty when no walker recognizes the payload OR no decoder claims the
    * container (the callers then fall back to their labeled stubs). */
  private def spiFrames(bytes: Array[Byte], decoders: Seq[SampleDecoder])
      : Iterator[(SampleRef, java.awt.image.BufferedImage)] =
    containerSampleRefs(bytes) match {
      case Some((container, refs)) =>
        SampleDecoders.forContainer(container, decoders) match {
          case Some(d) =>
            refs.iterator.flatMap(r => d.decodeSample(bytes, r).map(r -> _))
          case None => Iterator.empty
        }
      case None => Iterator.empty
    }

  /** 64-bit video fingerprint: the perceptual dHash of the FIRST decoded
    * frame (Y4M path), read straight off the YUV→RGB decode — no PNG
    * encode+decode in the loop. Re-muxed or re-described copies of the
    * same footage share it; trailing-frame edits do not move it (a
    * content-level fingerprint over every sampled frame is the multi-frame
    * extension, same machinery per frame). Compressed containers
    * (AVI/MP4/WebM) take the [[SampleDecoder]] seam: the first decodable
    * sample's frame is hashed — real today for MJPEG-AVI via
    * [[SampleDecoders.MjpegAvi]], and for MP4/WebM whenever a decoder
    * claiming them is registered. */
  def videoDHash(bytes: Array[Byte]): Option[Long] =
    videoDHash(bytes, SampleDecoders.snapshot())

  def videoDHash(
      bytes: Array[Byte], decoders: Seq[SampleDecoder]): Option[Long] =
    VideoCodec.parseHeader(bytes) match {
      case Some(m) =>
        val it = VideoCodec.frameDataOffsets(bytes, m)
        if (!it.hasNext) None
        else dHashOfImage(VideoCodec.frameImageAtOffset(bytes, m, it.next()))
      case None =>
        val fr = spiFrames(bytes, decoders)
        if (fr.hasNext) dHashOfImage(fr.next()._2) else None
    }

  /** Temporal majority-vote video fingerprint — the whole-clip twin of
    * [[videoDHash]] (which hashes only the FIRST frame, so any re-cut
    * that changes frame order breaks it): per-frame dHash over every
    * decodable frame, then one bit per position by strict majority vote
    * across frames. The vote depends only on the frame MULTISET, so a
    * re-muxed copy with reordered frames — reversed, GOP-shuffled,
    * rotated — fingerprints EXACTLY identically, while distinct content
    * diverges frame by frame. Ties (even frame count, split vote) go to
    * 0 by the strict comparison: deterministic and still
    * order-invariant, since reordering never changes a count. q_m29
    * certifies the hamming-0 banded join over planted frame-reversed
    * twins; the spec measures the first-frame hash moving where this
    * one cannot. */
  def videoTemporalDHash(bytes: Array[Byte]): Option[Long] =
    videoTemporalDHash(bytes, SampleDecoders.snapshot())

  /** Decoder-seam overload: Y4M frames come straight off the raw decode;
    * compressed containers (AVI/MP4/WebM) vote over the frames a
    * registered [[SampleDecoder]] provides — same per-frame machinery,
    * same majority vote, unchanged plan. */
  def videoTemporalDHash(
      bytes: Array[Byte], decoders: Seq[SampleDecoder]): Option[Long] = {
    val hashes: Iterator[Long] = VideoCodec.parseHeader(bytes) match {
      case Some(m) =>
        VideoCodec.frameDataOffsets(bytes, m).flatMap(off =>
          dHashOfImage(VideoCodec.frameImageAtOffset(bytes, m, off)))
      case None => spiFrames(bytes, decoders).flatMap(f => dHashOfImage(f._2))
    }
    majorityVote64(hashes)
  }

  /** Strict per-bit majority over 64-bit hashes — order-invariant by
    * construction (the vote sees only the multiset). None on no input. */
  private def majorityVote64(hashes: Iterator[Long]): Option[Long] = {
    val counts = new Array[Int](64)
    var n = 0
    hashes.foreach { h =>
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      n += 1
    }
    if (n == 0) None
    else {
      var fp = 0L
      var b = 0
      while (b < 64) {
        if (2 * counts(b) > n) fp |= 1L << b
        b += 1
      }
      Some(fp)
    }
  }

  /** [[videoTemporalDHash]] over a media table (undecodable payloads
    * drop). The decoder snapshot is captured HERE on the driver and
    * shipped in the closure, so programmatic registrations reach
    * executors on a real cluster.
    *
    * @return media_id, temporal_hash */
  def videoTemporalDHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val decoders = SampleDecoders.snapshot()
    media
      .transform(spreadForDecode)
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          videoTemporalDHash(bytes, decoders).map(h => (mid, h))
        }
      }
      .toDF("media_id", "temporal_hash")
  }

  /** Deterministic Y4M corpus with an order control for reorder-level
    * video dedup: each row of `keys` — (media_id, content_id, reverse)
    * — renders the SAME content-keyed frame set, written front-to-back
    * when `reverse` = 0 and back-to-front when 1. The content: a
    * pseudo-random static scene (luma a pure hash of (content, x, y))
    * on every frame except SOURCE frame 0, which carries the inverted
    * scene — a title-card stand-in. So the first frame of the two
    * orders differs maximally (inverted vs normal scene, which is what
    * [[videoDHash]] hashes) while the frame MULTISET is identical and
    * the scene holds the per-bit majority at the minimum 4-frame clip
    * ([[videoTemporalDHash]] is exactly order-blind). */
  def syntheticReorderedVideos(keys: DataFrame): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys
      .select(col("media_id").cast("long"), col("content_id").cast("long"),
        col("reverse").cast("int"))
      // spread the NARROW key rows before the heavy per-row encode
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        it.map { case (mid, c, reverse) =>
          require(reverse == 0 || reverse == 1, s"bad reverse: $reverse")
          def mix(z0: Long): Long = {
            var z = z0 + 0x9E3779B97F4A7C15L
            z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
            z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
            z ^ (z >>> 31)
          }
          val w = 8 + (c % 8).toInt * 2
          val h = 8 + (c % 6).toInt * 2
          val frames = 4 + (c % 16).toInt
          val header = s"YUV4MPEG2 W$w H$h F10:1 Ip A1:1 C420\n"
            .getBytes("US-ASCII")
          val fsize = w * h + 2 * ((w / 2) * (h / 2))
          val bos = new java.io.ByteArrayOutputStream(
            header.length + frames * (6 + fsize))
          bos.write(header)
          var f = 0
          while (f < frames) {
            val sf = if (reverse == 1) frames - 1 - f else f
            bos.write("FRAME\n".getBytes("US-ASCII"))
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val base = 30 + (mix(c * 8191 + y * w + x).toInt & 0x7F)
                bos.write(if (sf == 0) 255 - base else base)
                x += 1
              }
              y += 1
            }
            var ch = 0
            while (ch < 2 * ((w / 2) * (h / 2))) { bos.write(128); ch += 1 }
            f += 1
          }
          (mid, "video", bos.toByteArray)
        }
      }
      .toDF("media_id", "kind", "bytes")
  }

  /** Scene-change detection over decoded Y4M video: for every
    * consecutive frame pair, the mean absolute luma difference over the
    * Y plane, with a cut verdict above `threshold` (0–255 scale; hard
    * cuts in real footage sit far above 32, gradual motion far below).
    * The shot-boundary primitive a video-curation pipeline segments
    * clips with before per-shot sampling or dedup.
    *
    * Narrow map straight over the frame offset table (no RGB conversion,
    * no PNG round-trip — the diff reads raw Y bytes). The per-pair stat
    * is an exact integer sum divided by the plane size, so expected
    * values on constructed clips are closed-form (SceneSpec plants a
    * two-scene clip and recovers exactly its one cut).
    *
    * @return media_id, frame_idx (the LATER frame), mean_abs_diff, is_cut */
  def videoSceneChanges(
      media: DataFrame, threshold: Double = 32.0): DataFrame = {
    require(threshold > 0, s"threshold must be > 0: $threshold")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .transform(spreadForDecode)
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          VideoCodec.parseHeader(bytes).iterator.flatMap { m =>
            val offs = VideoCodec.frameDataOffsets(bytes, m)
            var prevOff = -1
            var idx = 0
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Int, Double, Boolean)]
            while (offs.hasNext) {
              val off = offs.next()
              if (prevOff >= 0) {
                var s = 0L
                var i = 0
                while (i < m.ySize) {
                  s += math.abs((bytes(off + i) & 0xFF) -
                    (bytes(prevOff + i) & 0xFF))
                  i += 1
                }
                val mean = s.toDouble / m.ySize
                out += ((mid, idx, mean, mean >= threshold))
              }
              prevOff = off
              idx += 1
            }
            out.iterator
          }
        }
      }
      .toDF("media_id", "frame_idx", "mean_abs_diff", "is_cut")
  }

  /** One fingerprint table across modalities: (media_id, kind, fp) where
    * fp is [[imageDHash]] / [[audioFingerprint]] / [[videoDHash]] by kind
    * — every row joins the SAME banded Hamming near-dup search
    * ([[Dedup.hamming64Pairs]]). Narrow map; undecodable payloads drop.
    *
    * `carry` columns pass through the decode untouched (appended after
    * fp, source types kept) — the streaming screen uses this to keep its
    * event-time column alive across the codec map, where a plain Column
    * projection can't reach (codecs aren't Catalyst expressions). */
  def mediaFingerprints(
      media: DataFrame, carry: Seq[String] = Nil,
      spectralAudio: Boolean = false,
      phashImages: Boolean = false,
      temporalVideo: Boolean = false): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = media.sparkSession
    val prepped = media
      .transform(spreadForDecode)
      .select((Seq(col("media_id"), col("kind"), col("bytes"))
        ++ carry.map(col)): _*)
    val outSchema = StructType(
      Seq(prepped.schema("media_id"), prepped.schema("kind"),
        StructField("fp", LongType, nullable = false))
        ++ carry.map(prepped.schema(_)))
    // decoder snapshot captured on the DRIVER (the seam's contract):
    // programmatic registrations must reach executors on a real cluster
    val decoders = SampleDecoders.snapshot()
    prepped.mapPartitions { it: Iterator[Row] =>
      it.flatMap { r =>
        val kind = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val fp = kind match {
          // the opt-in kernels swap in the edit-exact hashes (mirror-
          // exact folded-DCT pHash / trim-and-volume-exact hot-band
          // audio hash) — all 64-bit, so the banded Hamming machinery
          // is unchanged either way
          case "image" =>
            if (phashImages) imagePHash(bytes) else imageDHash(bytes)
          case "audio" =>
            if (spectralAudio) audioSpectralHash(bytes)
            else audioFingerprint(bytes)
          case "video" =>
            if (temporalVideo) videoTemporalDHash(bytes, decoders)
            else videoDHash(bytes, decoders)
          case _       => None
        }
        fp.map(h => Row.fromSeq(
          Seq(r.get(0), kind, h) ++ (3 until r.length).map(r.get)))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** (media_id, dhash) for every decodable image — the same narrow-map
    * shape as [[extractFeatures]] (undecodable payloads drop; they have no
    * perceptual content to compare). */
  def imageDHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .transform(spreadForDecode)
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          imageDHash(bytes).map(h => (mid, h))
        }
      }
      .toDF("media_id", "dhash")
  }

  /** Near-duplicate IMAGE pairs: perceptual dHash per image (narrow map),
    * then the same banded 64-bit Hamming search the SimHash text path
    * uses ([[Dedup.hamming64Pairs]] — exhaustive for distance ≤ 7 by
    * pigeonhole). The multimodal twin of text near-dup: re-encoded,
    * recompressed, or lightly edited copies collide; unrelated images do
    * not.
    *
    * @return media_a, media_b (a < b), hamming */
  def imageNearDupPairs(
      media: DataFrame, maxHamming: Int = 7): DataFrame =
    Dedup.hamming64Pairs(
      imageDHashes(media)
        .select(col("media_id").as("doc_id"), col("dhash").as("sim_sig")),
      maxHamming)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))

  /** Fake a media table out of the documents corpus: payload = utf-8 bytes,
    * kind round-robined over image/audio/video. Real pipelines read payloads
    * straight off object storage as `binaryFile` / parquet binary columns —
    * the downstream plumbing is identical. */
  def asMediaTable(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id).cast("long").as("media_id"),
      when(col(id) % 3 === 0, "image")
        .when(col(id) % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col(text).cast("binary").as("bytes"))

  /** REAL ISO-BMFF (MP4/MOV family) metadata probe — a pure box-tree walk,
    * no native codec: `moov/mvhd` yields timescale+duration (both fullbox
    * versions), `moov/trak/tkhd` yields the first track's 16.16
    * fixed-point display dimensions. The dominant crawl container thus
    * gets REAL width/height/duration even though its H.264/VP9 SAMPLES
    * remain undecodable offline (frame decode stays behind the labeled
    * stub; an FFmpeg/JNI sample decoder would slot in without touching
    * this probe or any plan shape). Bounds-checked against truncated /
    * hostile payloads — a crawl probe must never throw on garbage. */
  object Mp4Probe {
    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def u64(b: Array[Byte], o: Int): Long =
      (u32(b, o) << 32) | u32(b, o + 4)
    private def boxType(b: Array[Byte], o: Int): String =
      new String(b, o + 4, 4, "US-ASCII")

    /** Iterate child boxes of [start, end); callback gets (type, payload
      * start, payload end). Malformed sizes terminate the walk. */
    private def walk(b: Array[Byte], start: Int, end: Int)(
        f: (String, Int, Int) => Unit): Unit = {
      var o = start
      while (o + 8 <= end) {
        val size0 = u32(b, o)
        val (size, hdr) =
          if (size0 == 1 && o + 16 <= end) (u64(b, o + 8), 16)
          else if (size0 == 0) ((end - o).toLong, 8)
          else (size0, 8)
        if (size < hdr || o + size > end) return
        f(boxType(b, o), o + hdr, o + size.toInt)
        o += size.toInt
      }
    }

    /** (width, height, duration_ms); None unless the payload opens with a
      * valid `ftyp` and carries a parseable `moov`. */
    def probe(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
      if (bytes.length < 12 || boxType(bytes, 0) != "ftyp") return None
      var w = 0; var h = 0; var durMs = -1L
      walk(bytes, 0, bytes.length) {
        case ("moov", ms, me) =>
          walk(bytes, ms, me) {
            case ("mvhd", ps, pe) if durMs < 0 =>
              val v = bytes(ps) & 0xff
              if (v == 0 && ps + 20 <= pe) {
                val ts = u32(bytes, ps + 12)
                if (ts > 0) durMs = u32(bytes, ps + 16) * 1000L / ts
              } else if (v == 1 && ps + 32 <= pe) {
                val ts = u32(bytes, ps + 20)
                if (ts > 0) durMs = u64(bytes, ps + 24) * 1000L / ts
              }
            case ("trak", ts0, te) if w == 0 =>
              walk(bytes, ts0, te) {
                case ("tkhd", ps, pe) if w == 0 =>
                  val v = bytes(ps) & 0xff
                  val wOff = if (v == 1) ps + 88 else ps + 76
                  if (wOff + 8 <= pe) {
                    val tw = (u32(bytes, wOff) >> 16).toInt
                    val th = (u32(bytes, wOff + 4) >> 16).toInt
                    if (tw > 0 && th > 0) { w = tw; h = th }
                  }
                case _ => ()
              }
            case _ => ()
          }
        case _ => ()
      }
      if (durMs >= 0 && w > 0) Some((w, h, durMs)) else None
    }
  }

  /** REAL FLAC metadata probe — parses the `fLaC` marker and the mandatory
    * STREAMINFO metadata block (first block by spec): sample rate (20
    * bits), channel count (3), and the 36-bit total-sample count, from
    * which the exact duration follows. The compressed-audio twin of
    * [[Mp4Probe]]: true metadata for a container whose SAMPLES need a
    * native codec (frame decode stays behind the labeled stub).
    * Bounds-checked; never throws on torn or hostile payloads. */
  object FlacProbe {
    /** (sampleRate, channels, durationMs); None unless the payload opens
      * with `fLaC` + a well-formed STREAMINFO. */
    def probe(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
      // "fLaC" + 4-byte block header + 34-byte STREAMINFO
      if (bytes.length < 42) return None
      if (bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a'
          || bytes(3) != 'C') return None
      if ((bytes(4) & 0x7f) != 0) return None // first block must be type 0
      val len = ((bytes(5) & 0xff) << 16) | ((bytes(6) & 0xff) << 8) |
        (bytes(7) & 0xff)
      if (len < 34 || bytes.length < 8 + 34) return None
      val o = 8
      val sr = ((bytes(o + 10) & 0xff) << 12) |
        ((bytes(o + 11) & 0xff) << 4) | ((bytes(o + 12) & 0xff) >> 4)
      val channels = ((bytes(o + 12) >> 1) & 0x7) + 1
      val total = ((bytes(o + 13) & 0x0fL) << 32) |
        ((bytes(o + 14) & 0xffL) << 24) | ((bytes(o + 15) & 0xffL) << 16) |
        ((bytes(o + 16) & 0xffL) << 8) | (bytes(o + 17) & 0xffL)
      if (sr <= 0) None
      else Some((sr, channels, total * 1000L / sr))
    }
  }

  /** REAL FLAC sample decode, pure JVM, for 16-bit fixed-blocksize
    * streams: ALL five subframe encodings — CONSTANT, VERBATIM,
    * FIXED (orders 0–4) and LPC (orders 1–32) with Rice/Rice2-coded
    * residual partitions (escape-to-raw included) — plus wasted-bits
    * shifts and the three stereo decorrelation modes (left/side,
    * right/side, mid/side; the side channel carries bps+1 bits per the
    * format spec). Frame headers are fully validated — sync, codes,
    * UTF-8 frame number, CRC-8 — and the trailing CRC-16 is checked per
    * frame after re-aligning to the byte boundary, so a corrupted
    * payload returns None rather than garbage samples; decoded values
    * outside the declared bit depth are likewise rejected.
    *
    * This closes the FLAC half of the compressed-audio sample gap
    * outright (no labeled-stub fallback remains for conformant 16-bit
    * streams): [[audioStats]] / [[AudioCodec.decode]] (fingerprints,
    * features) consume the decoded PCM transparently. The remaining
    * native-codec boundary is MP4/WebM/MP3 sample synthesis. */
  object FlacCodec {

    /** MSB-first bit cursor over `b` starting at byte `bytePos`. Reads
      * past the array throw (caught by [[decodeSamples]] → None). */
    private[operators] final class BitReader(
        b: Array[Byte], var bytePos: Int) {
      private var bitPos = 0
      def readBit(): Int = {
        val v = (b(bytePos) >> (7 - bitPos)) & 1
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        v
      }
      /** n ∈ [0, 32] unsigned bits, MSB first. */
      def readBits(n: Int): Int = {
        var v = 0L
        var i = 0
        while (i < n) { v = (v << 1) | readBit(); i += 1 }
        v.toInt
      }
      /** Zero bits until (and consuming) the terminating 1 bit. */
      def readUnary(): Int = {
        var q = 0
        while (readBit() == 0) q += 1
        q
      }
      /** Drop to the next byte boundary (frame CRC-16 alignment). */
      def alignByte(): Unit =
        if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    }

    private def signExtend(v: Int, bits: Int): Int =
      (v << (32 - bits)) >> (32 - bits)

    /** Rice/Rice2 residual partitions into `x(order until n)`; false on a
      * malformed partition layout or reserved coding method. */
    private def readResiduals(
        br: BitReader, n: Int, order: Int, x: Array[Int]): Boolean = {
      val method = br.readBits(2)
      if (method > 1) return false
      val pbits = if (method == 0) 4 else 5
      val escape = (1 << pbits) - 1
      val po = br.readBits(4)
      val parts = 1 << po
      if (n % parts != 0) return false
      val per = n / parts
      if (per <= order && parts == 1) return false
      if (per < order && parts > 1) return false
      var idx = order
      var p = 0
      while (p < parts) {
        val cnt = if (p == 0) per - order else per
        val param = br.readBits(pbits)
        if (param == escape) {
          val raw = br.readBits(5)
          var i = 0
          while (i < cnt) {
            x(idx) = if (raw == 0) 0 else signExtend(br.readBits(raw), raw)
            idx += 1; i += 1
          }
        } else {
          var i = 0
          while (i < cnt) {
            val q = br.readUnary().toLong
            val r = if (param == 0) 0 else br.readBits(param)
            val u = (q << param) | (r & 0xffffffffL)
            x(idx) = ((u >>> 1) ^ -(u & 1L)).toInt
            idx += 1; i += 1
          }
        }
        p += 1
      }
      true
    }

    /** One subframe (header + payload) into a fresh n-array of samples at
      * `bps` effective depth; None on reserved/invalid encodings. */
    private def readSubframe(
        br: BitReader, n: Int, bps: Int): Option[Array[Int]] = {
      if (br.readBit() != 0) return None // mandatory zero pad bit
      val typ = br.readBits(6)
      val wasted =
        if (br.readBit() == 1) br.readUnary() + 1 else 0
      val eff = bps - wasted
      if (eff <= 0 || eff > 17) return None
      val x = new Array[Int](n)
      typ match {
        case 0 => // CONSTANT
          val v = signExtend(br.readBits(eff), eff)
          java.util.Arrays.fill(x, v)
        case 1 => // VERBATIM
          var i = 0
          while (i < n) { x(i) = signExtend(br.readBits(eff), eff); i += 1 }
        case t if t >= 8 && t <= 12 => // FIXED, order = t - 8
          val order = t - 8
          if (order > n) return None
          var i = 0
          while (i < order) {
            x(i) = signExtend(br.readBits(eff), eff); i += 1
          }
          if (!readResiduals(br, n, order, x)) return None
          // polynomial predictors from the format spec §FIXED
          order match {
            case 0 => ()
            case 1 =>
              var i = 1
              while (i < n) { x(i) += x(i - 1); i += 1 }
            case 2 =>
              var i = 2
              while (i < n) { x(i) += 2 * x(i - 1) - x(i - 2); i += 1 }
            case 3 =>
              var i = 3
              while (i < n) {
                x(i) += 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3); i += 1
              }
            case _ =>
              var i = 4
              while (i < n) {
                x(i) += 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) -
                  x(i - 4)
                i += 1
              }
          }
        case t if t >= 32 => // LPC, order = (t & 31) + 1
          val order = (t & 0x1f) + 1
          if (order > n) return None
          var i = 0
          while (i < order) {
            x(i) = signExtend(br.readBits(eff), eff); i += 1
          }
          val precM1 = br.readBits(4)
          if (precM1 == 15) return None // reserved
          val prec = precM1 + 1
          val shift = signExtend(br.readBits(5), 5)
          if (shift < 0) return None // negative shifts are spec-invalid
          val coefs = new Array[Int](order)
          var j = 0
          while (j < order) {
            coefs(j) = signExtend(br.readBits(prec), prec); j += 1
          }
          if (!readResiduals(br, n, order, x)) return None
          i = order
          while (i < n) {
            var acc = 0L
            var j = 0
            while (j < order) { acc += coefs(j).toLong * x(i - 1 - j); j += 1 }
            x(i) += (acc >> shift).toInt
            i += 1
          }
        case _ => return None // 2–7, 13–31 are reserved
      }
      if (wasted > 0) {
        var i = 0
        while (i < n) { x(i) <<= wasted; i += 1 }
      }
      Some(x)
    }

    private[graft] def crc8(
        b: Array[Byte], from: Int, until: Int): Int = {
      var crc = 0
      var i = from
      while (i < until) {
        crc ^= b(i) & 0xff
        var k = 0
        while (k < 8) {
          crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
            else (crc << 1) & 0xff
          k += 1
        }
        i += 1
      }
      crc
    }

    private[graft] def crc16(
        b: Array[Byte], from: Int, until: Int): Int = {
      var crc = 0
      var i = from
      while (i < until) {
        crc ^= (b(i) & 0xff) << 8
        var k = 0
        while (k < 8) {
          crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
            else (crc << 1) & 0xffff
          k += 1
        }
        i += 1
      }
      crc
    }

    /** Decoded stream: (sampleRate, channels, interleaved 16-bit PCM).
      * None when the payload is not FLAC, any frame uses an encoding
      * outside the CONSTANT/VERBATIM/16-bit subset, or any CRC fails. */
    def decodeSamples(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] =
      try decodeOrNull(bytes)
      catch { case scala.util.control.NonFatal(_) => None }

    private def decodeOrNull(
        bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
      val meta = FlacProbe.probe(bytes)
      if (meta.isEmpty) return None
      val (sr, channels, _) = meta.get
      // bits-per-sample straight from STREAMINFO (probe exposes ms only)
      val bps = (((bytes(8 + 12) & 0x01) << 4) |
        ((bytes(8 + 13) & 0xf0) >> 4)) + 1
      if (bps != 16) return None
      val total = ((bytes(8 + 13) & 0x0fL) << 32) |
        ((bytes(8 + 14) & 0xffL) << 24) | ((bytes(8 + 15) & 0xffL) << 16) |
        ((bytes(8 + 16) & 0xffL) << 8) | (bytes(8 + 17) & 0xffL)
      if (total <= 0 || total > (1L << 31) / math.max(1, channels))
        return None
      // skip metadata blocks to the first frame
      var o = 4
      var last = false
      while (!last) {
        if (o + 4 > bytes.length) return None
        last = (bytes(o) & 0x80) != 0
        val len = ((bytes(o + 1) & 0xff) << 16) |
          ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
        o += 4 + len
      }
      val out = new Array[Short]((total * channels).toInt)
      var written = 0L
      while (written < total) {
        val frameStart = o
        if (o + 4 > bytes.length) return None
        // 14-bit sync + mandatory-zero + blocking-strategy(0 = fixed)
        if ((bytes(o) & 0xff) != 0xff || (bytes(o + 1) & 0xfc) != 0xf8)
          return None
        val bsCode = (bytes(o + 2) & 0xf0) >> 4
        val srCode = bytes(o + 2) & 0x0f
        val chCode = (bytes(o + 3) & 0xf0) >> 4
        val ssCode = (bytes(o + 3) & 0x0e) >> 1
        // 0–7: independent; 8/9/10: left-side / right-side / mid-side
        if (chCode <= 7) { if (chCode != channels - 1) return None }
        else if (chCode <= 10) { if (channels != 2) return None }
        else return None
        if (ssCode != 0x4) return None          // 16-bit only
        o += 4
        // UTF-8-coded frame number (≤ 36 bits over ≤ 7 bytes)
        val first = bytes(o) & 0xff
        val extra =
          if (first < 0x80) 0
          else Integer.numberOfLeadingZeros(~(first << 24)) - 1
        o += 1 + extra
        val blockSize = bsCode match {
          case 0x1 => 192
          case c if c >= 0x2 && c <= 0x5 => 576 << (c - 2)
          case 0x6 => { val v = (bytes(o) & 0xff) + 1; o += 1; v }
          case 0x7 =>
            val v = (((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)) + 1
            o += 2; v
          case c if c >= 0x8 => 256 << (c - 8)
          case _ => return None // 0000 is reserved
        }
        srCode match {
          case 0xc => o += 1
          case 0xd | 0xe => o += 2
          case 0xf => return None
          case _ => () // table / STREAMINFO codes carry no bytes
        }
        if (crc8(bytes, frameStart, o) != (bytes(o) & 0xff)) return None
        o += 1
        val n = math.min(blockSize.toLong, total - written).toInt
        if (n != blockSize) return None // header must state the true size
        val br = new BitReader(bytes, o)
        // per-channel decode: the side channel of a decorrelated pair
        // carries one extra bit (format spec §frame header)
        val chans = new Array[Array[Int]](channels)
        var ch = 0
        while (ch < channels) {
          val side = (chCode == 8 && ch == 1) ||
            (chCode == 9 && ch == 0) || (chCode == 10 && ch == 1)
          chans(ch) = readSubframe(br, n, if (side) 17 else 16)
            .getOrElse(return None)
          ch += 1
        }
        // undo stereo decorrelation in place (chans(0)=L, chans(1)=R)
        if (chCode >= 8) {
          val a = chans(0); val b = chans(1)
          var i = 0
          chCode match {
            case 8 => // left + side → right = left − side
              while (i < n) { b(i) = a(i) - b(i); i += 1 }
            case 9 => // side + right → left = right + side
              while (i < n) {
                val s = a(i); a(i) = b(i) + s; i += 1
              }
            case _ => // mid + side
              while (i < n) {
                val m = (a(i) << 1) | (b(i) & 1)
                val s = b(i)
                a(i) = (m + s) >> 1
                b(i) = (m - s) >> 1
                i += 1
              }
          }
        }
        var c2 = 0
        while (c2 < channels) {
          val xs = chans(c2)
          var i = 0
          while (i < n) {
            val v = xs(i)
            if (v < Short.MinValue || v > Short.MaxValue) return None
            out(((written + i) * channels + c2).toInt) = v.toShort
            i += 1
          }
          c2 += 1
        }
        br.alignByte()
        o = br.bytePos
        if (o + 2 > bytes.length) return None
        val crc = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
        if (crc16(bytes, frameStart, o) != crc) return None
        o += 2
        written += n
      }
      Some((sr, channels, out))
    }
  }

  /** REAL MPEG-1 Layer III (MP3) frame walk: validates the 11-bit sync +
    * version/layer bits of each frame header, sizes every frame from the
    * public bitrate/sample-rate tables (144·bitrate/rate + padding), and
    * counts frames to the exact CBR duration (1152 samples per MPEG-1
    * Layer III frame). A frame WALK, not a sample decode — Huffman
    * synthesis needs a native codec and stays behind the labeled stub,
    * exactly the [[Mp4Probe]]/[[FlacProbe]] split. Tolerates leading junk
    * up to the first sync (ID3v2 tags etc. skipped by scan); bails to
    * None when fewer than 2 valid consecutive frames parse (random bytes
    * frequently contain one spurious sync). */
  object Mp3Probe {
    // MPEG-1 Layer III bitrate table (kbps), index 1..14
    private val Bitrates = Array(
      0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
    private val SampleRates = Array(44100, 48000, 32000, 0)

    /** Frame byte length at `o`, or -1 when no valid MPEG-1 L3 header. */
    private def frameLen(b: Array[Byte], o: Int): Int = {
      if (o + 4 > b.length) return -1
      if ((b(o) & 0xff) != 0xff || (b(o + 1) & 0xe0) != 0xe0) return -1
      val version = (b(o + 1) >> 3) & 0x3   // 3 = MPEG-1
      val layer = (b(o + 1) >> 1) & 0x3     // 1 = Layer III
      if (version != 3 || layer != 1) return -1
      val brIdx = (b(o + 2) >> 4) & 0xf
      val srIdx = (b(o + 2) >> 2) & 0x3
      val padding = (b(o + 2) >> 1) & 0x1
      val br = Bitrates(brIdx)
      val sr = SampleRates(srIdx)
      if (br == 0 || sr == 0) return -1
      144 * br * 1000 / sr + padding
    }

    /** (sampleRate, frameCount, durationMs); None unless ≥2 consecutive
      * valid frames parse from the first sync. */
    def probe(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
      var start = 0
      while (start + 4 <= bytes.length && frameLen(bytes, start) < 0)
        start += 1
      if (start + 4 > bytes.length) return None
      val sr = SampleRates((bytes(start + 2) >> 2) & 0x3)
      var o = start
      var frames = 0
      while (o + 4 <= bytes.length) {
        val len = frameLen(bytes, o)
        if (len < 0) {
          if (frames >= 2)
            return Some((sr, frames, frames * 1152L * 1000L / sr))
          return None
        }
        frames += 1
        o += len
      }
      if (frames >= 2) Some((sr, frames, frames * 1152L * 1000L / sr))
      else None
    }

    /** The MP3 twin of [[Mp4Samples.sampleTable]]/[[WebmBlocks.blockTable]]:
      * one [[SampleRef]] per validated frame — absolute byte range and the
      * 1152-samples-per-frame clock. `keyframe` is true on every frame
      * (MPEG audio frames are container-independent; the bit-reservoir
      * back-reference is the DECODER's concern, which is why the audio
      * seam hands a decoder the whole ref sequence in order). Returns
      * (sampleRate, channels, refs); None under the same ≥2-consecutive-
      * frames rule as [[probe]]. */
    def frameTable(
        bytes: Array[Byte]): Option[(Int, Int, Seq[SampleRef])] = {
      var start = 0
      while (start + 4 <= bytes.length && frameLen(bytes, start) < 0)
        start += 1
      if (start + 4 > bytes.length) return None
      val sr = SampleRates((bytes(start + 2) >> 2) & 0x3)
      // channel mode bits 6-7 of byte 3: 3 = single channel
      val channels = if (((bytes(start + 3) >> 6) & 0x3) == 3) 1 else 2
      val out = Seq.newBuilder[SampleRef]
      var o = start
      var f = 0
      var done = false
      while (!done && o + 4 <= bytes.length) {
        val len = frameLen(bytes, o)
        // a header whose sized frame extends past EOF (crawl-truncated
        // file) is NOT emitted: every ref must honor the seam's
        // [offset, offset + size) ⊆ payload contract
        if (len < 0 || o + len > bytes.length) done = true
        else {
          out += SampleRef(f, o.toLong, len.toLong,
            f.toLong * 1152L * 1000L / sr, keyframe = true)
          f += 1
          o += len
        }
      }
      if (f >= 2) Some((sr, channels, out.result())) else None
    }
  }

  /** REAL WebM/Matroska (EBML) metadata probe — varint-framed element
    * walk, no native codec: `Segment/Info` yields TimestampScale +
    * Duration, `Segment/Tracks/TrackEntry/Video` yields
    * PixelWidth/PixelHeight. Completes the compressed-video container
    * pair next to [[Mp4Probe]] (VP8/VP9/AV1 SAMPLES stay behind the
    * labeled stub). Bounds-checked; unknown-size elements (all-ones
    * varint) extend to the parent's end per spec; never throws on torn
    * or hostile payloads. */
  object WebmProbe {
    /** (value, byteLen) of the EBML varint at `o`; ids keep the marker
      * bit (`keepMarker = true`), sizes strip it. (-1, 0) on malformed. */
    private[operators] def varint(
        b: Array[Byte], o: Int, keepMarker: Boolean): (Long, Int) = {
      if (o >= b.length) return (-1L, 0)
      val fb = b(o) & 0xff
      var len = 1
      var mask = 0x80
      while (mask != 0 && (fb & mask) == 0) { len += 1; mask >>= 1 }
      if (mask == 0 || o + len > b.length) return (-1L, 0)
      var v: Long = if (keepMarker) fb else fb & (mask - 1)
      var i = 1
      while (i < len) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      (v, len)
    }

    /** All-ones size payload = unknown size (extends to parent end). */
    private def isUnknown(size: Long, len: Int): Boolean =
      size == (1L << (7 * len)) - 1

    /** Walk child elements of [start, end); f(id, payloadStart,
      * payloadEnd). Malformed framing terminates the walk quietly. */
    private[operators] def walk(b: Array[Byte], start: Int, end: Int)(
        f: (Long, Int, Int) => Unit): Unit = {
      var o = start
      while (o < end) {
        val (id, il) = varint(b, o, keepMarker = true)
        if (il == 0) return
        val (sz, sl) = varint(b, o + il, keepMarker = false)
        if (sl == 0) return
        val ps = o + il + sl
        val pe =
          if (isUnknown(sz, sl)) end
          else if (ps + sz > end || sz < 0) return
          else ps + sz.toInt
        f(id, ps, pe)
        o = pe
      }
    }

    private[operators] def uint(b: Array[Byte], s: Int, e: Int): Long = {
      var v = 0L
      var i = s
      while (i < e && i - s < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
      v
    }

    private def float64(b: Array[Byte], s: Int, e: Int): Double =
      if (e - s == 4)
        java.lang.Float.intBitsToFloat(uint(b, s, e).toInt).toDouble
      else if (e - s == 8) java.lang.Double.longBitsToDouble(uint(b, s, e))
      else Double.NaN

    /** (width, height, duration_ms); None unless the payload opens with
      * an EBML header and carries parseable Segment Info + video track. */
    def probe(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
      val (firstId, _) = varint(bytes, 0, keepMarker = true)
      if (firstId != 0x1A45DFA3L) return None
      var w = 0; var h = 0
      var scaleNs = 1000000L // EBML default: 1 ms per tick
      var durTicks = Double.NaN
      walk(bytes, 0, bytes.length) {
        case (0x18538067L, ss, se) => // Segment
          walk(bytes, ss, se) {
            case (0x1549A966L, is, ie) => // Info
              walk(bytes, is, ie) {
                case (0x2AD7B1L, ps, pe) => scaleNs = uint(bytes, ps, pe)
                case (0x4489L, ps, pe) => durTicks = float64(bytes, ps, pe)
                case _ => ()
              }
            case (0x1654AE6BL, ts, te) => // Tracks
              walk(bytes, ts, te) {
                case (0xAEL, es, ee) if w == 0 => // TrackEntry
                  walk(bytes, es, ee) {
                    case (0xE0L, vs, ve) => // Video
                      walk(bytes, vs, ve) {
                        case (0xB0L, ps, pe) =>
                          w = uint(bytes, ps, pe).toInt
                        case (0xBAL, ps, pe) =>
                          h = uint(bytes, ps, pe).toInt
                        case _ => ()
                      }
                    case _ => ()
                  }
                case _ => ()
              }
            case _ => ()
          }
        case _ => ()
      }
      if (w > 0 && h > 0 && !durTicks.isNaN && scaleNs > 0)
        Some((w, h, (durTicks * scaleNs / 1e6).toLong))
      else None
    }
  }

  /** REAL Matroska/WebM block walk — the per-frame companion of
    * [[WebmProbe]] and the EBML twin of [[Mp4Samples]]: Clusters resolved
    * into one row per SimpleBlock with its absolute frame-byte range,
    * absolute timestamp (cluster timestamp + the block's signed relative
    * offset, over the Info TimestampScale), and the header keyframe flag.
    * Keyframe byte ranges feed an external decoder or a range fetcher
    * without touching the (undecodable-offline) VP8/VP9 samples.
    * Container math only; malformed framing degrades to fewer blocks,
    * never a throw. */
  object WebmBlocks {
    /** One SimpleBlock: file-order index, absolute frame-data byte
      * offset + size (past the 4-byte block header), absolute ts in ms,
      * keyframe flag from the block header. */
    final case class Block(
        idx: Int, offset: Long, size: Long, tsMs: Long, keyframe: Boolean)

    /** None unless the payload opens with an EBML header; blocks of the
      * FIRST track only (the probe's single-video-track model). */
    def blockTable(bytes: Array[Byte]): Option[Seq[Block]] = try {
      val (firstId, _) = WebmProbe.varint(bytes, 0, keepMarker = true)
      if (firstId != 0x1A45DFA3L) return None
      // resolve TimestampScale in a FIRST pass over the Segment (the
      // Mp4Samples mdhd pattern): Matroska allows the Info element to
      // follow the Clusters, and applying the scale in file-walk order
      // would stamp earlier clusters with the default 1 ms tick — wrong
      // absolute timestamps rather than a graceful degrade
      var scaleNs = 1000000L
      WebmProbe.walk(bytes, 0, bytes.length) {
        case (0x18538067L, ss, se) => // Segment
          WebmProbe.walk(bytes, ss, se) {
            case (0x1549A966L, is, ie) => // Info
              WebmProbe.walk(bytes, is, ie) {
                case (0x2AD7B1L, ps, pe) =>
                  scaleNs = WebmProbe.uint(bytes, ps, pe)
                case _ => ()
              }
            case _ => ()
          }
        case _ => ()
      }
      val out = Vector.newBuilder[Block]
      var idx = 0
      WebmProbe.walk(bytes, 0, bytes.length) {
        case (0x18538067L, ss, se) => // Segment
          WebmProbe.walk(bytes, ss, se) {
            case (0x1F43B675L, cs, ce) => // Cluster
              var clusterTicks = 0L
              WebmProbe.walk(bytes, cs, ce) {
                case (0xE7L, ps, pe) =>
                  clusterTicks = WebmProbe.uint(bytes, ps, pe)
                case (0xA3L, ps, pe) => // SimpleBlock
                  val (track, tl) =
                    WebmProbe.varint(bytes, ps, keepMarker = false)
                  if (track == 1 && tl > 0 && ps + tl + 3 <= pe) {
                    val rel = (((bytes(ps + tl) & 0xff) << 8) |
                      (bytes(ps + tl + 1) & 0xff)).toShort.toLong
                    val flags = bytes(ps + tl + 2) & 0xff
                    val dataStart = ps + tl + 3
                    if (scaleNs > 0 && dataStart <= pe) {
                      out += Block(idx, dataStart, pe - dataStart,
                        (clusterTicks + rel) * scaleNs / 1000000L,
                        (flags & 0x80) != 0)
                      idx += 1
                    }
                  }
                case _ => ()
              }
            case _ => ()
          }
        case _ => ()
      }
      val blocks = out.result()
      if (blocks.isEmpty) None else Some(blocks)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[WebmBlocks.blockTable]] as a narrow operator — one row per
    * SimpleBlock with its byte range, clock, and keyframe flag (q_m24
    * certifies ts/size/keyframe in closed form; absolute offsets are
    * pinned against the actual frame bytes in WebmBlocksSpec). Non-WebM
    * payloads emit nothing. */
  def webmBlockTable(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          WebmBlocks.blockTable(bytes).toSeq.flatten.map { b =>
            (mid, b.idx, b.offset, b.size, b.tsMs, b.keyframe)
          }
        }
      }
      .toDF("media_id", "block_idx", "offset", "size", "ts_ms", "keyframe")
  }

  /** [[Mp3Probe.frameTable]] as a narrow operator — the MP3 twin of
    * [[mp4SampleTable]]/[[webmBlockTable]]: one row per validated frame
    * with its absolute byte range, the 1152-samples-per-frame clock, and
    * the stream's (sample_rate, channels). These are exactly the ranges
    * the [[AudioSampleDecoder]] seam consumes; q_m30 certifies the whole
    * table in closed form over the synthetic corpus. Non-MP3 payloads
    * emit nothing.
    *
    * @return media_id, frame_idx, offset, size, ts_ms, sample_rate,
    *         channels */
  def mp3FrameTable(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          Mp3Probe.frameTable(bytes).toSeq.flatMap { case (sr, ch, refs) =>
            refs.map(r => (mid, r.idx, r.offset, r.size, r.tsMs, sr, ch))
          }
        }
      }
      .toDF("media_id", "frame_idx", "offset", "size", "ts_ms",
        "sample_rate", "channels")
  }

  /** (media_id, sample_rate, n_frames, duration_ms) for every payload the
    * [[Mp3Probe]] frame walk recognizes — same narrow-map shape as every
    * decode. */
  def mp3Meta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .transform(spreadForDecode)
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          Mp3Probe.probe(bytes).map { case (sr, n, d) => (mid, sr, n, d) }
        }
      }
      .toDF("media_id", "sample_rate", "n_frames", "duration_ms")
  }

  /** (media_id, sample_rate, channels, duration_ms) for every payload the
    * [[FlacProbe]] recognizes — same narrow-map shape as every decode. */
  def flacMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .transform(spreadForDecode)
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          FlacProbe.probe(bytes).map { case (sr, ch, d) => (mid, sr, ch, d) }
        }
      }
      .toDF("media_id", "sample_rate", "channels", "duration_ms")
  }

  /** Compressed-audio frame refs for the [[AudioSampleDecoder]] seam:
    * (container, sampleRate, channels, refs). MP3 today; more as frame
    * walkers land. FLAC deliberately absent — it decodes fully offline
    * through [[FlacCodec]] before the seam is consulted. */
  def audioFrameRefs(
      bytes: Array[Byte]): Option[(String, Int, Int, Seq[SampleRef])] =
    Mp3Probe.frameTable(bytes).map { case (sr, ch, refs) =>
      ("mp3", sr, ch, refs)
    }

  /** Audio through the decoder seam: frame ranges from the container
    * walk, PCM from the first claiming [[AudioSampleDecoder]], features
    * from the SAME band/RMS reduction every other decoded-audio source
    * uses — so a plugged-in MP3 codec yields features arithmetic-
    * identical to what the offline FLAC path would produce for the same
    * samples, and the REAL duration comes from the decoded sample count.
    * None when nothing claims the container (callers then fall back to
    * their labeled stub). */
  private def audioSeamDecode(
      bytes: Array[Byte], featureDim: Int,
      decoders: Seq[AudioSampleDecoder])
      : Option[(Int, Int, Long, Array[Float])] =
    audioFrameRefs(bytes).flatMap { case (container, sr, ch, refs) =>
      AudioSampleDecoders.forContainer(container, decoders).flatMap { dec =>
        val out = Array.newBuilder[Short]
        refs.foreach(r => dec.decodeFrame(bytes, r).foreach(out ++= _))
        val ss = out.result()
        AudioCodec.pcmFeatures(sr, ch, ss, featureDim).map {
          case (durMs, feats) => (0, 0, durMs, feats)
        }
      }
    }

  /** Partition-parallel decode + feature extraction. Narrow map — no
    * shuffle; at 100 TB this pipelines inside the scan stage with one
    * decoder instantiation per partition (the `it => ...` closure), not per
    * row. */
  def extractFeatures(media: DataFrame, featureDim: Int = 8)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    // captured on the DRIVER: programmatic registrations reach executors
    val audioDecoders = AudioSampleDecoders.snapshot()
    media
      // decode is per-row heavy: spread a compact source across all cores
      .transform(spreadForDecode)
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (JNI handles etc.)
        it.map { case (mediaId, kind, bytes) =>
          val decoded = kind match {
            case "image" =>
              ImageCodec.decode(bytes, featureDim).map { case (w, h, f) =>
                (w, h, 0L, f)
              }
            case "audio" =>
              AudioCodec.decode(bytes, featureDim).map { case (d, f) =>
                (0, 0, d, f)
              }.orElse(
                // the AudioSampleDecoder seam: MP3 frame ranges + a
                // registered codec → real PCM features (nothing claims
                // the container → fall through to the labeled stub)
                audioSeamDecode(bytes, featureDim, audioDecoders)
              ).orElse(
                // AudioCodec already tried the FLAC sample decode
                // (CONSTANT/VERBATIM subframes). What lands here: Rice-
                // coded FLAC and unclaimed MP3 — REAL duration from
                // STREAMINFO / the frame walk, features the labeled stub
                // (residual synthesis needs a native codec)
                FlacProbe.probe(bytes).map(_._3)
                  .orElse(Mp3Probe.probe(bytes).map(_._3))
                  .map { d =>
                    (0, 0, d,
                      StubDecoder.decode("audio", bytes, featureDim)._4)
                  })
            case "video" =>
              VideoCodec.decode(bytes, featureDim)
                // MJPEG-AVI: fully real — container walk + per-frame
                // JPEG decode, same temporal-band luma reduction
                .orElse(AviCodec.decode(bytes, featureDim))
                .orElse(
                  // MP4/WebM: REAL metadata from the container walk; the
                  // feature vector stays the labeled stub (samples
                  // undecodable offline)
                  Mp4Probe.probe(bytes)
                    .orElse(WebmProbe.probe(bytes))
                    .map { case (w, h, d) =>
                      (w, h, d,
                        StubDecoder.decode("video", bytes, featureDim)._4)
                    })
            case _ => None
          }
          decoded match {
            case Some((w, h, d, feats)) =>
              MediaFeatures(mediaId, kind, bytes.length.toLong, w, h, d, feats)
            case None =>
              // bytes no codec recognizes (every recognized format — PNG/
              // JPEG/GIF/BMP, PCM WAV/AIFF/AU, Y4M, MP4 metadata — takes a
              // real path)
              val (w, h, d, feats) = StubDecoder.decode(kind, bytes, featureDim)
              MediaFeatures(mediaId, kind, bytes.length.toLong, w, h, d, feats)
          }
        }
      }
  }

  /** Real audio decode via the JDK's `javax.sound.sampled` — WAV/AIFF/AU
    * PCM needs no external codec even offline. Emits the true duration
    * (frame count over frame rate) and `featureDim` time-band RMS
    * amplitudes normalized to [0,1] (channels pooled) — a deterministic
    * pure-arithmetic reduction of the decoded samples. Only 16-bit signed
    * PCM is handled (the dominant WAV layout); anything else returns None
    * and falls back to the labeled stub. */
  object AudioCodec {

    /** (durationMs, time-band RMS features) from interleaved 16-bit PCM —
      * the one reduction every decoded-audio source shares (javax.sound
      * PCM, offline FLAC, and seam-decoded frames all land here, so
      * features are arithmetic-identical regardless of the codec). */
    private[operators] def pcmFeatures(
        sr: Int, channels: Int, ss: Array[Short],
        featureDim: Int): Option[(Long, Array[Float])] = {
      val frames = ss.length.toLong / channels
      if (frames == 0) None
      else {
        val durationMs = frames * 1000L / sr
        val sums = new Array[Double](featureDim)
        val counts = new Array[Long](featureDim)
        var i = 0
        while (i < ss.length) {
          val s = ss(i)
          val band = math.min(featureDim - 1,
            ((i / channels).toLong * featureDim / frames).toInt)
          sums(band) += s.toDouble * s.toDouble
          counts(band) += 1
          i += 1
        }
        val feats = Array.tabulate(featureDim) { b =>
          if (counts(b) == 0) 0f
          else (math.sqrt(sums(b) / counts(b)) / 32768.0).toFloat
        }
        Some((durationMs, feats))
      }
    }

    /** None when the payload is not a recognizable 16-bit PCM audio file. */
    def decode(bytes: Array[Byte], featureDim: Int)
        : Option[(Long, Array[Float])] = {
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case scala.util.control.NonFatal(_) => null
        }
      if (ais == null) FlacCodec.decodeSamples(bytes).flatMap {
        case (sr, channels, ss) => pcmFeatures(sr, channels, ss, featureDim)
      }
      else {
        try {
          val fmt = ais.getFormat
          // frame rate must be strictly positive: AudioSystem.NOT_SPECIFIED
          // is -1f, which would otherwise produce a negative duration
          val ok = fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && ais.getFrameLength > 0 &&
            fmt.getFrameRate > 0f
          if (!ok) None
          else {
            val frames = ais.getFrameLength
            val durationMs = frames * 1000L / math.round(fmt.getFrameRate)
            val raw = ais.readAllBytes()
            val channels = fmt.getChannels
            val nSamples = raw.length / 2
            val sums = new Array[Double](featureDim)
            val counts = new Array[Long](featureDim)
            var i = 0
            while (i < nSamples) {
              val lo = raw(2 * i) & 0xFF
              val hi = raw(2 * i + 1) & 0xFF
              val s =
                if (fmt.isBigEndian) ((raw(2 * i) << 8) | hi).toShort
                else ((raw(2 * i + 1) << 8) | lo).toShort
              // pooled channels: frame index drives the band
              val band = math.min(featureDim - 1,
                ((i / channels).toLong * featureDim / frames).toInt)
              sums(band) += s.toDouble * s.toDouble
              counts(band) += 1
              i += 1
            }
            val feats = Array.tabulate(featureDim) { b =>
              if (counts(b) == 0) 0f
              else (math.sqrt(sums(b) / counts(b)) / 32768.0).toFloat
            }
            Some((durationMs, feats))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
        finally ais.close()
      }
    }
  }

  /** Real video decode for the Y4M (YUV4MPEG2) container — a public,
    * self-describing format (one text header + `FRAME`-delimited raw planar
    * YUV) parseable without native codecs, so the VIDEO path works offline
    * end-to-end: true dimensions from the header, duration from the frame
    * count over the header's F<num>:<den> rate, features as temporal-band
    * mean luma of the decoded Y planes, and genuine frame extraction
    * (BT.601 limited-range YUV→RGB → PNG). Compressed containers (mp4/webm)
    * would slot in behind the same three entry points via FFmpeg/JNI;
    * nothing Spark-side changes. Supported colorspaces: C420 family
    * (C420/C420jpeg/C420mpeg2/C420paldv), C444, Cmono. */
  object VideoCodec {
    final case class Meta(
        width: Int, height: Int, fpsNum: Int, fpsDen: Int,
        chroma: String, dataStart: Int) {
      def ySize: Int = width * height
      def frameSize: Int = chroma match {
        case "mono" => ySize
        case "444"  => ySize * 3
        case _      => ySize + 2 * ((width / 2) * (height / 2)) // 420
      }
    }

    private val Magic = "YUV4MPEG2".getBytes("US-ASCII")

    /** None unless the payload starts with a well-formed Y4M stream header
      * in a supported colorspace. */
    def parseHeader(bytes: Array[Byte]): Option[Meta] = {
      if (bytes.length < Magic.length + 1) return None
      var i = 0
      while (i < Magic.length) {
        if (bytes(i) != Magic(i)) return None
        i += 1
      }
      val nl = bytes.indexOf('\n'.toByte)
      if (nl < 0) return None
      val header = new String(bytes, 0, nl, "US-ASCII")
      var w = -1; var h = -1; var num = -1; var den = -1
      var chroma = "420" // Y4M default when no C tag is present
      header.split(' ').iterator.drop(1).filter(_.nonEmpty).foreach { tok =>
        try {
          tok.charAt(0) match {
            case 'W' => w = tok.substring(1).toInt
            case 'H' => h = tok.substring(1).toInt
            case 'F' =>
              val Array(n, d) = tok.substring(1).split(':')
              num = n.toInt; den = d.toInt
            case 'C' =>
              chroma = tok.substring(1) match {
                case s if s.startsWith("420") => "420"
                case "444"                    => "444"
                case "mono"                   => "mono"
                case _                        => return None // 422 etc.
              }
            case _ => () // I/A/X tags: irrelevant to decode
          }
        } catch { case scala.util.control.NonFatal(_) => return None }
      }
      if (w <= 0 || h <= 0 || num <= 0 || den <= 0) None
      else if (chroma == "420" && ((w % 2) != 0 || (h % 2) != 0)) None
      else Some(Meta(w, h, num, den, chroma, nl + 1))
    }

    /** Start offsets of each frame's pixel data (after its FRAME line).
      * Per-frame parameter tags make the frame header variable-length, so
      * offsets are found by scanning, not arithmetic. */
    private[operators] def frameDataOffsets(
        bytes: Array[Byte], m: Meta): Iterator[Int] =
      new Iterator[Int] {
        private val fsize = m.frameSize
        private var pos = m.dataStart
        private var nextOff = advance()
        private def advance(): Int = {
          // expect "FRAME" then optional params then '\n'
          if (pos + 5 > bytes.length) return -1
          if (bytes(pos) != 'F' || bytes(pos + 1) != 'R' ||
            bytes(pos + 2) != 'A' || bytes(pos + 3) != 'M' ||
            bytes(pos + 4) != 'E') return -1
          var i = pos + 5
          while (i < bytes.length && bytes(i) != '\n') i += 1
          if (i >= bytes.length || i + 1 + fsize > bytes.length) -1
          else { pos = i + 1 + fsize; i + 1 }
        }
        def hasNext: Boolean = nextOff >= 0
        def next(): Int = { val r = nextOff; nextOff = advance(); r }
      }

    /** Full-stream decode: (width, height, durationMs, temporal-band mean
      * luma). None when the payload is not parseable Y4M. */
    def decode(bytes: Array[Byte], featureDim: Int)
        : Option[(Int, Int, Long, Array[Float])] =
      parseHeader(bytes).flatMap { m =>
        // per-frame mean Y first (bounded: one double per frame), then
        // band-average — frame count isn't known until the scan ends
        val perFrame = scala.collection.mutable.ArrayBuffer.empty[Double]
        frameDataOffsets(bytes, m).foreach { off =>
          var s = 0L
          var i = off
          val end = off + m.ySize
          while (i < end) { s += bytes(i) & 0xFF; i += 1 }
          perFrame += s.toDouble / m.ySize
        }
        val n = perFrame.length
        if (n == 0) None
        else {
          val durationMs = n.toLong * 1000L * m.fpsDen / m.fpsNum
          val sums = new Array[Double](featureDim)
          val counts = new Array[Int](featureDim)
          var f = 0
          while (f < n) {
            val band = math.min(featureDim - 1, f * featureDim / n)
            sums(band) += perFrame(f); counts(band) += 1
            f += 1
          }
          val feats = Array.tabulate(featureDim) { b =>
            if (counts(b) == 0) 0f else (sums(b) / (counts(b) * 255.0)).toFloat
          }
          Some((m.width, m.height, durationMs, feats))
        }
      }

    /** Exact frame count (None unless parseable Y4M). */
    def frameCount(bytes: Array[Byte]): Option[Int] =
      parseHeader(bytes).map(m => frameDataOffsets(bytes, m).length)

    /** Header plus materialized frame-data offsets in ONE O(payload) scan:
      * gives frame count, duration, and direct per-frame addressing without
      * rescanning from byte 0 per access ([[sampleFrames]]'s hot path). */
    def frameOffsetTable(bytes: Array[Byte]): Option[(Meta, Array[Int])] =
      parseHeader(bytes).map(m => (m, frameDataOffsets(bytes, m).toArray))

    /** Decode frame `idx` (0-based) to a real PNG via BT.601 limited-range
      * YUV→RGB. None if the payload isn't Y4M or has ≤ idx frames. */
    def frameAt(bytes: Array[Byte], idx: Int): Option[Array[Byte]] =
      parseHeader(bytes).flatMap { m =>
        val it = frameDataOffsets(bytes, m).drop(idx)
        if (!it.hasNext) None
        else Some(frameAtOffset(bytes, m, it.next()))
      }

    /** Decode the frame whose pixel data starts at `off` (an entry of
      * [[frameOffsetTable]]) — the shared YUV→RGB→PNG kernel. */
    def frameAtOffset(bytes: Array[Byte], m: Meta, off: Int): Array[Byte] = {
      val img = frameImageAtOffset(bytes, m, off)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** The decoded frame as a BufferedImage, pre-PNG-encode — for
      * consumers that only read pixels (e.g. [[Multimodal.videoDHash]]),
      * skipping a pointless encode+decode round trip. */
    private[operators] def frameImageAtOffset(
        bytes: Array[Byte], m: Meta, off: Int)
        : java.awt.image.BufferedImage = {
          val img = new java.awt.image.BufferedImage(
            m.width, m.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val cw = if (m.chroma == "420") m.width / 2 else m.width
          var y = 0
          while (y < m.height) {
            var x = 0
            while (x < m.width) {
              val yy = bytes(off + y * m.width + x) & 0xFF
              val (u, v) = m.chroma match {
                case "mono" => (128, 128)
                case "444" =>
                  (bytes(off + m.ySize + y * m.width + x) & 0xFF,
                    bytes(off + 2 * m.ySize + y * m.width + x) & 0xFF)
                case _ =>
                  val ci = (y / 2) * cw + (x / 2)
                  (bytes(off + m.ySize + ci) & 0xFF,
                    bytes(off + m.ySize + cw * (m.height / 2) + ci) & 0xFF)
              }
              val c = yy - 16; val d = u - 128; val e = v - 128
              def clamp(q: Int) = math.max(0, math.min(255, q))
              val r = clamp((298 * c + 409 * e + 128) >> 8)
              val g = clamp((298 * c - 100 * d - 208 * e + 128) >> 8)
              val b = clamp((298 * c + 516 * d + 128) >> 8)
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          img
        }
  }

  /** Typed output row of [[resizeImages]]: undecodable payloads pass
    * through with width/height = -1 and their original bytes (flagged, not
    * dropped — a curation pipeline decides downstream). */
  final case class ResizedMedia(
      media_id: Long, kind: String, width: Int, height: Int,
      bytes: Array[Byte])

  /** Real image resize: ImageIO decode → bilinear resample to fit within
    * (maxW, maxH) preserving aspect ratio (never upscaling) → PNG
    * re-encode. Output dimensions are the closed form
    * `floor(dim · min(1, maxW/w, maxH/h))` (≥1), so a SQL oracle can state
    * them; pixels come from the JDK's deterministic bilinear Graphics2D
    * path. Same narrow mapPartitions shape as decode — no shuffle, one
    * pipeline stage at 100 TB. */
  def resizeImages(
      media: DataFrame, maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    require(maxW > 0 && maxH > 0, s"bad resize bounds: ${maxW}x$maxH")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .transform(spreadForDecode)
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (mediaId, kind, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) ResizedMedia(mediaId, kind, -1, -1, bytes)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val scale = math.min(1.0,
              math.min(maxW.toDouble / w, maxH.toDouble / h))
            val ow = math.max(1, math.floor(w * scale).toInt)
            val oh = math.max(1, math.floor(h * scale).toInt)
            val out = new java.awt.image.BufferedImage(
              ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, ow, oh, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            ResizedMedia(mediaId, kind, ow, oh, bos.toByteArray)
          }
        }
      }
  }

  /** One sampled frame of a video payload. `frame` is a real PNG (tiny,
    * deterministic), so sampled frames feed straight into the image path
    * ([[ImageCodec]], [[extractFeatures]], [[resizeImages]]). */
  final case class SampledFrame(
      media_id: Long, frame_idx: Int, ts_ms: Long, frame: Array[Byte])

  /** Frame sampling for video payloads: one row per sampled timestamp at a
    * fixed `everyMs` interval, capped at `maxFramesPerMedia`.
    *
    * Y4M payloads take the fully real path: duration (and thus fan-out
    * cardinality) comes from [[VideoCodec]]'s header+frame-count probe, and
    * each emitted frame is the ACTUAL decoded frame nearest the sampled
    * timestamp, YUV→RGB-converted and PNG-encoded — so sampled frames feed
    * straight into [[ImageCodec]]/[[resizeImages]]. Compressed containers
    * go through the [[SampleDecoder]] seam: the container walker's sample
    * table provides the timeline and byte ranges, the first claiming
    * decoder in the captured snapshot provides the frames (MJPEG-AVI real
    * today via [[SampleDecoders.MjpegAvi]]; MP4/WebM whenever an impl is
    * registered). The labeled stub (hash-derived duration, synthesized
    * 8×8 PNG) is reachable ONLY when no walker recognizes the payload or
    * no registered decoder claims its container. Either way the operator
    * is a narrow flatMap-shaped mapPartitions — no shuffle; at 100 TB it
    * pipelines inside the scan. */
  def sampleFrames(
      media: DataFrame, everyMs: Long,
      maxFramesPerMedia: Int = 32): Dataset[SampledFrame] = {
    require(everyMs > 0, s"everyMs must be positive: $everyMs")
    val spark = media.sparkSession
    import spark.implicits._
    // captured on the DRIVER: programmatic registrations reach executors
    val decoders = SampleDecoders.snapshot()
    media
      .filter(col("kind") === "video")
      .transform(spreadForDecode)
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mediaId, kind, bytes) =>
          // ONE header parse + ONE offset scan per payload; sampled frames
          // decode directly from the cached offsets (no per-frame rescans)
          VideoCodec.frameOffsetTable(bytes) match {
            case Some((meta, offs)) if offs.nonEmpty =>
              val nFrames = offs.length
              val durMs = nFrames.toLong * 1000L * meta.fpsDen / meta.fpsNum
              val n =
                math.min(maxFramesPerMedia.toLong, durMs / everyMs + 1).toInt
              (0 until n).iterator.map { i =>
                val ts = i * everyMs
                // nearest-preceding frame at ts (clamped to the last frame)
                val idx = math.min(nFrames - 1L,
                  ts * meta.fpsNum / (1000L * meta.fpsDen)).toInt
                SampledFrame(mediaId, i, ts,
                  VideoCodec.frameAtOffset(bytes, meta, offs(idx)))
              }
            case _ =>
              // compressed container: sample table from the real walker,
              // frames from the first claiming SampleDecoder
              val viaSeam = containerSampleRefs(bytes)
                .flatMap { case (container, refs) =>
                  SampleDecoders.forContainer(container, decoders).map {
                    dec =>
                      // container duration ≈ last sample START + one
                      // inter-sample gap (the last frame plays out too —
                      // max(tsMs) alone would drop up to one cadence
                      // tick vs the replaced AVI-specific path)
                      val maxTs = refs.map(_.tsMs).max
                      val durMs = maxTs + (if (refs.length >= 2)
                        maxTs - refs.map(_.tsMs).sorted.apply(
                          refs.length - 2)
                      else 0L)
                      val n = math.min(maxFramesPerMedia.toLong,
                        durMs / everyMs + 1).toInt
                      (0 until n).iterator.flatMap { i =>
                        val ts = i * everyMs
                        // nearest-preceding sample at ts on the container
                        // timeline (clamped to the first sample)
                        val ref = refs.takeWhile(_.tsMs <= ts)
                          .lastOption.getOrElse(refs.head)
                        dec.decodeSample(bytes, ref).map { img =>
                          val bos = new java.io.ByteArrayOutputStream()
                          javax.imageio.ImageIO.write(img, "png", bos)
                          SampledFrame(mediaId, i, ts, bos.toByteArray)
                        }
                      }
                  }
                }
              viaSeam.getOrElse {
                // stub fallback — reachable only with no claiming decoder
                val (_, _, durMs, _) =
                  StubDecoder.decode(kind, bytes, 1)
                val n = math.min(maxFramesPerMedia.toLong,
                  durMs / everyMs + 1).toInt
                val seed =
                  mediaId * 0x9E3779B97F4A7C15L ^ bytes.length
                (0 until n).iterator.map { i =>
                  val ts = i * everyMs
                  SampledFrame(mediaId, i, ts, stubFramePng(seed, ts))
                }
              }
          }
        }
      }
  }

  /** STUB frame synthesis (see [[sampleFrames]]): an 8×8 gradient seeded
    * by (payload seed, timestamp), encoded as a genuine PNG. */
  private def stubFramePng(seed: Long, tsMs: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val r = Math.floorMod(seed + tsMs + x * 31 + y * 7, 256L).toInt
        val g = Math.floorMod(seed * 31 + tsMs + x * 7 + y * 31, 256L).toInt
        val b = Math.floorMod(seed * 17 + tsMs * 3 + x + y, 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Animated-GIF codec: the REAL multi-frame ImageIO read. Each frame is
    * composited onto the logical-screen canvas at its (left, top) offset —
    * animated GIFs routinely ship partial-rect frames — honoring the
    * frame's disposal method (`none`/`doNotDispose` accumulate,
    * `restoreToBackgroundColor` clears the frame's rect,
    * `restoreToPrevious` rolls the canvas back), and carries the
    * GraphicControlExtension delay so event-time sampling downstream has
    * real timestamps. Deterministic: ImageIO's GIF reader is pure LZW +
    * palette lookup, same output on every JVM. */
  object GifCodec {
    javax.imageio.ImageIO.setUseCache(false)

    /** GIF87a/GIF89a magic. */
    def isGif(bytes: Array[Byte]): Boolean =
      bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

    /** One composited frame: cumulative timestamp (ms), this frame's
      * delay (ms), and the full logical-screen canvas. */
    final case class Frame(
        idx: Int, tsMs: Long, delayMs: Long,
        image: java.awt.image.BufferedImage)

    private def intAttr(
        node: org.w3c.dom.Node, name: String, dflt: Int): Int = {
      val attrs = node.getAttributes
      val a = if (attrs == null) null else attrs.getNamedItem(name)
      if (a == null) dflt
      else try a.getNodeValue.toInt
      catch { case _: NumberFormatException => dflt }
    }

    private def strAttr(
        node: org.w3c.dom.Node, name: String, dflt: String): String = {
      val attrs = node.getAttributes
      val a = if (attrs == null) null else attrs.getNamedItem(name)
      if (a == null) dflt else a.getNodeValue
    }

    private def child(
        root: org.w3c.dom.Node, name: String): Option[org.w3c.dom.Node] = {
      var n = root.getFirstChild
      while (n != null && n.getNodeName != name) n = n.getNextSibling
      Option(n)
    }

    /** All frames composited, or None when the payload is not a GIF /
      * not decodable. `maxFrames` bounds runaway payloads (a crawl GIF
      * can carry thousands of frames). */
    def frames(
        bytes: Array[Byte], maxFrames: Int = 256): Option[Vector[Frame]] = {
      if (!isGif(bytes)) return None
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) return None
      val reader = readers.next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, false, false)
        val n = math.min(reader.getNumImages(true), maxFrames)
        if (n <= 0) return None
        // logical screen from the stream metadata; absent → grow to fit
        val (lsW, lsH) = {
          val sm = reader.getStreamMetadata
          val tree =
            if (sm == null) null
            else sm.getAsTree("javax_imageio_gif_stream_1.0")
          val lsd = if (tree == null) None
            else child(tree, "LogicalScreenDescriptor")
          (lsd.map(intAttr(_, "logicalScreenWidth", 0)).getOrElse(0),
            lsd.map(intAttr(_, "logicalScreenHeight", 0)).getOrElse(0))
        }
        // size the canvas from the logical screen grown to cover EVERY
        // frame's extent (not just the first — a later frame drawn past
        // the declared screen would otherwise clip silently); a metadata
        // pre-pass is cheap, the pixel decode below happens once
        var maxW = lsW
        var maxH = lsH
        var pi = 0
        while (pi < n) {
          val md0 = reader.getImageMetadata(pi)
            .getAsTree("javax_imageio_gif_image_1.0")
          val d0 = child(md0, "ImageDescriptor")
          val l0 = d0.map(intAttr(_, "imageLeftPosition", 0)).getOrElse(0)
          val t0 = d0.map(intAttr(_, "imageTopPosition", 0)).getOrElse(0)
          maxW = math.max(maxW, l0 + reader.getWidth(pi))
          maxH = math.max(maxH, t0 + reader.getHeight(pi))
          pi += 1
        }
        if (maxW <= 0 || maxH <= 0) return None
        // a hostile descriptor (offsets in the tens of thousands) would
        // otherwise force a multi-GB canvas BEFORE any pixel decode —
        // and the resulting OutOfMemoryError is not NonFatal, so it
        // would kill the task rather than fall back. GIF dimensions are
        // 16-bit, but their SUM across offset+size can still reach
        // 2^17; refuse anything past a generous real-image bound
        // (64 M pixels ≈ 256 MB canvas) as undecodable.
        if (maxW.toLong * maxH > (1L << 26)) return None
        val canvas = new java.awt.image.BufferedImage(
          maxW, maxH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var prev: java.awt.image.BufferedImage = null
        var ts = 0L
        val out = Vector.newBuilder[Frame]
        var i = 0
        while (i < n) {
          val img = reader.read(i)
          val md = reader.getImageMetadata(i)
            .getAsTree("javax_imageio_gif_image_1.0")
          val desc = child(md, "ImageDescriptor")
          val left = desc.map(intAttr(_, "imageLeftPosition", 0)).getOrElse(0)
          val top = desc.map(intAttr(_, "imageTopPosition", 0)).getOrElse(0)
          val gce = child(md, "GraphicControlExtension")
          val delayMs =
            gce.map(intAttr(_, "delayTime", 0)).getOrElse(0).toLong * 10L
          val disposal =
            gce.map(strAttr(_, "disposalMethod", "none")).getOrElse("none")
          if (disposal == "restoreToPrevious") {
            prev = new java.awt.image.BufferedImage(
              canvas.getWidth, canvas.getHeight, canvas.getType)
            val g = prev.createGraphics()
            g.drawImage(canvas, 0, 0, null); g.dispose()
          }
          val g = canvas.createGraphics()
          g.drawImage(img, left, top, null)
          g.dispose()
          // emit a deep copy — the canvas keeps evolving
          val snap = new java.awt.image.BufferedImage(
            canvas.getWidth, canvas.getHeight, canvas.getType)
          val gs = snap.createGraphics()
          gs.drawImage(canvas, 0, 0, null); gs.dispose()
          out += Frame(i, ts, delayMs, snap)
          ts += delayMs
          disposal match {
            case "restoreToBackgroundColor" =>
              val gc = canvas.createGraphics()
              gc.setColor(java.awt.Color.BLACK)
              gc.fillRect(left, top, img.getWidth, img.getHeight)
              gc.dispose()
            case "restoreToPrevious" if prev != null =>
              val gc = canvas.createGraphics()
              gc.drawImage(prev, 0, 0, null); gc.dispose()
            case _ => ()
          }
          i += 1
        }
        Some(out.result())
      } catch { case scala.util.control.NonFatal(_) => None }
      finally { try iis.close() catch { case _: Throwable => () }
        reader.dispose() }
    }
  }

  /** One extracted frame of an animated GIF. `frame` is a real PNG of the
    * composited logical screen, so GIF frames feed straight into the
    * image path ([[ImageCodec]], [[imageDHash]], [[resizeImages]]) —
    * exactly like [[SampledFrame]] for Y4M video. */
  final case class GifFrame(
      media_id: Long, frame_idx: Int, ts_ms: Long, delay_ms: Long,
      width: Int, height: Int, frame: Array[Byte])

  /** Animated-GIF frame extraction: one row per composited frame with its
    * cumulative event-time timestamp. Narrow flatMap-shaped mapPartitions
    * over the payload column — no shuffle; at 100 TB it pipelines inside
    * the scan like every other codec. Non-GIF payloads emit nothing
    * (compose with a `kind` filter upstream as needed). */
  def gifFrames(
      media: DataFrame, maxFramesPerMedia: Int = 256): Dataset[GifFrame] = {
    require(maxFramesPerMedia >= 1, s"bad maxFramesPerMedia: $maxFramesPerMedia")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mediaId, bytes) =>
          GifCodec.frames(bytes, maxFramesPerMedia)
            .getOrElse(Vector.empty)
            .iterator.map { f =>
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(f.image, "png", bos)
              GifFrame(mediaId, f.idx, f.tsMs, f.delayMs,
                f.image.getWidth, f.image.getHeight, bos.toByteArray)
            }
        }
      }
  }

  /** Deterministic synthetic ANIMATED-GIF corpus keyed off an id column:
    * frame count `2 + id % 6`, logical screen `(16 + id%5) × (12 + id%4)`,
    * per-frame delay `(4 + id%3)` centiseconds, every frame a SOLID color
    * whose channels are pure functions of (id, frame) — solid frames
    * survive GIF palette quantization exactly, so an oracle can state the
    * exact pixels, sizes, and timestamps a correct multi-frame decode
    * must recover (q_m19). Same rationale as [[syntheticImages]]. */
  def syntheticGifs(ids: DataFrame, id: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(id).cast("long").as("media_id"))
      // spread the NARROW id rows before the heavy per-row encode:
      // the upstream scan is often a single split, and shuffling
      // 8-byte ids is free next to shuffling the built payloads
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        it.map { mid =>
          val nFrames = (2 + mid % 6).toInt
          val w = (16 + mid % 5).toInt
          val h = (12 + mid % 4).toInt
          val delayCs = (4 + mid % 3).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          try {
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            var i = 0
            while (i < nFrames) {
              val r = ((mid * 37 + i * 11) % 256).toInt
              val g = ((mid * 53 + i * 17) % 256).toInt
              val b = ((mid * 71 + i * 23) % 256).toInt
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val gg = img.createGraphics()
              gg.setColor(new java.awt.Color(r, g, b))
              gg.fillRect(0, 0, w, h)
              gg.dispose()
              val meta = writer.getDefaultImageMetadata(
                new javax.imageio.ImageTypeSpecifier(img), null)
              val fmt = "javax_imageio_gif_image_1.0"
              val tree = meta.getAsTree(fmt)
                .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
              val gce = new javax.imageio.metadata.IIOMetadataNode(
                "GraphicControlExtension")
              gce.setAttribute("disposalMethod", "none")
              gce.setAttribute("userInputFlag", "FALSE")
              gce.setAttribute("transparentColorFlag", "FALSE")
              gce.setAttribute("delayTime", delayCs.toString)
              gce.setAttribute("transparentColorIndex", "0")
              tree.appendChild(gce)
              meta.setFromTree(fmt, tree)
              writer.writeToSequence(
                new javax.imageio.IIOImage(img, null, meta), null)
              i += 1
            }
            writer.endWriteSequence()
          } finally { ios.close(); writer.dispose() }
          (mid, "image", bos.toByteArray)
        }
      }.toDF("media_id", "kind", "bytes")
  }

  /** REAL AVI (RIFF) container walk + MJPEG frame decode — the first
    * COMPRESSED video path with a fully offline sample decode: the
    * container is plain RIFF (public Microsoft format: 'RIFF'/'LIST'
    * chunk tree, 'avih'/'strh'/'strf' headers, '##dc' frame chunks in
    * the 'movi' list), and each MJPG frame chunk is a complete baseline
    * JPEG that `javax.imageio` decodes — no native codec needed, unlike
    * the inter-frame-predicted MP4/WebM payloads that stay probe-only.
    * Hostile input discipline matches [[GifCodec]]: chunk sizes are
    * clamped to the buffer, odd sizes pad per spec, anything
    * malformed → None (never a throw, never an unbounded allocation). */
  object AviCodec {
    /** Container facts from the header list: frame cadence in µs (the
      * authoritative event-time clock), declared frame count, and the
      * zero-based index of the MJPG video stream ('##dc' chunk prefix). */
    final case class Meta(
        width: Int, height: Int, usPerFrame: Long, totalFrames: Int,
        streamIdx: Int)

    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    /** (id, dataStart, dataLen) of each RIFF chunk in [lo, hi) — sizes
      * clamped to the window so truncated files degrade to fewer chunks,
      * never to reads past the buffer. */
    private def chunks(b: Array[Byte], lo: Int, hi: Int)
        : Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var pos = lo
        def hasNext: Boolean = pos >= 0 && pos + 8 <= hi
        def next(): (String, Int, Int) = {
          val id = fourcc(b, pos)
          val sz = u32(b, pos + 4)
          val start = pos + 8
          val len = math.max(0L, math.min(sz, (hi - start).toLong)).toInt
          pos = start + len + (len & 1)
          (id, start, len)
        }
      }

    /** None unless the payload is RIFF/AVI with an MJPG 'vids' stream and
      * a positive frame cadence. */
    def parseMeta(bytes: Array[Byte]): Option[Meta] = try {
      if (bytes.length < 24 || fourcc(bytes, 0) != "RIFF" ||
          fourcc(bytes, 8) != "AVI ") return None
      val end = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
      var usPerFrame = 0L
      var totalFrames = 0
      var w = 0; var h = 0
      var mjpgIdx = -1
      var streamNo = 0
      chunks(bytes, 12, end).foreach {
        case ("LIST", st, ln) if ln >= 4 && fourcc(bytes, st) == "hdrl" =>
          chunks(bytes, st + 4, st + ln).foreach {
            case ("avih", ast, aln) if aln >= 40 =>
              usPerFrame = u32(bytes, ast)
              totalFrames = u32(bytes, ast + 16).toInt
            case ("LIST", sst, sln) if sln >= 4 &&
                fourcc(bytes, sst) == "strl" =>
              var isVids = false
              var isMjpg = false
              var sw = 0; var sh = 0
              chunks(bytes, sst + 4, sst + sln).foreach {
                case ("strh", hst, hln) if hln >= 36 =>
                  if (fourcc(bytes, hst) == "vids") {
                    isVids = true
                    val handler = fourcc(bytes, hst + 4)
                    if (handler.equalsIgnoreCase("MJPG") ||
                      handler == "dmb1") isMjpg = true
                    val scale = u32(bytes, hst + 20)
                    val rate = u32(bytes, hst + 24)
                    // strh cadence wins when avih carries none
                    if (usPerFrame <= 0 && rate > 0)
                      usPerFrame = scale * 1000000L / rate
                    if (totalFrames <= 0)
                      totalFrames = u32(bytes, hst + 32).toInt
                  }
                case ("strf", fst, fln) if fln >= 20 && isVids =>
                  sw = u32(bytes, fst + 4).toInt
                  sh = math.abs(u32(bytes, fst + 8).toInt)
                  val comp = fourcc(bytes, fst + 16)
                  if (comp.equalsIgnoreCase("MJPG")) isMjpg = true
                case _ => ()
              }
              if (isVids) {
                if (isMjpg && mjpgIdx < 0) {
                  mjpgIdx = streamNo; w = sw; h = sh
                }
              }
              streamNo += 1
            case _ => ()
          }
        case _ => ()
      }
      if (mjpgIdx < 0 || w <= 0 || h <= 0 || usPerFrame <= 0 ||
        w.toLong * h > (1L << 26)) None
      else Some(Meta(w, h, usPerFrame, totalFrames, mjpgIdx))
    } catch { case scala.util.control.NonFatal(_) => None }

    /** The MJPG stream's frame chunk positions: (start, length) of each
      * '##dc'/'##db' payload in the 'movi' list (one 'rec ' grouping
      * level deep), in file order. One O(payload) walk. */
    def frameChunks(bytes: Array[Byte], m: Meta): Array[(Int, Int)] = try {
      val end = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
      val tag = f"${m.streamIdx}%02d"
      val dc = tag + "dc"
      val db = tag + "db"
      val out = Array.newBuilder[(Int, Int)]
      def scan(from: Int, to: Int, depth: Int): Unit =
        chunks(bytes, from, to).foreach {
          case (id, st, ln) if (id == dc || id == db) && ln > 0 =>
            out += ((st, ln))
          case ("LIST", st, ln) if depth < 1 && ln >= 4 &&
              fourcc(bytes, st) == "rec " =>
            scan(st + 4, st + ln, depth + 1)
          case _ => ()
        }
      chunks(bytes, 12, end).foreach {
        case ("LIST", st, ln) if ln >= 4 && fourcc(bytes, st) == "movi" =>
          scan(st + 4, st + ln, 0)
        case _ => ()
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => Array.empty }

    /** Decode frame chunk `i` to a BufferedImage via the shared ImageIO
      * JPEG reader. None when the chunk isn't a decodable JPEG. */
    def frameImage(bytes: Array[Byte], chunk: (Int, Int))
        : Option[java.awt.image.BufferedImage] = {
      val (st, ln) = chunk
      if (ln < 2 || (bytes(st) & 0xFF) != 0xFF ||
        (bytes(st + 1) & 0xFF) != 0xD8) return None
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes, st, ln))
        catch { case scala.util.control.NonFatal(_) => null }
      Option(img)
    }

    /** Full-stream decode to [[extractFeatures]]'s video contract:
      * (width, height, durationMs, temporal-band mean luma) — the same
      * reduction [[VideoCodec.decode]] applies to raw Y4M, computed here
      * from the DECODED MJPEG frames. None unless ≥ 1 frame decodes. */
    def decode(bytes: Array[Byte], featureDim: Int)
        : Option[(Int, Int, Long, Array[Float])] =
      parseMeta(bytes).flatMap { m =>
        val cks = frameChunks(bytes, m)
        val perFrame = scala.collection.mutable.ArrayBuffer.empty[Double]
        var w = m.width; var h = m.height
        cks.foreach { c =>
          frameImage(bytes, c).foreach { img =>
            w = img.getWidth; h = img.getHeight
            var s = 0.0
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                s += 0.299 * ((rgb >> 16) & 0xFF) +
                  0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
                x += 1
              }
              y += 1
            }
            perFrame += s / (img.getWidth.toLong * img.getHeight)
          }
        }
        val n = perFrame.length
        if (n == 0) None
        else {
          val durationMs = n.toLong * m.usPerFrame / 1000L
          val sums = new Array[Double](featureDim)
          val counts = new Array[Int](featureDim)
          var f = 0
          while (f < n) {
            val band = math.min(featureDim - 1, f * featureDim / n)
            sums(band) += perFrame(f); counts(band) += 1
            f += 1
          }
          val feats = Array.tabulate(featureDim) { b =>
            if (counts(b) == 0) 0f
            else (sums(b) / (counts(b) * 255.0)).toFloat
          }
          Some((w, h, durationMs, feats))
        }
      }
  }

  /** One extracted MJPEG frame of an AVI. `frame` is a real PNG of the
    * decoded JPEG, so AVI frames feed straight into the image path
    * ([[ImageCodec]], [[imageDHash]], [[resizeImages]]) — exactly like
    * [[GifFrame]] and [[SampledFrame]]. `ts_ms` is the container clock:
    * frame index × µs-per-frame. */
  final case class AviFrame(
      media_id: Long, frame_idx: Int, ts_ms: Long,
      width: Int, height: Int, frame: Array[Byte])

  /** MJPEG-AVI frame extraction: one row per decoded frame with its
    * container-clock timestamp. Narrow flatMap-shaped mapPartitions over
    * the payload column — no shuffle; at 100 TB it pipelines inside the
    * scan like every other codec. Non-AVI payloads and undecodable frame
    * chunks emit nothing. */
  def aviFrames(
      media: DataFrame, maxFramesPerMedia: Int = 256): Dataset[AviFrame] = {
    require(maxFramesPerMedia >= 1, s"bad maxFramesPerMedia: $maxFramesPerMedia")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mediaId, bytes) =>
          AviCodec.parseMeta(bytes).iterator.flatMap { m =>
            AviCodec.frameChunks(bytes, m).iterator.take(maxFramesPerMedia)
              .zipWithIndex.flatMap { case (ck, idx) =>
                AviCodec.frameImage(bytes, ck).map { img =>
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(img, "png", bos)
                  AviFrame(mediaId, idx, idx * m.usPerFrame / 1000L,
                    img.getWidth, img.getHeight, bos.toByteArray)
                }
              }
          }
        }
      }
  }

  /** Deterministic synthetic MJPEG-AVI corpus keyed off an id column:
    * frame count `2 + id % 6`, size `(48 + 16·(id%3)) × (32 + 16·(id%2))`,
    * cadence `(20 + id % 5)` ms/frame, every frame a SOLID gray JPEG
    * (quality 1.0) — so an oracle can state the exact frame rows (count,
    * decoded dimensions, container timestamps) a correct RIFF walk +
    * JPEG decode must recover (q_m22), and a spec can pin the decoded
    * gray level to the source within JPEG round-off. Files carry the
    * full standard layout (hdrl with avih/strh/strf, movi, idx1) so the
    * parser is exercised on realistic structure. */
  def syntheticAvis(ids: DataFrame, id: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(id).cast("long").as("media_id"))
      // spread the NARROW id rows before the heavy per-row encode:
      // the upstream scan is often a single split, and shuffling
      // 8-byte ids is free next to shuffling the built payloads
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        it.map { mid =>
          val nFrames = (2 + mid % 6).toInt
          val w = (48 + 16 * (mid % 3)).toInt
          val h = (32 + 16 * (mid % 2)).toInt
          val usPerFrame = (20 + mid % 5) * 1000L
          def le32(v: Long): Array[Byte] = Array(
            (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
            ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
          def le16(v: Int): Array[Byte] =
            Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
          def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
          def chunk(idc: String, payload: Array[Byte]): Array[Byte] = {
            val pad = if ((payload.length & 1) == 1)
              Array(0.toByte) else Array.empty[Byte]
            cc(idc) ++ le32(payload.length.toLong) ++ payload ++ pad
          }
          def list(typ: String, payload: Array[Byte]): Array[Byte] =
            chunk("LIST", cc(typ) ++ payload)
          // one solid-gray JPEG per frame, quality 1.0 (all-ones quant
          // tables -> solid blocks survive the DCT round trip)
          val jpegs = (0 until nFrames).map { fi =>
            val v = ((mid * 37 + fi * 29) % 256).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = img.createGraphics()
            g.setColor(new java.awt.Color(v, v, v))
            g.fillRect(0, 0, w, h)
            g.dispose()
            val writer = javax.imageio.ImageIO
              .getImageWritersByFormatName("jpeg").next()
            val bos = new java.io.ByteArrayOutputStream()
            val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
            try {
              writer.setOutput(ios)
              val p = writer.getDefaultWriteParam
              p.setCompressionMode(
                javax.imageio.ImageWriteParam.MODE_EXPLICIT)
              p.setCompressionQuality(1.0f)
              writer.write(null,
                new javax.imageio.IIOImage(img, null, null), p)
            } finally { ios.close(); writer.dispose() }
            bos.toByteArray
          }
          val maxJpeg = jpegs.map(_.length).max
          val avih = le32(usPerFrame) ++ le32(0L) ++ le32(0L) ++
            le32(0x10L) ++ le32(nFrames.toLong) ++ le32(0L) ++ le32(1L) ++
            le32(maxJpeg.toLong) ++ le32(w.toLong) ++ le32(h.toLong) ++
            le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(0L)
          val strh = cc("vids") ++ cc("MJPG") ++ le32(0L) ++ le16(0) ++
            le16(0) ++ le32(0L) ++ le32(usPerFrame) ++ le32(1000000L) ++
            le32(0L) ++ le32(nFrames.toLong) ++ le32(maxJpeg.toLong) ++
            le32(0L) ++ le32(0L) ++
            le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
          val strf = le32(40L) ++ le32(w.toLong) ++ le32(h.toLong) ++
            le16(1) ++ le16(24) ++ cc("MJPG") ++
            le32(w.toLong * h * 3) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++
            le32(0L)
          val hdrl = list("hdrl",
            chunk("avih", avih) ++
              list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
          val frameChunks = jpegs.map(j => chunk("00dc", j))
          val movi = list("movi", frameChunks.reduce(_ ++ _))
          // idx1: one entry per frame — ckid, KEYFRAME flag, offset of
          // the ck header relative to the 'movi' fourcc, payload size
          var off = 4L
          val idxEntries = jpegs.map { j =>
            val e = cc("00dc") ++ le32(0x10L) ++ le32(off) ++
              le32(j.length.toLong)
            off += 8L + j.length + (j.length & 1)
            e
          }
          val idx1 = chunk("idx1", idxEntries.reduce(_ ++ _))
          val body = cc("AVI ") ++ hdrl ++ movi ++ idx1
          val riff = cc("RIFF") ++ le32(body.length.toLong) ++ body
          (mid, "video", riff)
        }
      }.toDF("media_id", "kind", "bytes")
  }

  /** Deterministic synthetic WAV corpus keyed off an id column: 8 kHz
    * 16-bit mono PCM, frame count `800 + (id % 32)·80` (so the true
    * duration is the closed form `(800 + id%32·80)/8` ms — an oracle can
    * state what a correct decoder must recover), samples a deterministic
    * square-ish wave whose amplitude is a pure function of the id. Same
    * rationale as [[syntheticImages]]: the REAL decode path gets a
    * registered, driver-checkable query (q_m6). */
  def syntheticAudio(ids: DataFrame, id: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(id).cast("long").as("media_id"))
      // spread the NARROW id rows before the heavy per-row encode:
      // the upstream scan is often a single split, and shuffling
      // 8-byte ids is free next to shuffling the built payloads
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        it.map { mid =>
          val frames = 800 + (mid % 32).toInt * 80
          val amp = (1000 + (mid % 7) * 4000).toInt // peak sample value
          val pcm = new Array[Byte](frames * 2)
          var i = 0
          while (i < frames) {
            // square wave, 100-frame half-period: RMS equals |amp| exactly
            val s = (if ((i / 100) % 2 == 0) amp else -amp).toShort
            pcm(2 * i) = (s & 0xFF).toByte // little-endian
            pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (mid, "audio", bos.toByteArray)
        }
      }
      .toDF("media_id", "kind", "bytes")
  }

  /** Deterministic synthetic Y4M corpus keyed off an id column: even
    * dimensions `(8 + id%8·2) × (8 + id%6·2)`, 10 fps, `4 + id%16` frames
    * (so the true duration is the closed form `(4 + id%16)·100` ms), C420
    * chroma, luma a pure function of (id, frame, x, y). Same rationale as
    * [[syntheticImages]]: the REAL Y4M decode path gets a registered,
    * driver-checkable query (q_m7/q_m8) whose expected output DuckDB can
    * state in closed form. */
  def syntheticVideos(ids: DataFrame, id: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(id).cast("long").as("media_id"))
      // spread the NARROW id rows before the heavy per-row encode:
      // the upstream scan is often a single split, and shuffling
      // 8-byte ids is free next to shuffling the built payloads
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        it.map { mid =>
          val w = 8 + (mid % 8).toInt * 2
          val h = 8 + (mid % 6).toInt * 2
          val frames = 4 + (mid % 16).toInt
          val header = s"YUV4MPEG2 W$w H$h F10:1 Ip A1:1 C420\n"
            .getBytes("US-ASCII")
          val fsize = w * h + 2 * ((w / 2) * (h / 2))
          val bos = new java.io.ByteArrayOutputStream(
            header.length + frames * (6 + fsize))
          bos.write(header)
          var f = 0
          while (f < frames) {
            bos.write("FRAME\n".getBytes("US-ASCII"))
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                bos.write((16 + ((mid * 31 + f * 8 + x * 4 + y * 2) % 220))
                  .toInt)
                x += 1
              }
              y += 1
            }
            var c = 0
            while (c < 2 * ((w / 2) * (h / 2))) { bos.write(128); c += 1 }
            f += 1
          }
          (mid, "video", bos.toByteArray)
        }
      }
      .toDF("media_id", "kind", "bytes")
  }

  /** Per-frame CONSTANT amplitudes of the synthetic FLAC corpus — the
    * closed form the q_m20 oracle restates (channel 0 / channel 1). */
  private[graft] def flacAmp(mid: Long, f: Int, ch: Int): Short =
    if (ch == 0) ((mid * 131 + f * 977) % 20000 - 10000).toShort
    else ((mid * 197 + f * 563) % 20000 - 10000).toShort

  /** Deterministic synthetic FLAC corpus keyed off an id column: `fLaC`
    * marker + the mandatory STREAMINFO block, followed by REAL audio
    * frames — fully valid fixed-blocksize frames (4096-sample blocks, a
    * 16-bit partial tail stated in its own header, CRC-8'd headers,
    * CRC-16'd frames) whose subframes are CONSTANT with the
    * [[flacAmp]] closed-form amplitude per (id, frame, channel). So both
    * halves have a driver-checkable contract: the [[FlacProbe]] metadata
    * walk (q_m13) AND the [[FlacCodec]] sample decode (q_m20 — exact
    * per-frame amplitudes, peaks, integral sums of squares). Sample rate
    * `[8000, 16000, 22050, 44100, 48000][id%5]`, channels `1 + id%2`,
    * total samples `8000 + (id%32)·1600`. */
  def syntheticFlacs(ids: DataFrame, id: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 22050, 44100, 48000)
    ids.select(col(id).cast("long").as("media_id"))
      // spread the NARROW id rows before the heavy per-row encode:
      // the upstream scan is often a single split, and shuffling
      // 8-byte ids is free next to shuffling the built payloads
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        it.map { mid =>
          val sr = rates((mid % 5).toInt)
          val channels = 1 + (mid % 2).toInt
          val total = 8000L + (mid % 32) * 1600L
          val bos = new java.io.ByteArrayOutputStream()
          val b = java.nio.ByteBuffer.allocate(4 + 4 + 34)
          b.put("fLaC".getBytes("US-ASCII"))
          b.put(0x80.toByte)              // last-block flag + type 0
          b.put(0.toByte).put(0.toByte).put(34.toByte) // block length
          b.putShort(4096.toShort)        // min block size
          b.putShort(4096.toShort)        // max block size
          b.put(0.toByte).put(0.toByte).put(0.toByte) // min frame size
          b.put(0.toByte).put(0.toByte).put(0.toByte) // max frame size
          // 20-bit rate | 3-bit channels-1 | 5-bit bps-1 | 36-bit total
          b.put(((sr >> 12) & 0xff).toByte)
          b.put(((sr >> 4) & 0xff).toByte)
          b.put((((sr & 0xf) << 4) | ((channels - 1) << 1)
            | (15 >> 4)).toByte)          // bps-1 = 15 (16-bit): top bit
          b.put((((15 & 0xf) << 4) | ((total >> 32) & 0xf).toInt).toByte)
          b.put(((total >> 24) & 0xff).toByte)
          b.put(((total >> 16) & 0xff).toByte)
          b.put(((total >> 8) & 0xff).toByte)
          b.put((total & 0xff).toByte)
          // 16-byte MD5 of the (absent) samples: zeroed
          bos.write(b.array())
          var written = 0L
          var f = 0
          while (written < total) {
            val n = math.min(4096L, total - written).toInt
            val frame = new java.io.ByteArrayOutputStream()
            frame.write(0xff); frame.write(0xf8)
            // blocksize code C (4096) or 7 (16-bit at end); sr code 0
            frame.write(if (n == 4096) 0xc0 else 0x70)
            // channel assignment | sample-size 16 (100) | reserved 0
            frame.write(((channels - 1) << 4) | (0x4 << 1))
            frame.write(f & 0x7f) // UTF-8 frame number (< 128 frames)
            if (n != 4096) {
              frame.write(((n - 1) >> 8) & 0xff); frame.write((n - 1) & 0xff)
            }
            val hdr = frame.toByteArray
            frame.write(FlacCodec.crc8(hdr, 0, hdr.length))
            var ch = 0
            while (ch < channels) {
              frame.write(0x00) // CONSTANT subframe, no wasted bits
              val v = flacAmp(mid, f, ch)
              frame.write((v >> 8) & 0xff); frame.write(v & 0xff)
              ch += 1
            }
            val body = frame.toByteArray
            val crc = FlacCodec.crc16(body, 0, body.length)
            frame.write((crc >> 8) & 0xff); frame.write(crc & 0xff)
            bos.write(frame.toByteArray)
            written += n
            f += 1
          }
          (mid, "audio", bos.toByteArray)
        }
      }
      .toDF("media_id", "kind", "bytes")
  }

  /** Closed-form sample for the COMPRESSED synthetic FLAC corpus: the
    * quadratic-ramp-with-wraps waveform keeps every FIXED/LPC residual
    * stream non-trivial (mod wraps defeat exact polynomial prediction)
    * while staying integer-exact in SQL for the q_m21 oracle. */
  private[graft] def flacWave(mid: Long, ch: Int, fi: Int, i: Int): Int =
    (((mid * 131 + ch * 197 + fi * 977 + i.toLong * i * 13 + i * 7919L)
      % 16384) - 8192).toInt

  /** MSB-first bit emitter for the FLAC encoder fixture. */
  private[operators] final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nb += 1
      if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def alignByte(): Unit = while (nb != 0) writeBit(0)
    def toByteArray: Array[Byte] = { alignByte(); buf.toByteArray }
  }

  private def zigzag(e: Int): Long =
    ((e.toLong << 1) ^ (e.toLong >> 63)) & 0xffffffffL

  /** Smallest 4-bit Rice parameter minimizing the partition's coded
    * size (Σ quotient+1+param bits) — any choice decodes identically;
    * this one keeps the fixture honest about realistic streams. */
  private def bestRiceParam(e: Array[Int], from: Int, until: Int): Int = {
    var best = 0
    var bestCost = Long.MaxValue
    var p = 0
    while (p <= 14) {
      var cost = 0L
      var i = from
      while (i < until) { cost += (zigzag(e(i)) >>> p) + 1 + p; i += 1 }
      if (cost < bestCost) { bestCost = cost; best = p }
      p += 1
    }
    best
  }

  /** Rice residual partitions (method 0, 4-bit params). `escape` forces
    * the raw-bits escape code on partition 0 to keep that decode path
    * exercised. */
  private def writeResiduals(
      bw: BitWriter, e: Array[Int], n: Int, order: Int, po: Int,
      escape: Boolean): Unit = {
    bw.writeBits(0, 2)
    bw.writeBits(po, 4)
    val parts = 1 << po
    val per = n / parts
    var p = 0
    while (p < parts) {
      val from = if (p == 0) order else p * per
      val until = (p + 1) * per
      if (escape && p == 0) {
        bw.writeBits(15, 4)
        var raw = 0
        var i = from
        while (i < until) {
          while (raw < 31 && (e(i) < -(1 << math.max(raw - 1, 0)) ||
              e(i) >= (1 << math.max(raw - 1, 0)) || raw == 0 && e(i) != 0))
            raw += 1
          i += 1
        }
        bw.writeBits(raw, 5)
        if (raw > 0) {
          var j = from
          while (j < until) {
            bw.writeBits(e(j).toLong & ((1L << raw) - 1), raw); j += 1
          }
        }
      } else {
        val param = bestRiceParam(e, from, until)
        bw.writeBits(param, 4)
        var i = from
        while (i < until) {
          val u = zigzag(e(i))
          bw.writeUnary((u >>> param).toInt)
          if (param > 0) bw.writeBits(u & ((1L << param) - 1), param)
          i += 1
        }
      }
      p += 1
    }
  }

  /** One encoded subframe. `styp` 0 → FIXED (order `(fi+ch)%5`),
    * 1 → LPC (order `1+(fi*3+ch)%8`, precision 12, shift 9,
    * deterministic coefficients), 2 → VERBATIM. */
  private def writeSubframe(
      bw: BitWriter, xs: Array[Int], eff: Int, styp: Int, mid: Long,
      fi: Int, ch: Int): Unit = {
    val n = xs.length
    val mask = (1L << eff) - 1
    bw.writeBit(0)
    styp % 3 match {
      case 2 =>
        bw.writeBits(1, 6)
        bw.writeBit(0)
        var i = 0
        while (i < n) { bw.writeBits(xs(i).toLong & mask, eff); i += 1 }
      case 0 =>
        val order = ((fi + ch) % 5 + 5) % 5
        bw.writeBits(8 + order, 6)
        bw.writeBit(0)
        var i = 0
        while (i < order) { bw.writeBits(xs(i).toLong & mask, eff); i += 1 }
        val e = new Array[Int](n)
        i = order
        while (i < n) {
          val pred = order match {
            case 0 => 0L
            case 1 => xs(i - 1).toLong
            case 2 => 2L * xs(i - 1) - xs(i - 2)
            case 3 => 3L * xs(i - 1) - 3L * xs(i - 2) + xs(i - 3)
            case _ =>
              4L * xs(i - 1) - 6L * xs(i - 2) + 4L * xs(i - 3) - xs(i - 4)
          }
          e(i) = (xs(i) - pred).toInt
          i += 1
        }
        writeResiduals(bw, e, n, order, po = fi % 3,
          escape = (fi + ch) % 7 == 3)
      case _ =>
        val order = 1 + ((fi * 3 + ch) % 8 + 8) % 8
        bw.writeBits(32 + (order - 1), 6)
        bw.writeBit(0)
        var i = 0
        while (i < order) { bw.writeBits(xs(i).toLong & mask, eff); i += 1 }
        bw.writeBits(11, 4) // precision 12
        bw.writeBits(9, 5)  // shift 9
        val coefs = Array.tabulate(order) { j =>
          (((mid + fi * 7 + ch * 13 + j * 37) % 512 + 512) % 512).toInt - 256
        }
        var j = 0
        while (j < order) {
          bw.writeBits(coefs(j).toLong & 0xfff, 12); j += 1
        }
        val e = new Array[Int](n)
        i = order
        while (i < n) {
          var acc = 0L
          var k = 0
          while (k < order) { acc += coefs(k).toLong * xs(i - 1 - k); k += 1 }
          e(i) = xs(i) - (acc >> 9).toInt
          i += 1
        }
        writeResiduals(bw, e, n, order, po = fi % 3, escape = false)
    }
  }

  /** Deterministic COMPRESSED synthetic FLAC corpus: same container
    * conventions as [[syntheticFlacs]] (sample rate `rates[id%5]`,
    * channels `1 + id%2`, 4096-sample fixed blocks, CRC-8'd headers,
    * CRC-16'd frames) but with genuinely predicted subframes — cycling
    * FIXED orders 0–4, LPC orders 1–8 and VERBATIM per (frame, channel),
    * Rice partition orders 0–2, a forced raw-bits escape partition every
    * seventh (frame+channel), and for stereo media a rotating channel
    * assignment (independent → left/side → right/side → mid/side). The
    * [[flacWave]] sample values have a closed form, so q_m21 certifies
    * the FULL compressed decode against a DuckDB oracle, not just
    * row counts. Total samples `4096·(1 + id%4) + 2048·(id%3)`. */
  def syntheticFlacsCompressed(ids: DataFrame, id: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 22050, 44100, 48000)
    ids.select(col(id).cast("long").as("media_id"))
      // spread the NARROW id rows before the heavy per-row encode:
      // the upstream scan is often a single split, and shuffling
      // 8-byte ids is free next to shuffling the built payloads
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        it.map { mid =>
          val sr = rates((mid % 5).toInt)
          val channels = 1 + (mid % 2).toInt
          val total = 4096L * (1 + mid % 4) + 2048L * (mid % 3)
          val bos = new java.io.ByteArrayOutputStream()
          val b = java.nio.ByteBuffer.allocate(4 + 4 + 34)
          b.put("fLaC".getBytes("US-ASCII"))
          b.put(0x80.toByte)
          b.put(0.toByte).put(0.toByte).put(34.toByte)
          b.putShort(4096.toShort)
          b.putShort(4096.toShort)
          b.put(0.toByte).put(0.toByte).put(0.toByte)
          b.put(0.toByte).put(0.toByte).put(0.toByte)
          b.put(((sr >> 12) & 0xff).toByte)
          b.put(((sr >> 4) & 0xff).toByte)
          b.put((((sr & 0xf) << 4) | ((channels - 1) << 1)
            | (15 >> 4)).toByte)
          b.put((((15 & 0xf) << 4) | ((total >> 32) & 0xf).toInt).toByte)
          b.put(((total >> 24) & 0xff).toByte)
          b.put(((total >> 16) & 0xff).toByte)
          b.put(((total >> 8) & 0xff).toByte)
          b.put((total & 0xff).toByte)
          bos.write(b.array())
          var written = 0L
          var fi = 0
          while (written < total) {
            val n = math.min(4096L, total - written).toInt
            // stereo: rotate channel assignment; mono: independent
            val mode = if (channels == 1) 0 else 1 + (fi % 4)
            val chCode = mode match {
              case 0 => 0; case 1 => 1; case 2 => 8; case 3 => 9
              case _ => 10
            }
            val frame = new java.io.ByteArrayOutputStream()
            frame.write(0xff); frame.write(0xf8)
            frame.write(if (n == 4096) 0xc0 else 0x70)
            frame.write((chCode << 4) | (0x4 << 1))
            frame.write(fi & 0x7f)
            if (n != 4096) {
              frame.write(((n - 1) >> 8) & 0xff); frame.write((n - 1) & 0xff)
            }
            val hdr = frame.toByteArray
            frame.write(FlacCodec.crc8(hdr, 0, hdr.length))
            val l = Array.tabulate(n)(i => flacWave(mid, 0, fi, i))
            val r =
              if (channels == 2) Array.tabulate(n)(i => flacWave(mid, 1, fi, i))
              else null
            val (sigs, bpss) = mode match {
              case 0 => (Array(l), Array(16))
              case 1 => (Array(l, r), Array(16, 16))
              case 2 => // left/side
                (Array(l, Array.tabulate(n)(i => l(i) - r(i))),
                  Array(16, 17))
              case 3 => // side/right
                (Array(Array.tabulate(n)(i => l(i) - r(i)), r),
                  Array(17, 16))
              case _ => // mid/side (only the side channel gets the +1 bit)
                (Array(Array.tabulate(n)(i => (l(i) + r(i)) >> 1),
                  Array.tabulate(n)(i => l(i) - r(i))), Array(16, 17))
            }
            val bw = new BitWriter
            var ch = 0
            while (ch < sigs.length) {
              writeSubframe(bw, sigs(ch), bpss(ch),
                styp = (fi + ch) % 3, mid, fi, ch)
              ch += 1
            }
            frame.write(bw.toByteArray)
            val body = frame.toByteArray
            val crc = FlacCodec.crc16(body, 0, body.length)
            frame.write((crc >> 8) & 0xff); frame.write(crc & 0xff)
            bos.write(frame.toByteArray)
            written += n
            fi += 1
          }
          (mid, "audio", bos.toByteArray)
        }
      }
      .toDF("media_id", "kind", "bytes")
  }

  /** Deterministic synthetic MP3 corpus keyed off an id column: valid
    * CBR MPEG-1 Layer III frame sequences (128 kbps, sample rate
    * `[44100, 48000, 32000][id%3]`, `20 + id%40` frames, zeroed payloads —
    * the [[Mp3Probe]] frame walk is what q_m14 certifies; Huffman sample
    * data would need a real encoder and proves nothing about the walk). */
  def syntheticMp3s(ids: DataFrame, id: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(id).cast("long").as("media_id"))
      // spread the NARROW id rows before the heavy per-row encode:
      // the upstream scan is often a single split, and shuffling
      // 8-byte ids is free next to shuffling the built payloads
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        it.map { mid =>
          val srIdx = (mid % 3).toInt
          val sr = Array(44100, 48000, 32000)(srIdx)
          val frames = 20 + (mid % 40).toInt
          val flen = 144 * 128000 / sr // padding bit 0
          val buf = new Array[Byte](flen * frames)
          var f = 0
          while (f < frames) {
            val o = f * flen
            buf(o) = 0xFF.toByte
            buf(o + 1) = 0xFB.toByte // MPEG-1, Layer III, no CRC
            buf(o + 2) = ((9 << 4) | (srIdx << 2)).toByte // 128 kbps
            f += 1
          }
          (mid, "audio", buf)
        }
      }
      .toDF("media_id", "kind", "bytes")
  }

  /** Deterministic synthetic WebM corpus keyed off an id column: a valid
    * EBML tree — header + Segment(Info(TimestampScale, Duration) +
    * Tracks(TrackEntry(Video(PixelWidth, PixelHeight))) + two Clusters
    * of SimpleBlocks with real frame payloads) — all id-derived, so the
    * [[WebmProbe]] metadata walk (q_m15) and the [[WebmBlocks]] block
    * walk (q_m24) both have closed-form oracles. Width
    * `320 + (id%16)·16`, height `180 + (id%12)·16`, duration
    * `(3 + id%25)` seconds at the default 1 ms timestamp scale;
    * `3 + id%5` blocks at 40 ms cadence split across clusters at
    * timestamps 0 / 1000 ms, sizes `50 + 10·((id+i)%4)`, keyframes on
    * even blocks, frame bytes `(id·17 + i·5 + j) mod 256`. */
  def syntheticWebms(ids: DataFrame, id: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(id).cast("long").as("media_id"))
      // spread the NARROW id rows before the heavy per-row encode:
      // the upstream scan is often a single split, and shuffling
      // 8-byte ids is free next to shuffling the built payloads
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        it.map { mid =>
          val w = 320 + (mid % 16).toInt * 16
          val h = 180 + (mid % 12).toInt * 16
          val durMs = (3 + (mid % 25)) * 1000L
          val nBlocks = 3 + (mid % 5).toInt
          val c1 = (nBlocks + 1) / 2
          def el(idBytes: Array[Int], payload: Array[Byte]): Array[Byte] = {
            // 1-byte size below 127 (keeps the pre-cluster byte layout),
            // 2-byte 0x40xx form up to 16383 for the larger elements
            require(payload.length < 16384)
            val size =
              if (payload.length < 127)
                Array((0x80 | payload.length).toByte)
              else Array((0x40 | (payload.length >> 8)).toByte,
                (payload.length & 0xff).toByte)
            idBytes.map(_.toByte) ++ size ++ payload
          }
          def uintBytes(v: Long): Array[Byte] = {
            var n = v; var out = List.empty[Byte]
            do { out = (n & 0xff).toByte :: out; n >>= 8 } while (n > 0)
            out.toArray
          }
          val ebml = el(Array(0x1A, 0x45, 0xDF, 0xA3), Array.empty)
          val info = el(Array(0x15, 0x49, 0xA9, 0x66),
            el(Array(0x2A, 0xD7, 0xB1), uintBytes(1000000L)) ++
              el(Array(0x44, 0x89), java.nio.ByteBuffer.allocate(8)
                .putDouble(durMs.toDouble).array()))
          val video = el(Array(0xE0),
            el(Array(0xB0), uintBytes(w)) ++ el(Array(0xBA), uintBytes(h)))
          val tracks = el(Array(0x16, 0x54, 0xAE, 0x6B),
            el(Array(0xAE), video))
          def simpleBlock(i: Int, relTsMs: Int): Array[Byte] = {
            val sz = 50 + 10 * ((mid + i) % 4).toInt
            val frame = Array.tabulate(sz)(j =>
              ((mid * 17 + i * 5 + j) % 256).toByte)
            val hdr = java.nio.ByteBuffer.allocate(4)
              .put(0x81.toByte) // track 1 varint
              .putShort(relTsMs.toShort)
              .put((if (i % 2 == 0) 0x80 else 0x00).toByte) // keyframe
              .array()
            el(Array(0xA3), hdr ++ frame)
          }
          def cluster(tsMs: Long, blockIdx: Range): Array[Byte] =
            el(Array(0x1F, 0x43, 0xB6, 0x75),
              el(Array(0xE7), uintBytes(tsMs)) ++
                blockIdx.map(i => simpleBlock(i,
                  (i - blockIdx.start) * 40)).reduce(_ ++ _))
          val clusters =
            cluster(0L, 0 until c1) ++ cluster(1000L, c1 until nBlocks)
          val segment = el(Array(0x18, 0x53, 0x80, 0x67),
            info ++ tracks ++ clusters)
          (mid, "video", ebml ++ segment)
        }
      }
      .toDF("media_id", "kind", "bytes")
  }

  /** Deterministic synthetic MP4 corpus keyed off an id column: a valid
    * ISO-BMFF tree — `ftyp` + `moov(mvhd + trak(tkhd + mdia(mdhd +
    * minf(stbl(stts/stsc/stsz/stco/stss)))))` + a real `mdat` whose
    * per-sample bytes, sizes, timestamps, and keyframe flags are pure
    * functions of the id — so both the REAL [[Mp4Probe]] box walk
    * (q_m12) and the REAL [[Mp4Samples]] sample-table walk (q_m23) have
    * registered, driver-checkable queries with closed-form oracles.
    * Width `160 + (id%16)·8`, height `120 + (id%12)·8`, duration
    * `(2 + id%20)` seconds at movie timescale 600; `4 + id%5` samples at
    * 40 ms cadence (media timescale 1000), sizes `100 + 10·((id+i)%7)`,
    * sync samples every third, split across TWO chunks (so stsc has a
    * real run table), sample bytes `(id·31 + i·7 + j) mod 256`. */
  def syntheticMp4s(ids: DataFrame, id: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(id).cast("long").as("media_id"))
      // spread the NARROW id rows before the heavy per-row encode:
      // the upstream scan is often a single split, and shuffling
      // 8-byte ids is free next to shuffling the built payloads
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        it.map { mid =>
          val w = 160 + (mid % 16).toInt * 8
          val h = 120 + (mid % 12).toInt * 8
          val durSec = 2 + (mid % 20).toInt
          val nSamples = 4 + (mid % 5).toInt
          val sizes = Array.tabulate(nSamples)(i =>
            100 + 10 * ((mid + i) % 7).toInt)
          def box(tp: String, payload: Array[Byte]): Array[Byte] = {
            val b = java.nio.ByteBuffer.allocate(8 + payload.length)
            b.putInt(8 + payload.length)
            b.put(tp.getBytes("US-ASCII")); b.put(payload); b.array()
          }
          val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(16)
            .put("isom".getBytes("US-ASCII")).putInt(0)
            .put("isom".getBytes("US-ASCII"))
            .put("mp41".getBytes("US-ASCII")).array())
          val mvhd = {
            val b = java.nio.ByteBuffer.allocate(100)
            b.putInt(0)            // version 0 + flags
            b.putInt(0).putInt(0)  // creation, modification
            b.putInt(600)          // timescale
            b.putInt(durSec * 600) // duration
            b.putInt(0x00010000)   // rate 1.0
            b.putShort(0x0100.toShort) // volume
            b.position(b.position() + 10) // reserved
            b.putInt(0x00010000).putInt(0).putInt(0) // identity matrix
            b.putInt(0).putInt(0x00010000).putInt(0)
            b.putInt(0).putInt(0).putInt(0x40000000)
            b.position(b.position() + 24) // pre_defined
            b.putInt(2)            // next_track_ID
            box("mvhd", b.array())
          }
          val tkhd = {
            val b = java.nio.ByteBuffer.allocate(84)
            b.putInt(7)            // version 0, flags enabled|in-movie
            b.putInt(0).putInt(0)  // creation, modification
            b.putInt(1)            // track_ID
            b.putInt(0)            // reserved
            b.putInt(durSec * 600) // duration (movie timescale)
            b.position(b.position() + 8) // reserved
            b.putShort(0).putShort(0).putShort(0).putShort(0)
            b.putInt(0x00010000).putInt(0).putInt(0) // identity matrix
            b.putInt(0).putInt(0x00010000).putInt(0)
            b.putInt(0).putInt(0).putInt(0x40000000)
            b.putInt(w << 16).putInt(h << 16) // 16.16 fixed point
            box("tkhd", b.array())
          }
          val mdhd = {
            val b = java.nio.ByteBuffer.allocate(24)
            b.putInt(0)                 // version 0 + flags
            b.putInt(0).putInt(0)       // creation, modification
            b.putInt(1000)              // media timescale
            b.putInt(nSamples * 40)     // media duration
            b.putShort(0x55C4.toShort)  // language "und"
            b.putShort(0)               // pre_defined
            box("mdhd", b.array())
          }
          def fullbox(tp: String, payload: Array[Byte]): Array[Byte] =
            box(tp, new Array[Byte](4) ++ payload) // version 0, flags 0
          val stts = fullbox("stts", java.nio.ByteBuffer.allocate(12)
            .putInt(1).putInt(nSamples).putInt(40).array())
          val c1 = (nSamples + 1) / 2 // chunk 1 gets the larger half
          val stsc = fullbox("stsc", java.nio.ByteBuffer.allocate(28)
            .putInt(2)
            .putInt(1).putInt(c1).putInt(1)
            .putInt(2).putInt(nSamples - c1).putInt(1).array())
          val stsz = {
            val b = java.nio.ByteBuffer.allocate(8 + 4 * nSamples)
            b.putInt(0).putInt(nSamples) // sample_size 0 -> per-sample
            sizes.foreach(b.putInt)
            fullbox("stsz", b.array())
          }
          val syncs = (0 until nSamples).filter(_ % 3 == 0)
          val stss = {
            val b = java.nio.ByteBuffer.allocate(4 + 4 * syncs.length)
            b.putInt(syncs.length)
            syncs.foreach(i => b.putInt(i + 1)) // 1-based sample numbers
            fullbox("stss", b.array())
          }
          // two-pass: build with zeroed chunk offsets to learn the mdat
          // payload position (box lengths don't depend on the values),
          // then rebuild with the real absolute offsets
          def assemble(off1: Int, off2: Int): Array[Byte] = {
            val stco = fullbox("stco", java.nio.ByteBuffer.allocate(12)
              .putInt(2).putInt(off1).putInt(off2).array())
            val stbl = box("stbl", stts ++ stsc ++ stsz ++ stco ++ stss)
            val mdia = box("mdia", mdhd ++ box("minf", stbl))
            ftyp ++ box("moov", mvhd ++ box("trak", tkhd ++ mdia))
          }
          val mdatStart = assemble(0, 0).length + 8
          val header = assemble(mdatStart, mdatStart + sizes.take(c1).sum)
          val payload = new Array[Byte](sizes.sum)
          var p = 0
          var i = 0
          while (i < nSamples) {
            var j = 0
            while (j < sizes(i)) {
              payload(p) = ((mid * 31 + i * 7 + j) % 256).toByte
              p += 1; j += 1
            }
            i += 1
          }
          (mid, "video", header ++ box("mdat", payload))
        }
      }
      .toDF("media_id", "kind", "bytes")
  }

  /** REAL ISO-BMFF sample-table walk — the per-sample companion of
    * [[Mp4Probe]]: `stbl`'s five tables resolved into one row per sample
    * with its ABSOLUTE byte range, decode timestamp, and sync flag.
    * This is the operator a 100 TB video pipeline runs before any
    * decoding: keyframe byte ranges feed an external decoder (or a
    * range-request fetcher) without touching the samples themselves —
    * container math only, no codec. Bounds-checked like the probe; a
    * malformed table yields None, never a throw. */
  object Mp4Samples {
    /** One media sample: 0-based index, absolute byte offset + size,
      * decode timestamp in ms (stts deltas over the mdhd timescale),
      * sync/keyframe flag (stss; absent table = all sync per spec). */
    final case class Sample(
        idx: Int, offset: Long, size: Long, dtsMs: Long, keyframe: Boolean)

    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def u64(b: Array[Byte], o: Int): Long =
      (u32(b, o) << 32) | u32(b, o + 4)
    private def boxType(b: Array[Byte], o: Int): String =
      new String(b, o + 4, 4, "US-ASCII")

    private def walk(b: Array[Byte], start: Int, end: Int)(
        f: (String, Int, Int) => Unit): Unit = {
      var o = start
      while (o + 8 <= end) {
        val size0 = u32(b, o)
        val (size, hdr) =
          if (size0 == 1 && o + 16 <= end) (u64(b, o + 8), 16)
          else if (size0 == 0) ((end - o).toLong, 8)
          else (size0, 8)
        if (size < hdr || o + size > end) return
        f(boxType(b, o), o + hdr, o + size.toInt)
        o += size.toInt
      }
    }

    /** The first track's samples; None unless the payload carries a
      * complete, self-consistent stbl. `maxSamples` bounds hostile
      * counts before any allocation. */
    def sampleTable(
        bytes: Array[Byte], maxSamples: Int = 1 << 20): Option[Seq[Sample]] =
      try {
        if (bytes.length < 12 || boxType(bytes, 0) != "ftyp") return None
        var timescale = 0L
        var stts: Array[(Long, Long)] = null
        var stsc: Array[(Long, Long)] = null // (first_chunk, per_chunk)
        var sizes: Array[Long] = null
        var chunkOffs: Array[Long] = null
        var syncs: Set[Long] = null
        var found = false
        walk(bytes, 0, bytes.length) {
          case ("moov", ms, me) => walk(bytes, ms, me) {
            case ("trak", ts0, te) if !found => walk(bytes, ts0, te) {
              case ("mdia", ds, de) => walk(bytes, ds, de) {
                case ("mdhd", ps, pe) =>
                  val v = bytes(ps) & 0xff
                  if (v == 0 && ps + 16 <= pe) timescale = u32(bytes, ps + 12)
                  else if (v == 1 && ps + 24 <= pe)
                    timescale = u32(bytes, ps + 20)
                case ("minf", fs, fe) => walk(bytes, fs, fe) {
                  case ("stbl", ss, se) =>
                    found = true
                    walk(bytes, ss, se) {
                      case ("stts", ps, pe) if ps + 8 <= pe =>
                        val n = math.min(u32(bytes, ps + 4),
                          ((pe - ps - 8) / 8).toLong).toInt
                        stts = Array.tabulate(n)(i =>
                          (u32(bytes, ps + 8 + i * 8),
                            u32(bytes, ps + 12 + i * 8)))
                      case ("stsc", ps, pe) if ps + 8 <= pe =>
                        val n = math.min(u32(bytes, ps + 4),
                          ((pe - ps - 8) / 12).toLong).toInt
                        stsc = Array.tabulate(n)(i =>
                          (u32(bytes, ps + 8 + i * 12),
                            u32(bytes, ps + 12 + i * 12)))
                      case ("stsz", ps, pe) if ps + 12 <= pe =>
                        val fixed = u32(bytes, ps + 4)
                        val n = u32(bytes, ps + 8)
                        if (n <= maxSamples) {
                          if (fixed != 0)
                            sizes = Array.fill(n.toInt)(fixed)
                          else if (ps + 12 + n * 4 <= pe)
                            sizes = Array.tabulate(n.toInt)(i =>
                              u32(bytes, ps + 12 + i * 4))
                        }
                      case ("stco", ps, pe) if ps + 8 <= pe =>
                        val n = math.min(u32(bytes, ps + 4),
                          ((pe - ps - 8) / 4).toLong).toInt
                        chunkOffs = Array.tabulate(n)(i =>
                          u32(bytes, ps + 8 + i * 4))
                      case ("co64", ps, pe) if ps + 8 <= pe =>
                        val n = math.min(u32(bytes, ps + 4),
                          ((pe - ps - 8) / 8).toLong).toInt
                        chunkOffs = Array.tabulate(n)(i =>
                          u64(bytes, ps + 8 + i * 8))
                      case ("stss", ps, pe) if ps + 8 <= pe =>
                        val n = math.min(u32(bytes, ps + 4),
                          ((pe - ps - 8) / 4).toLong).toInt
                        syncs = (0 until n)
                          .map(i => u32(bytes, ps + 8 + i * 4)).toSet
                      case _ => ()
                    }
                  case _ => ()
                }
                case _ => ()
              }
              case _ => ()
            }
            case _ => ()
          }
          case _ => ()
        }
        if (!found || timescale <= 0 || stts == null || stsc == null ||
          sizes == null || chunkOffs == null) return None
        val n = sizes.length
        // stts deltas -> per-sample decode times
        val dts = new Array[Long](n)
        var si = 0
        var t = 0L
        stts.foreach { case (cnt, delta) =>
          var c = 0L
          while (c < cnt && si < n) {
            dts(si) = t * 1000L / timescale
            t += delta; c += 1; si += 1
          }
        }
        if (si < n) return None // stts covers fewer samples than stsz
        // stsc runs + chunk offsets -> per-sample absolute offsets
        val out = Vector.newBuilder[Sample]
        var sample = 0
        var ci = 0
        while (ci < chunkOffs.length && sample < n) {
          val chunkNo = ci + 1L
          // samples-per-chunk for this chunk: last stsc run whose
          // first_chunk <= chunkNo
          var spc = 0L
          stsc.foreach { case (first, per) =>
            if (first <= chunkNo) spc = per
          }
          var off = chunkOffs(ci)
          var s = 0L
          while (s < spc && sample < n) {
            if (off < 0 || off + sizes(sample) > bytes.length) return None
            out += Sample(sample, off, sizes(sample), dts(sample),
              syncs == null || syncs.contains(sample + 1L))
            off += sizes(sample)
            sample += 1; s += 1
          }
          ci += 1
        }
        if (sample < n) return None // chunks cover fewer samples
        Some(out.result())
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[Mp4Samples.sampleTable]] as a narrow operator: one row per sample
    * with absolute byte range, decode timestamp, and keyframe flag —
    * plus `rel_offset` (offset − first sample's offset), the
    * layout-independent form a closed-form oracle can state (q_m23).
    * Non-MP4 / sample-less payloads emit nothing. */
  def mp4SampleTable(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          Mp4Samples.sampleTable(bytes).toSeq.flatMap { samples =>
            // rel base = sample 0's offset, known right here — no
            // window/shuffle needed for the layout-independent column
            val base = samples.headOption.map(_.offset).getOrElse(0L)
            samples.map(s => (mid, s.idx, s.offset, s.size, s.dtsMs,
              s.keyframe, s.offset - base))
          }
        }
      }
      .toDF("media_id", "sample_idx", "offset", "size", "dts_ms",
        "keyframe", "rel_offset")
  }

  /** Deterministic synthetic image corpus keyed off an id column: each id
    * renders a small gradient image whose pixels, dimensions, and encoded
    * bytes are pure functions of the id. Exists so the REAL ImageIO decode
    * path has a registered, driver-checkable query (q_m3) — production
    * pipelines read genuine payloads off object storage instead; the
    * decode side is identical. Rendering runs executor-side in the same
    * narrow map shape as decode.
    *
    * `format` picks the container: "png" (lossless, the default) or
    * "jpeg" — a crawl meets JPEG long before PNG, and the decode path is
    * the same ImageIO call either way (q_m11 certifies it). Dimensions
    * survive JPEG exactly; pixels are lossy, which is precisely what the
    * perceptual-dHash robustness spec exercises. */
  def syntheticImages(
      ids: DataFrame, id: String, format: String = "png"): DataFrame = {
    require(Set("png", "jpeg", "gif", "bmp")(format),
      s"unsupported image format: $format")
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(id).cast("long").as("media_id"))
      // spread the NARROW id rows before the heavy per-row encode:
      // the upstream scan is often a single split, and shuffling
      // 8-byte ids is free next to shuffling the built payloads
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        it.map { mid =>
          val w = 8 + (mid % 16).toInt
          val h = 8 + (mid % 12).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // gradient seeded by the id: every channel a pure function
              val r = ((mid * 31 + x * 8) % 256).toInt
              val g = ((mid * 17 + y * 8) % 256).toInt
              val b = ((mid + x + y) % 256).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          if (format == "jpeg") {
            // explicit quality 0.9: ImageIO's 0.75 default rings hard on
            // the mod-256 gradient wraps at these tiny (8–23 px) sizes,
            // pushing a few dHashes past the near-dup banding threshold.
            // 0.9 is representative of crawl JPEGs while staying genuinely
            // lossy (pixels still differ from the PNG twin).
            val writer = javax.imageio.ImageIO
              .getImageWritersByFormatName("jpeg").next()
            val param = writer.getDefaultWriteParam
            param.setCompressionMode(
              javax.imageio.ImageWriteParam.MODE_EXPLICIT)
            param.setCompressionQuality(0.9f)
            val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
            try {
              writer.setOutput(ios)
              writer.write(null,
                new javax.imageio.IIOImage(img, null, null), param)
            } finally { ios.close(); writer.dispose() }
          } else javax.imageio.ImageIO.write(img, format, bos)
          (mid, "image", bos.toByteArray)
        }
      }
      .toDF("media_id", "kind", "bytes")
  }

  /** Shared 16-bit-PCM decode behind the frequency-domain operators:
    * javax.sound container recognition (WAV/AIFF/AU) first, [[FlacCodec]]
    * fallback — the same order as [[audioStats]], but returning the raw
    * interleaved samples instead of a reduction.
    *
    * @return (sampleRate, channels, interleaved samples) */
  def decodePcm(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case scala.util.control.NonFatal(_) => null
      }
    if (ais == null) FlacCodec.decodeSamples(bytes)
    else {
      try {
        val fmt = ais.getFormat
        val ok = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && ais.getFrameLength > 0 &&
          fmt.getFrameRate > 0f
        if (!ok) None
        else {
          val raw = ais.readAllBytes()
          val n = raw.length / 2
          if (n == 0) None
          else {
            val out = new Array[Short](n)
            var i = 0
            while (i < n) {
              out(i) =
                if (fmt.isBigEndian)
                  (((raw(2 * i) & 0xFF) << 8) | (raw(2 * i + 1) & 0xFF))
                    .toShort
                else
                  (((raw(2 * i + 1) & 0xFF) << 8) | (raw(2 * i) & 0xFF))
                    .toShort
              i += 1
            }
            Some((math.round(fmt.getFrameRate), fmt.getChannels, out))
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally ais.close()
    }
  }

  /** Frequency-domain audio features — the feature-extraction step a
    * curation pipeline runs between decode and screening (tonality /
    * noisiness / frequency-content filters on crawled audio). Pure Scala
    * DSP over the decoded PCM of [[decodePcm]]: no native libraries, no
    * plan-shape difference from any other narrow decode map.
    *
    * The per-payload reduction: mono-mix the channels, cut
    * `frameSize`-sample frames every `hop` samples (trailing partial
    * frame dropped), Hann-window each, radix-2 FFT ([[Dsp.fft]]),
    * average the per-frame power spectra, then reduce the averaged
    * spectrum to the standard shape descriptors:
    *
    *  - `centroid_hz` — power-weighted mean frequency;
    *  - `rolloff_hz`  — smallest frequency below which 85% of the power
    *    lies;
    *  - `bandwidth_hz` — power-weighted standard deviation around the
    *    centroid;
    *  - `flatness` — geometric / arithmetic mean of the power bins
    *    (DC excluded): →1 for white noise, →0 for pure tones.
    *
    * AudioSpectralSpec certifies the math (FFT vs a naïve DFT
    * differential, closed-form sine/two-tone/noise fixtures, WAV-vs-FLAC
    * path agreement); q_m25 hash-certifies framing + robust DSP verdicts
    * on the synthetic square-wave corpus against the SQL oracle. */
  object Dsp {

    /** In-place iterative radix-2 Cooley-Tukey FFT (decimation in time,
      * negative-exponent convention). Lengths must be a power of two. */
    def fft(re: Array[Double], im: Array[Double]): Unit = {
      val n = re.length
      require(n == im.length && n > 0 && (n & (n - 1)) == 0,
        s"FFT length must be a power of two: $n vs ${im.length}")
      var i = 1
      var j = 0
      while (i < n) {
        var bit = n >> 1
        while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
        j |= bit
        if (i < j) {
          val tr = re(i); re(i) = re(j); re(j) = tr
          val ti = im(i); im(i) = im(j); im(j) = ti
        }
        i += 1
      }
      var len = 2
      while (len <= n) {
        val ang = -2.0 * math.Pi / len
        val wr = math.cos(ang)
        val wi = math.sin(ang)
        var blk = 0
        while (blk < n) {
          var cr = 1.0
          var ci = 0.0
          var k = 0
          while (k < len / 2) {
            val a = blk + k
            val b = a + len / 2
            val xr = re(b) * cr - im(b) * ci
            val xi = re(b) * ci + im(b) * cr
            re(b) = re(a) - xr
            im(b) = im(a) - xi
            re(a) += xr
            im(a) += xi
            val ncr = cr * wr - ci * wi
            ci = cr * wi + ci * wr
            cr = ncr
            k += 1
          }
          blk += len
        }
        len <<= 1
      }
    }

    /** Hann-windowed averaged power spectrum of a mono signal: one
      * `frameSize/2 + 1`-bin array (DC..Nyquist), the mean over all full
      * frames at stride `hop`. None when the signal is shorter than one
      * frame. */
    def powerSpectrum(
        mono: Array[Double], frameSize: Int, hop: Int)
        : Option[Array[Double]] = {
      require(frameSize > 0 && (frameSize & (frameSize - 1)) == 0,
        s"frameSize must be a power of two: $frameSize")
      require(hop > 0, s"hop must be positive: $hop")
      if (mono.length < frameSize) return None
      val nFrames = 1 + (mono.length - frameSize) / hop
      val window = Array.tabulate(frameSize)(i =>
        0.5 * (1.0 - math.cos(2.0 * math.Pi * i / frameSize)))
      val nBins = frameSize / 2 + 1
      val acc = new Array[Double](nBins)
      val re = new Array[Double](frameSize)
      val im = new Array[Double](frameSize)
      var f = 0
      while (f < nFrames) {
        val off = f * hop
        var i = 0
        while (i < frameSize) {
          re(i) = mono(off + i) * window(i)
          im(i) = 0.0
          i += 1
        }
        fft(re, im)
        var k = 0
        while (k < nBins) {
          acc(k) += re(k) * re(k) + im(k) * im(k)
          k += 1
        }
        f += 1
      }
      var k = 0
      while (k < nBins) { acc(k) /= nFrames; k += 1 }
      Some(acc)
    }

    /** The averaged-spectrum shape descriptors (see [[Dsp]] scaladoc). */
    final case class Spectral(
        nFrames: Int, centroidHz: Double, rolloffHz: Double,
        bandwidthHz: Double, flatness: Double)

    /** Spectral descriptors of interleaved PCM. None when the payload is
      * shorter than one frame or totally silent (no power to describe). */
    def spectral(
        sampleRate: Int, channels: Int, samples: Array[Short],
        frameSize: Int = 512, hop: Int = 256): Option[Spectral] = {
      require(sampleRate > 0 && channels > 0,
        s"bad PCM meta: sr=$sampleRate ch=$channels")
      val nMono = samples.length / channels
      val mono = new Array[Double](nMono)
      var i = 0
      while (i < nMono) {
        var c = 0
        var s = 0.0
        while (c < channels) { s += samples(i * channels + c); c += 1 }
        mono(i) = s / channels
        i += 1
      }
      powerSpectrum(mono, frameSize, hop).flatMap { p =>
        val nFrames = 1 + (nMono - frameSize) / hop
        val hzPerBin = sampleRate.toDouble / frameSize
        var total = 0.0
        var moment = 0.0
        var k = 0
        while (k < p.length) {
          total += p(k)
          moment += p(k) * k * hzPerBin
          k += 1
        }
        if (total <= 0.0) None
        else {
          val centroid = moment / total
          var cum = 0.0
          var kRoll = 0
          var found = false
          k = 0
          while (k < p.length && !found) {
            cum += p(k)
            if (cum >= 0.85 * total) { kRoll = k; found = true }
            k += 1
          }
          var variance = 0.0
          k = 0
          while (k < p.length) {
            val d = k * hzPerBin - centroid
            variance += p(k) * d * d
            k += 1
          }
          // flatness over the DC-excluded bins; the tiny floor keeps
          // log-zero leakage bins finite without moving real spectra
          val eps = 1e-20
          var logSum = 0.0
          var ariSum = 0.0
          k = 1
          while (k < p.length) {
            logSum += math.log(p(k) + eps)
            ariSum += p(k) + eps
            k += 1
          }
          val nf = (p.length - 1).toDouble
          val flat = math.exp(logSum / nf) / (ariSum / nf)
          Some(Spectral(nFrames, centroid, kRoll * hzPerBin,
            math.sqrt(variance / total), flat))
        }
      }
    }
  }

  /** [[Dsp.spectral]] over a media table — the same narrow-map shape as
    * [[audioStatsOf]] (undecodable / sub-frame-length / silent payloads
    * drop).
    *
    * @return media_id, sample_rate, n_frames, centroid_hz, rolloff_hz,
    *         bandwidth_hz, flatness */
  def audioSpectralOf(
      media: DataFrame, frameSize: Int = 512, hop: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .transform(spreadForDecode)
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          decodePcm(bytes).flatMap { case (sr, ch, ss) =>
            Dsp.spectral(sr, ch, ss, frameSize, hop).map { sp =>
              (mid, sr, sp.nFrames.toLong, sp.centroidHz, sp.rolloffHz,
                sp.bandwidthHz, sp.flatness)
            }
          }
        }
      }
      .toDF("media_id", "sample_rate", "n_frames", "centroid_hz",
        "rolloff_hz", "bandwidth_hz", "flatness")
  }

  /** One-decode audio profile: [[audioStats]]' time-domain screens AND
    * [[Dsp.spectral]]'s frequency-domain descriptors from a single PCM
    * decode — the fused pass a curation pipeline wants when it screens on
    * both (silence/clipping AND tonality), instead of decoding every
    * payload twice. Same narrow-map shape and drop semantics as the
    * single-facet operators; the time-domain numbers are bit-identical to
    * [[audioStatsOf]]'s and the spectral ones to [[audioSpectralOf]]'s
    * (one shared kernel each), which is how q_m27's oracle can state the
    * union of q_m17's and q_m25's closed forms.
    *
    * @return media_id, rms, peak, silence_ratio, zero_crossings,
    *         sample_rate, n_frames, centroid_hz, rolloff_hz,
    *         bandwidth_hz, flatness */
  def audioProfile(
      media: DataFrame, silenceFraction: Double = 0.01,
      frameSize: Int = 512, hop: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .transform(spreadForDecode)
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          decodePcm(bytes).flatMap { case (sr, ch, ss) =>
            for {
              st <- statsOfPcm(Some(ss), silenceFraction)
              sp <- Dsp.spectral(sr, ch, ss, frameSize, hop)
            } yield (mid, st._1, st._2, st._3, st._4, sr,
              sp.nFrames.toLong, sp.centroidHz, sp.rolloffHz,
              sp.bandwidthHz, sp.flatness)
          }
        }
      }
      .toDF("media_id", "rms", "peak", "silence_ratio", "zero_crossings",
        "sample_rate", "n_frames", "centroid_hz", "rolloff_hz",
        "bandwidth_hz", "flatness")
  }

  /** Spectral hot-band hash — the frequency-domain twin of
    * [[audioFingerprint]] (whose 64 bits compare the TIME-envelope band
    * RMS, so a trimmed copy shifts every band). Bit `b` here is "band b
    * is hot": the averaged power ([[Dsp.powerSpectrum]]) summed over 4
    * consecutive bins (DC excluded — bins 4b+1..4b+4 of a `frameSize/2`
    * spectrum) exceeds the all-band mean. Two exact invariances follow:
    *
    *  - volume: scaling every sample by c multiplies every band AND the
    *    mean by c², leaving each comparison unchanged;
    *  - trim/shift for frame-periodic content: a time shift only rotates
    *    FFT phase, and the power spectrum discards phase, so any copy
    *    that still yields ≥1 full frame hashes identically.
    *
    * Distinct tone content lands in distinct hot-band sets, so content
    * matching is a hamming-0 equi-join on this hash (q_m26, via the same
    * banded [[graft.operators.Dedup.hamming64Pairs]] path as image/video
    * near-dup — no all-pairs comparison at any scale). */
  def audioSpectralHash(
      bytes: Array[Byte], frameSize: Int = 512, hop: Int = 256)
      : Option[Long] =
    decodePcm(bytes).flatMap { case (_, channels, ss) =>
      val nMono = ss.length / channels
      val mono = new Array[Double](nMono)
      var i = 0
      while (i < nMono) {
        var c = 0
        var s = 0.0
        while (c < channels) { s += ss(i * channels + c); c += 1 }
        mono(i) = s / channels
        i += 1
      }
      require(frameSize >= 260,
        s"frameSize $frameSize too small for 64 4-bin bands")
      Dsp.powerSpectrum(mono, frameSize, hop).map { p =>
        val bandPow = new Array[Double](64)
        var total = 0.0
        var b = 0
        while (b < 64) {
          var k = 4 * b + 1
          val hi = 4 * b + 4
          var s = 0.0
          while (k <= hi) { s += p(k); k += 1 }
          bandPow(b) = s
          total += s
          b += 1
        }
        val mean = total / 64.0
        var fp = 0L
        b = 0
        while (b < 64) {
          if (bandPow(b) > mean) fp |= 1L << b
          b += 1
        }
        fp
      }
    }

  /** [[audioSpectralHash]] over a media table (undecodable / sub-frame
    * payloads drop).
    *
    * @return media_id, spectral_hash */
  def audioSpectralHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .transform(spreadForDecode)
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          audioSpectralHash(bytes).map(fp => (mid, fp))
        }
      }
      .toDF("media_id", "spectral_hash")
  }

  /** Deterministic multi-tone WAV corpus for content-level audio dedup:
    * each row of `keys` — (media_id, content_id, scale, trim) — becomes
    * a mono 8 kHz WAV of five equal-amplitude sines whose frequencies
    * derive from `content_id` alone. The five land mid-band in five
    * DISJOINT ranges of [[audioSpectralHash]]'s 64 bands
    * (`b = r₀ + content_id mod m` with disjoint (r₀, m) per tone, all
    * moduli pairwise co-prime), and every frequency is an exact multiple
    * of 8000/512 Hz — on-bin at the hash's frame size, so the Hann
    * kernel stays inside one band and a time trim changes no frame's
    * magnitude spectrum. `scale` multiplies every sample; `trim` drops
    * that many samples from the front. Two rows therefore hash
    * identically iff they share `content_id` — regardless of scale and
    * trim — which is the closed form q_m26's oracle states. */
  def syntheticTones(keys: DataFrame): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys
      .select(col("media_id").cast("long"), col("content_id").cast("long"),
        col("scale").cast("double"), col("trim").cast("int"))
      // spread the NARROW key rows before the heavy per-row encode
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Long, Double, Int)]
      .mapPartitions { it =>
        it.map { case (mid, c, scale, trim) =>
          val bands = Array(
            (c % 11).toInt, 12 + (c % 13).toInt, 26 + (c % 7).toInt,
            34 + (c % 9).toInt, 44 + (c % 16).toInt)
          val freqs = bands.map(b => (4 * b + 2) * 8000.0 / 512)
          val n = 2048 + (c % 8).toInt * 512 - trim
          require(n >= 512, s"trim $trim leaves < one frame: $n")
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val t = i + trim // the untrimmed timeline, so trim = a cut
            var v = 0.0
            var j = 0
            while (j < 5) {
              v += 5000.0 * math.sin(2 * math.Pi * freqs(j) * t / 8000.0)
              j += 1
            }
            val s = math.max(-32768, math.min(32767,
              math.round(v * scale))).toInt.toShort
            pcm(2 * i) = (s & 0xFF).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (mid, "audio", bos.toByteArray)
        }
      }
      .toDF("media_id", "kind", "bytes")
  }
}
