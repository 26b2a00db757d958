package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.Multimodal

/** Multimodal binary-column certification: metadata/digest path has a full
  * oracle; the stub-decoded feature extraction is engine-side (rows-only). */
object MultimodalQ {

  val qM1BinaryMeta = Q(
    "q_m1_binary_meta",
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |       CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio'
      |            ELSE 'video' END AS kind,
      |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |       md5(text) AS digest
      |FROM documents""".stripMargin) { (s, d) =>
    Multimodal.asMediaTable(documents(s, d), "doc_id", "text")
      .select(
        col("media_id"), col("kind"),
        length(col("bytes")).cast("long").as("n_bytes"),
        md5(col("bytes")).as("digest"))
  }

  /** REAL mixed-modality feature extraction, hash-certified: one
    * [[Multimodal.extractFeatures]] pass over a corpus where EVERY row
    * takes a real decode path — PNG via ImageIO, 16-bit PCM WAV via
    * javax.sound, Y4M via the header+frame parse — and the recovered
    * geometry/duration are closed-form functions of the id, so the
    * oracle states per modality what a correct decoder must return
    * (width/height for images and video, duration for audio and video,
    * zeros for the dimensions a modality does not have). Library users
    * get the typed Dataset with the raw `features` vector riding the
    * same decode; those floats are pinned exactly in NorthStarSpec
    * (engine-side arithmetic — not restatable in SQL). */
  val qM2Features = Q(
    "q_m2_media_features",
    """SELECT CAST(doc_id AS BIGINT) AS media_id, 'image' AS kind,
      |       CAST(8 + doc_id % 16 AS INT) AS width,
      |       CAST(8 + doc_id % 12 AS INT) AS height,
      |       CAST(0 AS BIGINT) AS duration_ms
      |FROM documents WHERE doc_id % 8 = 0
      |UNION ALL
      |SELECT CAST(doc_id AS BIGINT), 'audio', CAST(0 AS INT), CAST(0 AS INT),
      |       CAST((800 + (doc_id % 32) * 80) * 1000 / 8000 AS BIGINT)
      |FROM documents WHERE doc_id % 8 = 1
      |UNION ALL
      |SELECT CAST(doc_id AS BIGINT), 'video',
      |       CAST(8 + (doc_id % 8) * 2 AS INT),
      |       CAST(8 + (doc_id % 6) * 2 AS INT),
      |       CAST((4 + doc_id % 16) * 100 AS BIGINT)
      |FROM documents WHERE doc_id % 8 = 2""".stripMargin) { (s, d) =>
    val base = documents(s, d)
    val media = Multimodal.syntheticImages(
        base.filter(col("doc_id") % 8 === 0), "doc_id")
      .unionByName(Multimodal.syntheticAudio(
        base.filter(col("doc_id") % 8 === 1), "doc_id"))
      .unionByName(Multimodal.syntheticVideos(
        base.filter(col("doc_id") % 8 === 2), "doc_id"))
    Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"),
        col("width"), col("height"), col("duration_ms"))
  }

  /** REAL image decode, hash-certified: synthetic PNGs are rendered with
    * dimensions that are pure functions of the id, so the oracle can state
    * what a correct decoder must recover — javax.imageio runs on the Spark
    * side, closed-form arithmetic on the DuckDB side. The luma features
    * ride the same decode and are pinned exactly in NorthStarSpec. */
  val qM3ImageDecode = Q(
    "q_m3_image_decode",
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |       CAST(8 + doc_id % 16 AS INT) AS width,
      |       CAST(8 + doc_id % 12 AS INT) AS height
      |FROM documents WHERE doc_id % 8 = 0""".stripMargin) { (s, d) =>
    Multimodal.extractFeatures(
      Multimodal.syntheticImages(
        documents(s, d).filter(col("doc_id") % 8 === 0), "doc_id")).toDF()
      .select(col("media_id"), col("width"), col("height"))
  }

  /** REAL resize round-trip, hash-certified: synthetic PNGs → bilinear
    * fit-within-12×12 → PNG re-encode → RE-DECODE of the resized payload.
    * The reported dimensions come from decoding the resized bytes, so the
    * oracle's closed-form `floor(dim·min(1, 12/w, 12/h))` certifies the
    * whole decode→resize→encode→decode chain, not an echoed field. Bounds
    * of 12 (not 16) make the certified query exercise the REAL resample:
    * the doc_id%8=0 slice renders w∈{8,16}, h∈{8,12,16}, so 16-pixel dims
    * downscale by 12/16 = 0.75 — FP-exact, keeping floor(dim·sc)
    * bit-stable across Spark and DuckDB. */
  val qM4ImageResize = Q(
    "q_m4_image_resize",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
      |                  CAST(8 + doc_id % 16 AS DOUBLE) AS w,
      |                  CAST(8 + doc_id % 12 AS DOUBLE) AS h
      |           FROM documents WHERE doc_id % 8 = 0),
      |s AS (SELECT media_id, w, h, least(12.0 / w, 12.0 / h, 1.0) AS sc
      |      FROM t)
      |SELECT media_id,
      |       CAST(greatest(1, floor(w * sc)) AS INT) AS width,
      |       CAST(greatest(1, floor(h * sc)) AS INT) AS height
      |FROM s""".stripMargin) { (s, d) =>
    val resized = Multimodal.resizeImages(
      Multimodal.syntheticImages(
        documents(s, d).filter(col("doc_id") % 8 === 0), "doc_id"),
      maxW = 12, maxH = 12).toDF()
    Multimodal.extractFeatures(
        resized.select(col("media_id"), col("kind"), col("bytes"))).toDF()
      .select(col("media_id"), col("width"), col("height"))
  }

  /** REAL frame sampling, hash-certified: [[Multimodal.sampleFrames]]
    * over the Y4M corpus, where duration (and thus the fan-out
    * cardinality `duration/300ms + 1`) comes from the REAL header+frame
    * probe, and each emitted frame is real decoded pixels re-encoded as
    * PNG. The sampled frames are then RE-DECODED through the image path
    * and joined back on (media_id, frame_idx), so the oracle certifies
    * the whole chain — sampling cadence, per-media cardinality, and
    * that every sampled frame decodes to the source video's geometry —
    * in closed form. The join key is a composite long (the frame-id
    * fan-out is ≤32 per media by the operator's cap); at scale both
    * sides are the same narrow decode pipeline, joined on one
    * equi-key. */
  val qM5FrameSample = Q(
    "q_m5_frame_sample",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
      |                  CAST(8 + (doc_id % 8) * 2 AS INT) AS width,
      |                  CAST(8 + (doc_id % 6) * 2 AS INT) AS height,
      |                  (4 + doc_id % 16) * 100 AS dur
      |           FROM documents WHERE doc_id % 8 = 2)
      |SELECT t.media_id,
      |       CAST(f.i AS INT) AS frame_idx,
      |       CAST(f.i * 300 AS BIGINT) AS ts_ms,
      |       t.width, t.height
      |FROM t, unnest(generate_series(0, CAST(t.dur // 300 AS BIGINT)))
      |       AS f(i)""".stripMargin) {
    (s, d) =>
      val frames = Multimodal.sampleFrames(
          Multimodal.syntheticVideos(
            documents(s, d).filter(col("doc_id") % 8 === 2), "doc_id"),
          everyMs = 300L).toDF()
        .withColumn("k", col("media_id") * 100 + col("frame_idx"))
      val dims = Multimodal.extractFeatures(
          frames.select(col("k").as("media_id"),
            lit("image").as("kind"), col("frame").as("bytes"))).toDF()
        .select(col("media_id").as("k"), col("width"), col("height"))
      frames.join(dims, Seq("k"))
        .select(col("media_id"), col("frame_idx"), col("ts_ms"),
          col("width"), col("height"))
  }

  /** REAL audio decode, hash-certified: synthetic 8 kHz WAVs carry a frame
    * count that is a pure function of the id, so the oracle states the
    * duration a correct decoder must recover — javax.sound PCM decode on
    * the Spark side, closed-form arithmetic on the DuckDB side. Band RMS
    * features ride the same decode and are pinned exactly in
    * NorthStarSpec. */
  val qM6AudioDecode = Q(
    "q_m6_audio_decode",
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |       CAST((800 + (doc_id % 32) * 80) * 1000 / 8000 AS BIGINT)
      |         AS duration_ms
      |FROM documents WHERE doc_id % 8 = 1""".stripMargin) { (s, d) =>
    Multimodal.extractFeatures(
      Multimodal.syntheticAudio(
        documents(s, d).filter(col("doc_id") % 8 === 1), "doc_id")).toDF()
      .select(col("media_id"), col("duration_ms"))
  }

  /** REAL video decode, hash-certified: synthetic Y4M clips carry
    * dimensions and a frame count that are pure functions of the id, so
    * the oracle states the metadata a correct decoder must recover — the
    * Y4M header/frame parse runs on the Spark side, closed-form arithmetic
    * on the DuckDB side. Temporal luma-band features ride the same decode
    * and are pinned exactly in NorthStarSpec. */
  val qM7VideoDecode = Q(
    "q_m7_video_decode",
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |       CAST(8 + (doc_id % 8) * 2 AS INT) AS width,
      |       CAST(8 + (doc_id % 6) * 2 AS INT) AS height,
      |       CAST((4 + doc_id % 16) * 100 AS BIGINT) AS duration_ms
      |FROM documents WHERE doc_id % 8 = 2""".stripMargin) { (s, d) =>
    Multimodal.extractFeatures(
      Multimodal.syntheticVideos(
        documents(s, d).filter(col("doc_id") % 8 === 2), "doc_id")).toDF()
      .select(col("media_id"), col("width"), col("height"),
        col("duration_ms"))
  }

  /** REAL frame sampling, hash-certified end-to-end: Y4M probe drives the
    * fan-out cardinality (duration/250ms, nowhere near the 32 cap), each
    * sampled frame is the ACTUAL decoded frame PNG-encoded, and the query
    * RE-DECODES every frame through the image path — so the oracle's
    * closed-form (count, ts, width, height) certifies probe → seek →
    * YUV→RGB → PNG → ImageIO in one chain. Frames are keyed media_id·32 +
    * frame_idx (cap 32 makes the packing injective) purely to ride
    * extractFeatures' one-key schema, then unpacked. */
  val qM8VideoFrames = Q(
    "q_m8_video_frames",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
      |                  CAST(8 + (doc_id % 8) * 2 AS INT) AS width,
      |                  CAST(8 + (doc_id % 6) * 2 AS INT) AS height,
      |                  (4 + doc_id % 16) * 100 AS dur
      |           FROM documents WHERE doc_id % 8 = 2)
      |SELECT media_id, CAST(u.i AS INT) AS frame_idx,
      |       CAST(u.i * 250 AS BIGINT) AS ts_ms, width, height
      |FROM t, unnest(generate_series(0, CAST(dur // 250 AS BIGINT)))
      |       AS u(i)""".stripMargin) { (s, d) =>
    val frames = Multimodal.sampleFrames(
      Multimodal.syntheticVideos(
        documents(s, d).filter(col("doc_id") % 8 === 2), "doc_id"),
      everyMs = 250L).toDF()
    val staged = frames.select(
      (col("media_id") * 32 + col("frame_idx")).as("media_id"),
      lit("image").as("kind"), col("frame").as("bytes"))
    Multimodal.extractFeatures(staged).toDF()
      .select(
        expr("media_id div 32").as("media_id"),
        (col("media_id") % 32).cast("int").as("frame_idx"),
        ((col("media_id") % 32) * 250).cast("long").as("ts_ms"),
        col("width"), col("height"))
  }

  /** Perceptual image hashes over the synthetic PNG corpus, HASH-CERTIFIED
    * end to end: the dHash kernel is exact integer arithmetic (luma×1000
    * Long sums, cross-multiplied mean comparisons — see
    * [[Multimodal.imageDHash]]), and PNG is lossless, so the oracle
    * re-derives every one of the 64 grid comparisons from the closed-form
    * gradient the generator painted — certifying PNG decode → 9×8
    * area-mean grid → brighter-than bits → two's-complement assembly in
    * one chain (bit 63 enters as −2^63, matching the JVM's signed `|=`).
    * Determinism, re-encode invariance, and the near-dup pair search are
    * additionally pinned in NorthStarSpec. */
  val qM9ImageDHash = Q(
    "q_m9_image_dhash",
    """WITH ids AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id,
      |         CAST(8 + doc_id % 16 AS BIGINT) AS w,
      |         CAST(8 + doc_id % 12 AS BIGINT) AS h
      |  FROM documents WHERE doc_id % 8 = 0),
      |grid AS (
      |  SELECT media_id, w, h, cy.cyv AS cy, cx.cxv AS cx,
      |         (cx.cxv * w) // 9 AS x0,
      |         greatest((cx.cxv * w) // 9 + 1, ((cx.cxv + 1) * w) // 9)
      |           AS x1,
      |         (cy.cyv * h) // 8 AS y0,
      |         greatest((cy.cyv * h) // 8 + 1, ((cy.cyv + 1) * h) // 8)
      |           AS y1
      |  FROM ids,
      |       generate_series(0, 7) cy(cyv),
      |       generate_series(0, 8) cx(cxv)),
      |cells AS (
      |  SELECT g.media_id, g.cy, g.cx,
      |         SUM(299 * ((g.media_id * 31 + px.x * 8) % 256)
      |           + 587 * ((g.media_id * 17 + py.y * 8) % 256)
      |           + 114 * ((g.media_id + px.x + py.y) % 256)) AS s,
      |         COUNT(*) AS n
      |  FROM grid g,
      |       generate_series(0, 22) px(x),
      |       generate_series(0, 18) py(y)
      |  WHERE px.x >= g.x0 AND px.x < least(g.x1, g.w)
      |    AND py.y >= g.y0 AND py.y < least(g.y1, g.h)
      |  GROUP BY 1, 2, 3),
      |bits AS (
      |  SELECT a.media_id,
      |         CASE WHEN a.cy * 8 + a.cx = 63
      |              THEN CAST(-9223372036854775807 - 1 AS BIGINT)
      |              ELSE (CAST(1 AS BIGINT) << CAST(a.cy * 8 + a.cx AS INT))
      |         END AS bitval
      |  FROM cells a JOIN cells b
      |    ON a.media_id = b.media_id AND a.cy = b.cy AND a.cx + 1 = b.cx
      |  WHERE a.cx < 8 AND a.s * b.n > b.s * a.n)
      |SELECT i.media_id, CAST(COALESCE(SUM(b.bitval), 0) AS BIGINT) AS dhash
      |FROM ids i LEFT JOIN bits b ON i.media_id = b.media_id
      |GROUP BY i.media_id""".stripMargin) { (s, d) =>
    Multimodal.imageDHashes(
      Multimodal.syntheticImages(
        documents(s, d).filter(col("doc_id") % 8 === 0), "doc_id"))
  }

  /** Unified fingerprint table over the REAL compressed-container decode
    * paths, HASH-CERTIFIED end to end — the oracle restates what a
    * correct decode + perceptual hash must produce for each modality:
    * image rows are frames decoded OUT of MJPEG-AVI containers (RIFF
    * walk + JPEG decode, PNG re-encode by [[Multimodal.aviFrames]]) —
    * solid-gray sources decode uniform, so every strict adjacent-cell
    * comparison is false and a correct dHash is EXACTLY 0 (one wrong
    * pixel anywhere flips a bit); audio rows are FLAC payloads whose
    * CONSTANT subframes make every band's sum-of-squares an exact
    * integer the oracle re-derives from [[Multimodal.flacAmp]]'s closed
    * form (then the identical `float32(sqrt(s/n)/32768)` IEEE chain and
    * adjacent-band comparisons); video rows replay the Y4M planar parse —
    * neutral chroma collapses the YUV→RGB matrix to
    * `gray = clamp((298·(Y−16)+128) >> 8)` — through the same exact
    * integer dHash grid as q_m9. Frame rows ride a disjoint id namespace
    * (10M + mid·32 + idx; the frame cap makes the packing injective) so
    * the unified table's keys never collide across kinds. */
  val qM10MediaFingerprints = Q(
    "q_m10_media_fingerprints",
    """WITH af AS (
      |  SELECT 10000000 + doc_id * 32 + i AS media_id
      |  FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |               unnest(range(0, 2 + doc_id % 6)) AS i
      |        FROM documents WHERE doc_id % 8 = 7)),
      |flacs AS (
      |  SELECT CAST(doc_id AS BIGINT) AS mid,
      |         CAST(1 + doc_id % 2 AS BIGINT) AS channels,
      |         CAST(8000 + (doc_id % 32) * 1600 AS BIGINT) AS total
      |  FROM documents WHERE doc_id % 8 = 6),
      |aj AS (SELECT mid, channels, total,
      |              unnest(range(0, total)) AS j
      |       FROM flacs),
      |ab AS (SELECT mid, channels,
      |              least(64, (j * 65) // total) AS band,
      |              (mid * 131 + (j // 4096) * 977) % 20000 - 10000 AS a0,
      |              (mid * 197 + (j // 4096) * 563) % 20000 - 10000 AS a1
      |       FROM aj),
      |abands AS (
      |  SELECT mid, band,
      |         SUM(a0 * a0
      |           + CASE WHEN channels = 2 THEN a1 * a1 ELSE 0 END) AS s,
      |         SUM(channels) AS n
      |  FROM ab GROUP BY 1, 2),
      |afeats AS (
      |  SELECT mid, band,
      |         CAST(sqrt(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |              / 32768.0 AS REAL) AS fv
      |  FROM abands),
      |abits AS (
      |  SELECT a.mid,
      |         CASE WHEN a.band = 63
      |              THEN CAST(-9223372036854775807 - 1 AS BIGINT)
      |              ELSE (CAST(1 AS BIGINT) << CAST(a.band AS INT))
      |         END AS bitval
      |  FROM afeats a JOIN afeats b
      |    ON a.mid = b.mid AND a.band + 1 = b.band
      |  WHERE a.band < 64 AND a.fv > b.fv),
      |afp AS (
      |  SELECT f.mid AS media_id,
      |         CAST(COALESCE(SUM(b.bitval), 0) AS BIGINT) AS fp
      |  FROM flacs f LEFT JOIN abits b ON f.mid = b.mid
      |  GROUP BY 1),
      |vids AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id,
      |         CAST(8 + (doc_id % 8) * 2 AS BIGINT) AS w,
      |         CAST(8 + (doc_id % 6) * 2 AS BIGINT) AS h
      |  FROM documents WHERE doc_id % 8 = 2),
      |vgrid AS (
      |  SELECT media_id, w, h, cy.cyv AS cy, cx.cxv AS cx,
      |         (cx.cxv * w) // 9 AS x0,
      |         greatest((cx.cxv * w) // 9 + 1, ((cx.cxv + 1) * w) // 9)
      |           AS x1,
      |         (cy.cyv * h) // 8 AS y0,
      |         greatest((cy.cyv * h) // 8 + 1, ((cy.cyv + 1) * h) // 8)
      |           AS y1
      |  FROM vids,
      |       generate_series(0, 7) cy(cyv),
      |       generate_series(0, 8) cx(cxv)),
      |vcells AS (
      |  SELECT g.media_id, g.cy, g.cx,
      |         SUM(1000 * least(255, greatest(0,
      |           (298 * ((g.media_id * 31 + px.x * 4 + py.y * 2) % 220)
      |              + 128) // 256))) AS s,
      |         COUNT(*) AS n
      |  FROM vgrid g,
      |       generate_series(0, 21) px(x),
      |       generate_series(0, 17) py(y)
      |  WHERE px.x >= g.x0 AND px.x < least(g.x1, g.w)
      |    AND py.y >= g.y0 AND py.y < least(g.y1, g.h)
      |  GROUP BY 1, 2, 3),
      |vbits AS (
      |  SELECT a.media_id,
      |         CASE WHEN a.cy * 8 + a.cx = 63
      |              THEN CAST(-9223372036854775807 - 1 AS BIGINT)
      |              ELSE (CAST(1 AS BIGINT) << CAST(a.cy * 8 + a.cx AS INT))
      |         END AS bitval
      |  FROM vcells a JOIN vcells b
      |    ON a.media_id = b.media_id AND a.cy = b.cy AND a.cx + 1 = b.cx
      |  WHERE a.cx < 8 AND a.s * b.n > b.s * a.n),
      |vfp AS (
      |  SELECT v.media_id,
      |         CAST(COALESCE(SUM(b.bitval), 0) AS BIGINT) AS fp
      |  FROM vids v LEFT JOIN vbits b ON v.media_id = b.media_id
      |  GROUP BY 1)
      |SELECT media_id, 'image' AS kind, CAST(0 AS BIGINT) AS fp FROM af
      |UNION ALL SELECT media_id, 'audio' AS kind, fp FROM afp
      |UNION ALL SELECT media_id, 'video' AS kind, fp FROM vfp""".stripMargin) {
    (s, d) =>
      val base = documents(s, d)
      val frames = Multimodal.aviFrames(
          Multimodal.syntheticAvis(
            base.filter(col("doc_id") % 8 === 7), "doc_id")).toDF()
        .select(
          (lit(10000000L) + col("media_id") * 32 + col("frame_idx"))
            .as("media_id"),
          lit("image").as("kind"), col("frame").as("bytes"))
      val flacs = Multimodal.syntheticFlacs(
        base.filter(col("doc_id") % 8 === 6), "doc_id")
      val vids = Multimodal.syntheticVideos(
        base.filter(col("doc_id") % 8 === 2), "doc_id")
      Multimodal.mediaFingerprints(
        frames.unionByName(flacs).unionByName(vids))
  }

  /** REAL JPEG decode + resize chain, hash-certified: the same gradient
    * corpus as q_m3/q_m4 but JPEG-encoded (a crawl meets JPEG long before
    * PNG or Y4M). Dimensions survive lossy encoding exactly, so the oracle
    * states both the decoded dims and the closed-form
    * `floor(dim·min(1, 12/w, 12/h))` dims after a real bilinear downscale
    * of the DECODED JPEG pixels — certifying ImageIO's JPEG path through
    * decode → resample → PNG re-encode → re-decode. (The id%8=2 slice
    * yields w∈{10,18}: 18 forces a genuinely inexact 12/18 scale, which
    * still hash-matches because both engines evaluate the identical IEEE
    * double tree.) dHash robustness across the PNG/JPEG containers is
    * pinned separately in NorthStarSpec. */
  val qM11JpegDecode = Q(
    "q_m11_jpeg_decode",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
      |                  CAST(8 + doc_id % 16 AS DOUBLE) AS w,
      |                  CAST(8 + doc_id % 12 AS DOUBLE) AS h
      |           FROM documents WHERE doc_id % 8 = 2),
      |s AS (SELECT media_id, w, h, least(12.0 / w, 12.0 / h, 1.0) AS sc
      |      FROM t)
      |SELECT media_id,
      |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |       CAST(greatest(1, floor(w * sc)) AS INT) AS resized_width,
      |       CAST(greatest(1, floor(h * sc)) AS INT) AS resized_height
      |FROM s""".stripMargin) { (s, d) =>
    val jpegs = Multimodal.syntheticImages(
      documents(s, d).filter(col("doc_id") % 8 === 2), "doc_id",
      format = "jpeg")
    val dims = Multimodal.extractFeatures(jpegs).toDF()
      .select(col("media_id"), col("width"), col("height"))
    val resized = Multimodal.extractFeatures(
        Multimodal.resizeImages(jpegs, maxW = 12, maxH = 12).toDF()
          .select(col("media_id"), col("kind"), col("bytes"))).toDF()
      .select(col("media_id"), col("width").as("resized_width"),
        col("height").as("resized_height"))
    dims.join(resized, Seq("media_id"))
  }

  /** REAL MP4 metadata probe, hash-certified: synthetic ISO-BMFF payloads
    * carry display dimensions and duration as pure functions of the id,
    * so the oracle states what a correct box-tree walk must recover —
    * `ftyp`/`moov`/`mvhd`/`trak`/`tkhd` parsing on the Spark side,
    * closed-form arithmetic on the DuckDB side. This closes the metadata
    * half of the compressed-video gap (the dominant crawl container);
    * SAMPLE decode remains behind the labeled stub by design. */
  val qM12Mp4Probe = Q(
    "q_m12_mp4_probe",
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |       CAST(160 + (doc_id % 16) * 8 AS INT) AS width,
      |       CAST(120 + (doc_id % 12) * 8 AS INT) AS height,
      |       CAST((2 + doc_id % 20) * 1000 AS BIGINT) AS duration_ms
      |FROM documents WHERE doc_id % 8 = 3""".stripMargin) { (s, d) =>
    Multimodal.extractFeatures(
      Multimodal.syntheticMp4s(
        documents(s, d).filter(col("doc_id") % 8 === 3), "doc_id")).toDF()
      .select(col("media_id"), col("width"), col("height"),
        col("duration_ms"))
  }

  /** REAL FLAC STREAMINFO probe, hash-certified: synthetic FLAC headers
    * carry sample rate / channels / total samples as pure functions of the
    * id — bit-field parsing on the Spark side, closed-form arithmetic on
    * the DuckDB side. The compressed-audio twin of q_m12. */
  val qM13FlacProbe = Q(
    "q_m13_flac_probe",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
      |                  CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |                       WHEN 2 THEN 22050 WHEN 3 THEN 44100
      |                       ELSE 48000 END AS sr,
      |                  8000 + (doc_id % 32) * 1600 AS total
      |           FROM documents WHERE doc_id % 8 = 4)
      |SELECT media_id, CAST(sr AS INT) AS sample_rate,
      |       CAST(1 + media_id % 2 AS INT) AS channels,
      |       CAST(total * 1000 // sr AS BIGINT) AS duration_ms
      |FROM t""".stripMargin) { (s, d) =>
    Multimodal.flacMeta(
      Multimodal.syntheticFlacs(
        documents(s, d).filter(col("doc_id") % 8 === 4), "doc_id"))
  }

  /** REAL MP3 frame walk, hash-certified: synthetic CBR MPEG-1 Layer III
    * streams carry sample rate and frame count as pure functions of the
    * id — header sync/bitrate/sample-rate parsing and frame sizing on the
    * Spark side, closed-form arithmetic on the DuckDB side. */
  val qM14Mp3Probe = Q(
    "q_m14_mp3_probe",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
      |                  CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
      |                       ELSE 32000 END AS sr,
      |                  20 + doc_id % 40 AS frames
      |           FROM documents WHERE doc_id % 8 = 5)
      |SELECT media_id, CAST(sr AS INT) AS sample_rate,
      |       CAST(frames AS INT) AS n_frames,
      |       CAST(frames * 1152 * 1000 // sr AS BIGINT) AS duration_ms
      |FROM t""".stripMargin) { (s, d) =>
    Multimodal.mp3Meta(
      Multimodal.syntheticMp3s(
        documents(s, d).filter(col("doc_id") % 8 === 5), "doc_id"))
  }

  /** REAL WebM/EBML metadata probe, hash-certified: synthetic EBML trees
    * carry display dimensions and duration as pure functions of the id —
    * varint element walking on the Spark side (Segment/Info for
    * TimestampScale+Duration, Tracks/TrackEntry/Video for pixel dims),
    * closed-form arithmetic on the DuckDB side. With q_m12 this covers
    * both dominant crawl video containers at the metadata level. */
  val qM15WebmProbe = Q(
    "q_m15_webm_probe",
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |       CAST(320 + (doc_id % 16) * 16 AS INT) AS width,
      |       CAST(180 + (doc_id % 12) * 16 AS INT) AS height,
      |       CAST((3 + doc_id % 25) * 1000 AS BIGINT) AS duration_ms
      |FROM documents WHERE doc_id % 8 = 6""".stripMargin) { (s, d) =>
    Multimodal.extractFeatures(
      Multimodal.syntheticWebms(
        documents(s, d).filter(col("doc_id") % 8 === 6), "doc_id")).toDF()
      .select(col("media_id"), col("width"), col("height"),
        col("duration_ms"))
  }

  /** REAL GIF + BMP decode, hash-certified: the q_m3 gradient corpus
    * encoded into the two remaining ubiquitous legacy rasters (GIF
    * palettizes — dims survive exactly; BMP is lossless). One ImageIO
    * decode path serves all four certified rasters; NorthStarSpec
    * additionally pins BMP pixels bit-equal to the PNG twin via dHash. */
  val qM16GifBmp = Q(
    "q_m16_gif_bmp_decode",
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |       CASE WHEN doc_id % 8 = 5 THEN 'gif' ELSE 'bmp' END AS fmt,
      |       CAST(8 + doc_id % 16 AS INT) AS width,
      |       CAST(8 + doc_id % 12 AS INT) AS height
      |FROM documents WHERE doc_id % 8 IN (5, 6)""".stripMargin) { (s, d) =>
    def dims(slice: Long, format: String) =
      Multimodal.extractFeatures(
        Multimodal.syntheticImages(
          documents(s, d).filter(col("doc_id") % 8 === slice), "doc_id",
          format = format)).toDF()
        .select(col("media_id"), lit(format).as("fmt"),
          col("width"), col("height"))
    dims(5L, "gif").unionByName(dims(6L, "bmp"))
  }

  /** REAL audio stats, hash-certified: the synthetic corpus is square
    * waves (every sample ±amp), so a correct decoder must recover
    * RMS = peak = amp EXACTLY (the sum of squares is amp²·n, integral),
    * zero silence, and one sign change per 100-sample half-period —
    * all closed forms in the id that the oracle states directly. The
    * curation screens for silent/clipped/tonal audio ride this decode. */
  val qM17AudioStats = Q(
    "q_m17_audio_stats",
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |       CAST(1000 + (doc_id % 7) * 4000 AS DOUBLE) AS rms,
      |       CAST(1000 + (doc_id % 7) * 4000 AS INT) AS peak,
      |       CAST(0.0 AS DOUBLE) AS silence_ratio,
      |       CAST((800 + (doc_id % 32) * 80 - 1) // 100 AS BIGINT)
      |         AS zero_crossings
      |FROM documents WHERE doc_id % 8 = 1""".stripMargin) { (s, d) =>
    Multimodal.audioStatsOf(
      Multimodal.syntheticAudio(
        documents(s, d).filter(col("doc_id") % 8 === 1), "doc_id"))
  }

  /** REAL scene-change detection, hash-certified: the synthetic Y4M luma
    * is `16 + ((id·31 + f·8 + x·4 + y·2) mod 220)`, so the per-pixel
    * frame-to-frame difference is exactly 8 — except at the mod-220
    * wraparound, where it is 212. The oracle re-enumerates every
    * (frame, x, y) and restates the mean absolute difference in closed
    * form; threshold 15 sits inside the observed spread so both verdict
    * branches are exercised. SceneSpec separately plants a two-scene
    * clip and recovers exactly its one hard cut. */
  val qM18SceneChanges = Q(
    "q_m18_scene_changes",
    """WITH t AS (SELECT doc_id AS mid,
      |                  8 + (doc_id % 8) * 2 AS w,
      |                  8 + (doc_id % 6) * 2 AS h,
      |                  4 + doc_id % 16 AS frames
      |           FROM documents WHERE doc_id % 8 = 2),
      |f AS (SELECT mid, w, h,
      |             unnest(generate_series(1, frames - 1)) AS fi
      |      FROM t),
      |x AS (SELECT mid, w, h, fi,
      |             unnest(generate_series(0, w - 1)) AS xi
      |      FROM f),
      |y AS (SELECT mid, w, h, fi, xi,
      |             unnest(generate_series(0, h - 1)) AS yi
      |      FROM x),
      |d AS (SELECT mid, fi, w, h,
      |             CASE WHEN (mid * 31 + (fi - 1) * 8 + xi * 4 + yi * 2)
      |                       % 220 >= 212
      |                  THEN 212 ELSE 8 END AS ad
      |      FROM y),
      |g AS (SELECT mid, fi, CAST(sum(ad) AS BIGINT) AS s,
      |             max(w * h) AS ysize
      |      FROM d GROUP BY 1, 2)
      |SELECT CAST(mid AS BIGINT) AS media_id, CAST(fi AS INT) AS frame_idx,
      |       CAST(s AS DOUBLE) / ysize AS mean_abs_diff,
      |       CAST(s AS DOUBLE) / ysize >= 15.0 AS is_cut
      |FROM g""".stripMargin) { (s, d) =>
    Multimodal.videoSceneChanges(
      Multimodal.syntheticVideos(
        documents(s, d).filter(col("doc_id") % 8 === 2), "doc_id"),
      threshold = 15.0)
  }

  /** REAL animated-GIF frame extraction, hash-certified: synthetic
    * multi-frame GIFs carry frame count, logical-screen size, per-frame
    * delay, and SOLID per-frame colors as pure functions of the id (solid
    * frames survive GIF palette quantization exactly), so the oracle
    * states the exact frame rows — count, composited size, cumulative
    * event-time timestamps, and the (0,0) pixel of every composited
    * frame — that a correct ImageIO multi-frame read + canvas composite
    * must recover. Closes the animated half of the GIF path (q_m16
    * certifies single-frame decode). */
  val qM19GifFrames = Q(
    "q_m19_gif_frames",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
      |                  doc_id % 6 + 2 AS nf,
      |                  doc_id % 5 + 16 AS w, doc_id % 4 + 12 AS h,
      |                  (4 + doc_id % 3) * 10 AS delay_ms
      |           FROM documents WHERE doc_id % 8 = 4),
      |f AS (SELECT media_id, w, h, delay_ms,
      |             unnest(range(0, nf)) AS frame_idx
      |      FROM t)
      |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
      |       CAST(frame_idx * delay_ms AS BIGINT) AS ts_ms,
      |       CAST(delay_ms AS BIGINT) AS delay_ms,
      |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |       CAST((media_id * 37 + frame_idx * 11) % 256 AS INT) AS red,
      |       CAST((media_id * 53 + frame_idx * 17) % 256 AS INT) AS green,
      |       CAST((media_id * 71 + frame_idx * 23) % 256 AS INT) AS blue
      |FROM f""".stripMargin) { (s, d) =>
    import s.implicits._
    Multimodal.gifFrames(
        Multimodal.syntheticGifs(
          documents(s, d).filter(col("doc_id") % 8 === 4), "doc_id"))
      .mapPartitions { it =>
        it.map { f =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(f.frame))
          val rgb = img.getRGB(0, 0)
          (f.media_id, f.frame_idx, f.ts_ms, f.delay_ms, f.width, f.height,
            (rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
        }
      }
      .toDF("media_id", "frame_idx", "ts_ms", "delay_ms",
        "width", "height", "red", "green", "blue")
  }

  /** REAL FLAC sample decode, hash-certified — the compressed-audio
    * sample gap closed for the CONSTANT/VERBATIM subset: synthetic FLACs
    * now carry fully valid CRC'd audio frames whose constant amplitudes
    * are pure functions of (id, frame, channel), so the oracle restates
    * the exact interleaved sample count, peak, and integral sum of
    * squares a correct frame walk + subframe decode + CRC validation
    * must recover. (q_m13 certifies the metadata half; q_m21 certifies
    * the predicted/Rice-coded encodings on the compressed corpus.) */
  val qM20FlacDecode = Q(
    "q_m20_flac_decode",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
      |                  CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |                       WHEN 2 THEN 22050 WHEN 3 THEN 44100
      |                       ELSE 48000 END AS sr,
      |                  CAST(1 + doc_id % 2 AS INT) AS channels,
      |                  8000 + (doc_id % 32) * 1600 AS total
      |           FROM documents WHERE doc_id % 8 = 6),
      |f AS (SELECT media_id, sr, channels, total,
      |             unnest(range(0, (total + 4095) // 4096)) AS fi
      |      FROM t),
      |a AS (SELECT media_id, sr, channels, total, fi,
      |             least(4096, total - fi * 4096) AS sz,
      |             (media_id * 131 + fi * 977) % 20000 - 10000 AS a0,
      |             (media_id * 197 + fi * 563) % 20000 - 10000 AS a1
      |      FROM f)
      |SELECT media_id,
      |       CAST(max(sr) AS INT) AS sample_rate,
      |       CAST(max(channels) AS INT) AS channels,
      |       CAST(max(total) * max(channels) AS BIGINT) AS n_samples,
      |       CAST(max(CASE WHEN channels = 2
      |                     THEN greatest(abs(a0), abs(a1))
      |                     ELSE abs(a0) END) AS INT) AS peak,
      |       CAST(sum(sz * (a0 * a0
      |              + CASE WHEN channels = 2 THEN a1 * a1 ELSE 0 END))
      |         AS BIGINT) AS sum_sq
      |FROM a GROUP BY media_id""".stripMargin) { (s, d) =>
    Multimodal.flacSampleStats(
      Multimodal.syntheticFlacs(
        documents(s, d).filter(col("doc_id") % 8 === 6), "doc_id"))
  }

  /** COMPRESSED FLAC sample decode, hash-certified — FIXED orders 0–4,
    * LPC orders 1–8 (precision 12, shift 9), Rice partition orders 0–2
    * with a forced raw-bits escape partition, and all three stereo
    * decorrelation modes (left/side, right/side, mid/side with the
    * 17-bit side channel), decoded sample-exact. The corpus waveform
    * ([[Multimodal.flacWave]]) has a closed form, so the oracle
    * recomputes EVERY sample in SQL and restates the interleaved count,
    * peak, and integral sum of squares a bit-exact predictor + Rice
    * reconstruction must produce — one wrong residual anywhere shifts
    * `sum_sq` and fails the hash. */
  val qM21FlacLpc = Q(
    "q_m21_flac_lpc",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
      |                  CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |                       WHEN 2 THEN 22050 WHEN 3 THEN 44100
      |                       ELSE 48000 END AS sr,
      |                  CAST(1 + doc_id % 2 AS INT) AS channels,
      |                  4096 * (1 + doc_id % 4) + 2048 * (doc_id % 3)
      |                    AS total
      |           FROM documents WHERE doc_id % 8 = 5),
      |f AS (SELECT media_id, sr, channels, total,
      |             unnest(range(0, (total + 4095) // 4096)) AS fi
      |      FROM t),
      |a AS (SELECT media_id, sr, channels, total, fi,
      |             least(4096, total - fi * 4096) AS sz
      |      FROM f),
      |s AS (SELECT media_id, sr, channels, total, fi,
      |             unnest(range(0, sz)) AS i
      |      FROM a),
      |x AS (SELECT media_id, sr, channels, total,
      |             (media_id * 131 + fi * 977 + i * i * 13 + i * 7919)
      |               % 16384 - 8192 AS x0,
      |             CASE WHEN channels = 2 THEN
      |               (media_id * 131 + 197 + fi * 977 + i * i * 13
      |                  + i * 7919) % 16384 - 8192 END AS x1
      |      FROM s)
      |SELECT media_id,
      |       CAST(max(sr) AS INT) AS sample_rate,
      |       CAST(max(channels) AS INT) AS channels,
      |       CAST(max(total) * max(channels) AS BIGINT) AS n_samples,
      |       CAST(max(greatest(abs(x0), coalesce(abs(x1), 0))) AS INT)
      |         AS peak,
      |       CAST(sum(x0 * x0 + coalesce(x1 * x1, 0)) AS BIGINT)
      |         AS sum_sq
      |FROM x GROUP BY media_id""".stripMargin) { (s, d) =>
    Multimodal.flacSampleStats(
      Multimodal.syntheticFlacsCompressed(
        documents(s, d).filter(col("doc_id") % 8 === 5), "doc_id"))
  }

  /** REAL MJPEG-AVI frame extraction, hash-certified — compressed video
    * decoded end-to-end offline: synthetic AVIs carry the full standard
    * layout (avih/strh/strf headers, '00dc' JPEG frame chunks, idx1),
    * with frame count, size, and ms-per-frame cadence as pure functions
    * of the id, so the oracle states the exact frame rows — count,
    * DECODED dimensions (from the JPEG, not the header), and container
    * timestamps — that a correct RIFF walk + per-frame JPEG decode must
    * recover. Pixel fidelity (JPEG round-off on solid frames) is pinned
    * in AviSpec; the hash here certifies structure and clocks exactly. */
  val qM22AviFrames = Q(
    "q_m22_avi_frames",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
      |                  doc_id % 6 + 2 AS nf,
      |                  48 + 16 * (doc_id % 3) AS w,
      |                  32 + 16 * (doc_id % 2) AS h,
      |                  20 + doc_id % 5 AS ms_per_frame
      |           FROM documents WHERE doc_id % 8 = 7),
      |f AS (SELECT media_id, w, h, ms_per_frame,
      |             unnest(range(0, nf)) AS frame_idx
      |      FROM t)
      |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
      |       CAST(frame_idx * ms_per_frame AS BIGINT) AS ts_ms,
      |       CAST(w AS INT) AS width, CAST(h AS INT) AS height
      |FROM f""".stripMargin) { (s, d) =>
    import s.implicits._
    Multimodal.aviFrames(
        Multimodal.syntheticAvis(
          documents(s, d).filter(col("doc_id") % 8 === 7), "doc_id"))
      .map(f => (f.media_id, f.frame_idx, f.ts_ms, f.width, f.height))
      .toDF("media_id", "frame_idx", "ts_ms", "width", "height")
  }

  /** REAL ISO-BMFF sample-table extraction, hash-certified: synthetic
    * MP4s now carry a full stbl (stts/stsc two-chunk runs/per-sample
    * stsz/stco/stss) and a real mdat, all pure functions of the id, so
    * the oracle states every sample row — relative byte offset (prefix
    * sum of the closed-form sizes), size, 40 ms decode clock, and the
    * every-third sync flag — that a correct five-table resolution must
    * produce. This is the keyframe-byte-range step a video pipeline runs
    * before any (external) decode; q_m12 certifies the header half.
    * Absolute offsets are pinned against the actual mdat bytes in
    * Mp4SamplesSpec. */
  val qM23Mp4Samples = Q(
    "q_m23_mp4_samples",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
      |                  doc_id % 5 + 4 AS nf
      |           FROM documents WHERE doc_id % 8 = 3),
      |f AS (SELECT media_id, unnest(range(0, nf)) AS i FROM t),
      |s AS (SELECT media_id, i,
      |             100 + 10 * ((media_id + i) % 7) AS sz
      |      FROM f)
      |SELECT media_id, CAST(i AS INT) AS sample_idx,
      |       CAST(COALESCE(SUM(sz) OVER (PARTITION BY media_id ORDER BY i
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |            AS BIGINT) AS rel_offset,
      |       CAST(sz AS BIGINT) AS size,
      |       CAST(i * 40 AS BIGINT) AS dts_ms,
      |       i % 3 = 0 AS keyframe
      |FROM s""".stripMargin) { (s, d) =>
    Multimodal.mp4SampleTable(
      Multimodal.syntheticMp4s(
        documents(s, d).filter(col("doc_id") % 8 === 3), "doc_id"))
      .select(col("media_id"), col("sample_idx"), col("rel_offset"),
        col("size"), col("dts_ms"), col("keyframe"))
  }

  /** REAL Matroska/WebM block extraction, hash-certified — the EBML twin
    * of q_m23: synthetic WebMs now carry two Clusters of SimpleBlocks
    * with id-derived sizes, 40 ms cadence against cluster timestamps
    * 0/1000 ms, and keyframes on even blocks, so the oracle states every
    * block row (clock, size, sync flag) a correct Cluster walk + block
    * header parse must produce. Absolute frame-byte offsets are pinned
    * against the actual payload bytes in WebmBlocksSpec; q_m15 certifies
    * the metadata half unchanged. */
  val qM24WebmBlocks = Q(
    "q_m24_webm_blocks",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
      |                  doc_id % 5 + 3 AS nb
      |           FROM documents WHERE doc_id % 8 = 6),
      |f AS (SELECT media_id, nb, (nb + 1) // 2 AS c1,
      |             unnest(range(0, nb)) AS i
      |      FROM t)
      |SELECT media_id, CAST(i AS INT) AS block_idx,
      |       CAST(50 + 10 * ((media_id + i) % 4) AS BIGINT) AS size,
      |       CAST(CASE WHEN i < c1 THEN i * 40
      |                 ELSE 1000 + (i - c1) * 40 END AS BIGINT) AS ts_ms,
      |       i % 2 = 0 AS keyframe
      |FROM f""".stripMargin) { (s, d) =>
    Multimodal.webmBlockTable(
      Multimodal.syntheticWebms(
        documents(s, d).filter(col("doc_id") % 8 === 6), "doc_id"))
      .select(col("media_id"), col("block_idx"), col("size"), col("ts_ms"),
        col("keyframe"))
  }

  /** REAL frequency-domain feature extraction, hash-certified on its
    * integral/verdict face: [[Multimodal.audioSpectralOf]] runs the full
    * decode → Hann-window → FFT → averaged-power-spectrum reduction over
    * the square-wave WAV corpus of q_m17. The oracle states the framing
    * closed form (frames = 1 + (n−512)÷256 over n = 800 + (id%32)·80
    * mono samples at 8 kHz) plus the two DSP verdicts a correct spectrum
    * of a 40 Hz square wave must reach: tonal (flatness ≪ 0.1 — power
    * sits in discrete 1/n² harmonics) and low-frequency (centroid
    * ≈ 40·Σ1/n over Σ1/n², ~106 Hz ≪ 500). The continuous values
    * (centroid/rolloff/bandwidth/flatness) are pinned in
    * AudioSpectralSpec against closed-form sine fixtures and an FFT-vs-
    * naïve-DFT differential. */
  val qM25AudioSpectral = Q(
    "q_m25_audio_spectral",
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |       CAST(8000 AS INT) AS sample_rate,
      |       CAST(1 + (800 + (doc_id % 32) * 80 - 512) // 256 AS BIGINT)
      |         AS n_frames,
      |       TRUE AS tonal,
      |       TRUE AS low_centroid
      |FROM documents WHERE doc_id % 8 = 1""".stripMargin) { (s, d) =>
    Multimodal.audioSpectralOf(
      Multimodal.syntheticAudio(
        documents(s, d).filter(col("doc_id") % 8 === 1), "doc_id"))
      .select(col("media_id"), col("sample_rate"), col("n_frames"),
        (col("flatness") < 0.1).as("tonal"),
        (col("centroid_hz") < 500.0).as("low_centroid"))
  }

  /** Content-level audio near-dup via the spectral hot-band hash,
    * hash-certified: the corpus plants, for every document in the slice,
    * a twin re-encoded at 0.4× volume with the first 300 samples trimmed
    * — the two edits a time-envelope fingerprint breaks on. The hash's
    * construction ([[Multimodal.audioSpectralHash]]: on-bin tones,
    * phase-discarding power spectrum, mean-relative hot bands) makes
    * both edits EXACT no-ops, and [[Multimodal.syntheticTones]]' five
    * disjoint co-prime band congruences make distinct contents collide
    * in at most 3 of 5 bands, so the hamming-0 banded join returns
    * precisely the planted (doc, doc+1000000) pairs — the closed form
    * the oracle states. The join is the same 8-band LSH shape as image/
    * video near-dup: no all-pairs stage at any corpus size. */
  val qM26AudioNearDup = Q(
    "q_m26_audio_neardup",
    """SELECT CAST(doc_id AS BIGINT) AS doc_a,
      |       CAST(doc_id + 1000000 AS BIGINT) AS doc_b,
      |       CAST(0 AS BIGINT) AS hamming
      |FROM documents WHERE doc_id % 8 = 3""".stripMargin) { (s, d) =>
    val ids = documents(s, d).filter(col("doc_id") % 8 === 3)
      .select(col("doc_id"))
    val originals = ids.select(
      col("doc_id").as("media_id"), col("doc_id").as("content_id"),
      lit(1.0).as("scale"), lit(0).as("trim"))
    val twins = ids.select(
      (col("doc_id") + 1000000L).as("media_id"),
      col("doc_id").as("content_id"),
      lit(0.4).as("scale"), lit(300).as("trim"))
    val corpus = Multimodal.syntheticTones(originals.unionByName(twins))
    graft.operators.Dedup.hamming64Pairs(
      Multimodal.audioSpectralHashes(corpus)
        .select(col("media_id").as("doc_id"),
          col("spectral_hash").as("sim_sig")),
      maxHamming = 0)
  }

  /** One-decode audio profile ([[Multimodal.audioProfile]]): time-domain
    * screens and spectral descriptors from a single PCM pass. The oracle
    * is literally the UNION of q_m17's closed forms (square-wave RMS =
    * peak = amp exactly, zero silence, one sign change per half-period)
    * and q_m25's (framing arithmetic + the tonal / low-centroid DSP
    * verdicts) — certifying that fusing the two passes changes no
    * number. */
  val qM27AudioProfile = Q(
    "q_m27_audio_profile",
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |       CAST(1000 + (doc_id % 7) * 4000 AS DOUBLE) AS rms,
      |       CAST(1000 + (doc_id % 7) * 4000 AS INT) AS peak,
      |       CAST(0.0 AS DOUBLE) AS silence_ratio,
      |       CAST((800 + (doc_id % 32) * 80 - 1) // 100 AS BIGINT)
      |         AS zero_crossings,
      |       CAST(8000 AS INT) AS sample_rate,
      |       CAST(1 + (800 + (doc_id % 32) * 80 - 512) // 256 AS BIGINT)
      |         AS n_frames,
      |       TRUE AS tonal,
      |       TRUE AS low_centroid
      |FROM documents WHERE doc_id % 8 = 1""".stripMargin) { (s, d) =>
    Multimodal.audioProfile(
      Multimodal.syntheticAudio(
        documents(s, d).filter(col("doc_id") % 8 === 1), "doc_id"))
      .select(col("media_id"), col("rms"), col("peak"),
        col("silence_ratio"), col("zero_crossings"), col("sample_rate"),
        col("n_frames"),
        (col("flatness") < 0.1).as("tonal"),
        (col("centroid_hz") < 500.0).as("low_centroid"))
  }

  /** Reflection-level image near-dup via the folded-DCT pHash,
    * hash-certified: for every document in the slice the corpus plants a
    * horizontally mirrored twin and a 180°-rotated twin — the reposts
    * [[Multimodal.imageDHash]] misses (a reflection reverses every
    * adjacent-cell comparison; the spec measures the separation). The
    * folded DCT makes reflection an exact ±1 coefficient factor, so the
    * magnitude-vs-median hash is bit-identical and the hamming-0 banded
    * join returns exactly the planted (doc, doc+1000000) and
    * (doc, doc+2000000) pairs — plus the twins' own (doc+1000000,
    * doc+2000000) pair, since hv∘h = v: all three stated in closed form
    * by the oracle. Same 8-band LSH shape as every other 64-bit
    * near-dup path. */
  val qM28ImageMirrorDedup = Q(
    "q_m28_image_mirror_dedup",
    """SELECT CAST(doc_id AS BIGINT) AS doc_a,
      |       CAST(doc_id + 1000000 AS BIGINT) AS doc_b,
      |       CAST(0 AS BIGINT) AS hamming
      |FROM documents WHERE doc_id % 8 = 5
      |UNION ALL
      |SELECT CAST(doc_id AS BIGINT), CAST(doc_id + 2000000 AS BIGINT),
      |       CAST(0 AS BIGINT)
      |FROM documents WHERE doc_id % 8 = 5
      |UNION ALL
      |SELECT CAST(doc_id + 1000000 AS BIGINT),
      |       CAST(doc_id + 2000000 AS BIGINT), CAST(0 AS BIGINT)
      |FROM documents WHERE doc_id % 8 = 5""".stripMargin) { (s, d) =>
    val ids = documents(s, d).filter(col("doc_id") % 8 === 5)
      .select(col("doc_id"))
    def leg(offset: Long, mirror: Int) = ids.select(
      (col("doc_id") + offset).as("media_id"),
      col("doc_id").as("content_id"), lit(mirror).as("mirror"))
    val corpus = Multimodal.syntheticMirrorImages(
      leg(0L, 0).unionByName(leg(1000000L, 1)).unionByName(leg(2000000L, 3)))
    graft.operators.Dedup.hamming64Pairs(
      Multimodal.imagePHashes(corpus)
        .select(col("media_id").as("doc_id"), col("phash").as("sim_sig")),
      maxHamming = 0)
  }

  /** Reorder-level video near-dup via the temporal majority-vote hash,
    * hash-certified — the video leg of the content-identity trio
    * (q_m26 audio, q_m28 image): the corpus plants, per document, a
    * frame-REVERSED re-cut of the same clip. Reversal swaps the lead
    * title-card frame for the closing scene frame, moving the
    * first-frame [[Multimodal.videoDHash]] 55+ bits, but leaves the
    * frame multiset — and therefore every majority vote — untouched, so
    * the hamming-0 banded join returns exactly the planted
    * (doc, doc+1000000) pairs the oracle states. */
  val qM29VideoReorderDedup = Q(
    "q_m29_video_reorder_dedup",
    """SELECT CAST(doc_id AS BIGINT) AS doc_a,
      |       CAST(doc_id + 1000000 AS BIGINT) AS doc_b,
      |       CAST(0 AS BIGINT) AS hamming
      |FROM documents WHERE doc_id % 8 = 7""".stripMargin) { (s, d) =>
    val ids = documents(s, d).filter(col("doc_id") % 8 === 7)
      .select(col("doc_id"))
    def leg(offset: Long, reverse: Int) = ids.select(
      (col("doc_id") + offset).as("media_id"),
      col("doc_id").as("content_id"), lit(reverse).as("reverse"))
    val corpus = Multimodal.syntheticReorderedVideos(
      leg(0L, 0).unionByName(leg(1000000L, 1)))
    graft.operators.Dedup.hamming64Pairs(
      Multimodal.videoTemporalDHashes(corpus)
        .select(col("media_id").as("doc_id"),
          col("temporal_hash").as("sim_sig")),
      maxHamming = 0)
  }

  /** MP3 frame table, hash-certified — the audio leg of the sample-table
    * trio (q_m23 MP4, q_m24 WebM): the synthetic CBR corpus fixes every
    * frame's offset (`i·(144·128000//sr)`), size, and 1152-sample clock
    * in closed form, certifying sync validation, header sizing, and the
    * frame walk end to end. These rows are exactly what the
    * [[graft.operators.AudioSampleDecoder]] seam consumes. */
  val qM30Mp3Frames = Q(
    "q_m30_mp3_frames",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
      |                  CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
      |                       ELSE 32000 END AS sr,
      |                  20 + doc_id % 40 AS frames
      |           FROM documents WHERE doc_id % 8 = 5)
      |SELECT media_id, CAST(u.i AS INT) AS frame_idx,
      |       CAST(u.i * (144 * 128000 // sr) AS BIGINT) AS "offset",
      |       CAST(144 * 128000 // sr AS BIGINT) AS size,
      |       CAST(u.i * 1152 * 1000 // sr AS BIGINT) AS ts_ms,
      |       CAST(sr AS INT) AS sample_rate,
      |       CAST(2 AS INT) AS channels
      |FROM t, unnest(generate_series(0, CAST(frames - 1 AS BIGINT)))
      |       AS u(i)""".stripMargin) { (s, d) =>
    Multimodal.mp3FrameTable(
      Multimodal.syntheticMp3s(
        documents(s, d).filter(col("doc_id") % 8 === 5), "doc_id"))
  }

  val all: Seq[Q] =
    Seq(qM1BinaryMeta, qM2Features, qM3ImageDecode, qM4ImageResize,
      qM5FrameSample, qM6AudioDecode, qM7VideoDecode, qM8VideoFrames,
      qM9ImageDHash, qM10MediaFingerprints, qM11JpegDecode, qM12Mp4Probe,
      qM13FlacProbe, qM14Mp3Probe, qM15WebmProbe, qM16GifBmp,
      qM17AudioStats, qM18SceneChanges, qM19GifFrames, qM20FlacDecode,
      qM21FlacLpc, qM22AviFrames, qM23Mp4Samples, qM24WebmBlocks,
      qM25AudioSpectral, qM26AudioNearDup, qM27AudioProfile,
      qM28ImageMirrorDedup, qM29VideoReorderDedup, qM30Mp3Frames)
}
