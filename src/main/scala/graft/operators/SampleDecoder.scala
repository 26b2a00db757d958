package graft.operators

import java.awt.image.BufferedImage

/** One media sample's byte range inside its container payload — the
  * container-agnostic form of [[Multimodal.Mp4Samples.Sample]] /
  * [[Multimodal.WebmBlocks.Block]] / an AVI `##dc` chunk, produced by
  * [[Multimodal.containerSampleRefs]]. */
final case class SampleRef(
    idx: Int, offset: Long, size: Long, tsMs: Long, keyframe: Boolean)

/** The compressed-sample decoder seam: container walkers (MP4 `stbl`,
  * Matroska Clusters, RIFF `movi`) produce REAL byte ranges entirely
  * offline, and an implementation of this trait turns one range into a
  * decoded frame. Everything around the seam — schema, partitioning, the
  * narrow mapPartitions shape, PNG hand-off into the image path — is
  * independent of the codec, so plugging a production FFmpeg/JNI decoder
  * in changes no plan.
  *
  * Implementations must be SERIALIZABLE (the operator captures a snapshot
  * of the registry on the driver and ships it in the task closure) and
  * deterministic per (payload, ref). Heavy native handles should live in
  * a lazy transient field so they are re-created per executor, not
  * serialized. */
trait SampleDecoder extends Serializable {

  /** Container families claimed, lowercase: "mp4", "webm", "avi". A
    * production decoder would also inspect the payload's codec tag;
    * containers are the granularity the offline walkers expose. */
  def claims(container: String): Boolean

  /** Decode the sample at `[ref.offset, ref.offset + ref.size)` of
    * `payload`; None when the range is not decodable. */
  def decodeSample(payload: Array[Byte], ref: SampleRef): Option[BufferedImage]
}

/** Decoder registry: programmatic registrations (tests, embedding apps)
  * take precedence, then `java.util.ServiceLoader` implementations (the
  * production wiring — ship a jar with a
  * `META-INF/services/graft.operators.SampleDecoder` entry on the
  * executor classpath), then the built-in [[SampleDecoders.MjpegAvi]].
  *
  * Operators capture [[snapshot]] ON THE DRIVER at plan time and ship it
  * in the closure, so programmatic registrations reach executors on a
  * real cluster. The labeled [[Multimodal.StubDecoder]] fallback is
  * reachable ONLY for payloads whose container no snapshot decoder
  * claims. */
object SampleDecoders {

  /** The first real through-the-seam implementation: MJPEG frames inside
    * RIFF/AVI, decoded by the JDK's ImageIO JPEG reader directly from the
    * sample byte range. */
  object MjpegAvi extends SampleDecoder {
    override def claims(container: String): Boolean = container == "avi"
    override def decodeSample(
        payload: Array[Byte], ref: SampleRef): Option[BufferedImage] = {
      val st = ref.offset.toInt
      val ln = ref.size.toInt
      if (ref.offset < 0 || ref.size < 2 ||
        ref.offset + ref.size > payload.length ||
        (payload(st) & 0xFF) != 0xFF || (payload(st + 1) & 0xFF) != 0xD8)
        return None
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload, st, ln))
        catch { case scala.util.control.NonFatal(_) => null }
      Option(img)
    }
  }

  @volatile private var programmatic: List[SampleDecoder] = Nil

  /** Register a decoder (driver-side; front of the lookup order). */
  def register(d: SampleDecoder): Unit = synchronized {
    programmatic = d :: programmatic
  }

  /** Remove a programmatic registration (same instance). */
  def unregister(d: SampleDecoder): Unit = synchronized {
    programmatic = programmatic.filterNot(_ eq d)
  }

  /** ServiceLoader scan, once per JVM. Failures load nothing — a broken
    * provider jar must not take the whole media path down. */
  private lazy val serviceLoaded: List[SampleDecoder] =
    try {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader.load(classOf[SampleDecoder])
        .iterator().asScala.toList
    } catch { case scala.util.control.NonFatal(_) => Nil }

  /** The decoder list an operator should capture at plan time:
    * programmatic, then ServiceLoader, then built-ins. */
  def snapshot(): Seq[SampleDecoder] =
    programmatic ++ serviceLoaded :+ MjpegAvi

  /** First decoder in `decoders` claiming `container`. */
  def forContainer(
      container: String, decoders: Seq[SampleDecoder]): Option[SampleDecoder] =
    decoders.find(_.claims(container))
}

/** The AUDIO half of the decoder seam: a compressed-audio frame walk
  * ([[Multimodal.Mp3Probe.frameTable]] today) provides byte ranges, an
  * implementation turns one frame range into interleaved 16-bit PCM.
  * Refs arrive in file order with no gaps, so bit-reservoir codecs (MP3)
  * can keep whatever rolling state they need across calls on one
  * payload — a fresh payload always starts at ref.idx == 0.
  *
  * Same lifecycle as [[SampleDecoder]]: serializable, captured on the
  * driver, programmatic or ServiceLoader registration; the labeled stub
  * serves only containers no registered decoder claims. */
trait AudioSampleDecoder extends Serializable {

  /** Container families claimed, lowercase: "mp3" (more as walkers
    * land). */
  def claims(container: String): Boolean

  /** Decode the frame at `[ref.offset, ref.offset + ref.size)` of
    * `payload` into interleaved 16-bit PCM samples; None when the frame
    * is not decodable. */
  def decodeFrame(payload: Array[Byte], ref: SampleRef): Option[Array[Short]]
}

/** Registry for [[AudioSampleDecoder]] — the audio mirror of
  * [[SampleDecoders]]. No built-in implementation yet: MP3 Huffman
  * synthesis needs a native codec, which is exactly what this seam
  * exists to plug in (FLAC decodes fully offline through
  * [[Multimodal.FlacCodec]] already, before the seam is consulted). */
object AudioSampleDecoders {

  @volatile private var programmatic: List[AudioSampleDecoder] = Nil

  def register(d: AudioSampleDecoder): Unit = synchronized {
    programmatic = d :: programmatic
  }

  def unregister(d: AudioSampleDecoder): Unit = synchronized {
    programmatic = programmatic.filterNot(_ eq d)
  }

  private lazy val serviceLoaded: List[AudioSampleDecoder] =
    try {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader.load(classOf[AudioSampleDecoder])
        .iterator().asScala.toList
    } catch { case scala.util.control.NonFatal(_) => Nil }

  def snapshot(): Seq[AudioSampleDecoder] = programmatic ++ serviceLoaded

  def forContainer(container: String,
      decoders: Seq[AudioSampleDecoder]): Option[AudioSampleDecoder] =
    decoders.find(_.claims(container))
}
