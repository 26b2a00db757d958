package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The Spark side is real — schema, partition-iterator batch shape, typed
  * Encoders, binary-column handling. The codec itself is [[StubDecoder]]:
  * this container has no image/audio libraries, so decode is a
  * clearly-marked deterministic fake with the exact signature a production
  * decoder (JNI/FFI image lib) would have. Swapping it in changes no plan
  * shape: decode stays a narrow map over partitions, no shuffle.
  */
object Multimodal {

  /** Typed per-media feature row (the post-decode schema). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_ms: Long,
      features: Array[Float])

  /** STUB — deterministic fake decoder standing in for a real image/audio/
    * video codec (not available in this container). Derives plausible
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

  /** Partition-parallel decode + feature extraction. Narrow map — no
    * shuffle; at 100 TB this pipelines inside the scan stage with one
    * decoder instantiation per partition (the `it => ...` closure), not per
    * row. */
  def extractFeatures(media: DataFrame, featureDim: Int = 8)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      // decode is per-row heavy: spread a compact source across all cores
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (JNI handles etc.)
        it.map { case (mediaId, kind, bytes) =>
          val (w, h, d, feats) = StubDecoder.decode(kind, bytes, featureDim)
          MediaFeatures(mediaId, kind, bytes.length.toLong, w, h, d, feats)
        }
      }
  }
}
