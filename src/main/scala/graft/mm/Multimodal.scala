package graft.mm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing for a training-data pipeline: media travel as
 * opaque `binary` columns with a typed metadata struct; decode /
 * feature-extract / resize / frame-sample run as partition-local typed
 * transforms (the Scala analogue of `mapInPandas`: one JVM-side batch
 * function per partition, vectorizable, no driver round-trip).
 *
 * The actual codec is STUBBED deterministically (no image/audio libraries
 * exist in this offline container — documented boundary): a fake container
 * format "GRFT" with a fixed 12-byte header
 *   bytes 0-3  magic "GRFT"
 *   byte  4    media type (0=image 1=audio 2=video)
 *   byte  5    channels
 *   bytes 6-7  width  (big endian)
 *   bytes 8-9  height (big endian)
 *   bytes 10-11 n frames
 * followed by the payload. The Spark-side plumbing — schema, partitioning,
 * batch shape, null handling — is real and tested; swapping in a real codec
 * replaces only the byte-level functions here.
 */
object Multimodal {

  val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")

  final case class MediaMeta(mediaType: Int, channels: Int, width: Int, height: Int, frames: Int)

  /** Deterministic synthetic blob for tests/benchmarks. */
  def synthBlob(seed: Long, mediaType: Int): Array[Byte] = {
    val w = (32 + math.floorMod(seed, 96L)).toInt
    val h = (32 + math.floorMod(seed >> 7, 96L)).toInt
    val frames = if (mediaType == 2) (1 + math.floorMod(seed >> 13, 30L)).toInt else 1
    val channels = if (mediaType == 1) 2 else 3
    val payloadLen = math.min(w * h, 4096)
    val out = new Array[Byte](12 + payloadLen)
    System.arraycopy(Magic, 0, out, 0, 4)
    out(4) = mediaType.toByte
    out(5) = channels.toByte
    out(6) = (w >> 8).toByte; out(7) = w.toByte
    out(8) = (h >> 8).toByte; out(9) = h.toByte
    out(10) = (frames >> 8).toByte; out(11) = frames.toByte
    var i = 0
    var s = seed
    while (i < payloadLen) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(12 + i) = (s >> 33).toByte
      i += 1
    }
    out
  }

  /** Header decode — the "metadata extraction" stage. Null-safe: malformed
    * blobs yield null metadata (never an exception on a 100 TB scan). */
  def decodeMeta(blob: Array[Byte]): Option[MediaMeta] = {
    if (blob == null || blob.length < 12) return None
    var i = 0
    while (i < 4) { if (blob(i) != Magic(i)) return None; i += 1 }
    Some(MediaMeta(blob(4) & 0xff, blob(5) & 0xff,
      ((blob(6) & 0xff) << 8) | (blob(7) & 0xff),
      ((blob(8) & 0xff) << 8) | (blob(9) & 0xff),
      ((blob(10) & 0xff) << 8) | (blob(11) & 0xff)))
  }

  /** STUB "decode + feature extraction": an 8-bucket byte histogram of the
    * payload, L1-normalized. A real implementation would decode pixels and
    * pool embeddings; the dataflow shape (binary -> fixed-size float vector)
    * is identical. */
  def featureHistogram(blob: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    if (blob == null || blob.length <= 12) return hist
    var i = 12
    while (i < blob.length) { hist((blob(i) & 0xff) >> 5) += 1f; i += 1 }
    val n = (blob.length - 12).toFloat
    var b = 0
    while (b < 8) { hist(b) /= n; b += 1 }
    hist
  }

  /** STUB resize: re-emit a blob with new header dims, payload re-sampled
    * deterministically (every k-th byte). Real codec would rescale pixels. */
  def resize(blob: Array[Byte], w: Int, h: Int): Array[Byte] = {
    decodeMeta(blob) match {
      case None => null
      case Some(m) =>
        val srcLen = blob.length - 12
        val dstLen = math.max(1, math.min(w * h, srcLen))
        val out = new Array[Byte](12 + dstLen)
        System.arraycopy(blob, 0, out, 0, 12)
        out(6) = (w >> 8).toByte; out(7) = w.toByte
        out(8) = (h >> 8).toByte; out(9) = h.toByte
        var i = 0
        while (i < dstLen) { out(12 + i) = blob(12 + (i.toLong * srcLen / dstLen).toInt); i += 1 }
        out
    }
  }

  /** STUB frame sampling for video blobs: every `stride`-th frame index. */
  def sampleFrames(blob: Array[Byte], stride: Int): Array[Int] =
    decodeMeta(blob) match {
      case Some(m) if m.mediaType == 2 && stride > 0 =>
        (0 until m.frames by stride).toArray
      case _ => Array.empty
    }

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("mm_synth_blob", (seed: Long, t: Int) => synthBlob(seed, t))
    u.register("mm_meta", (b: Array[Byte]) => decodeMeta(b).orNull)
    u.register("mm_features", (b: Array[Byte]) => featureHistogram(b))
    u.register("mm_resize", (b: Array[Byte], w: Int, h: Int) => resize(b, w, h))
    u.register("mm_sample_frames", (b: Array[Byte], s: Int) => sampleFrames(b, s))
  }

  /** Partition-local batch transform (mapInPandas analogue): decode metadata
    * + features for a whole media table without per-row UDF dispatch. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select($"media_id", $"blob")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          val m = decodeMeta(blob)
          (id, m.map(_.mediaType).getOrElse(-1), m.map(_.width).getOrElse(0),
            m.map(_.height).getOrElse(0), m.map(_.frames).getOrElse(0),
            featureHistogram(blob))
        }
      }
      .toDF("media_id", "media_type", "width", "height", "frames", "features")
  }
}
