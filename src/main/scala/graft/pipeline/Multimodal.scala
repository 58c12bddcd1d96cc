package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: image/audio/video as
  * opaque binary columns with typed metadata. The actual codecs are not in
  * this container, so decode/feature-extract are STUBS with deterministic
  * fake outputs — but the Spark-side plumbing (schema, batched
  * mapPartitions shape, partitioning) is real and tested, and swaps to a
  * native decoder without touching the plan shape.
  */
object Multimodal {

  final case class MediaRow(
      media_ref: String,
      mime: String,
      bytes: Array[Byte], // opaque payload
      width: Int, height: Int, duration_ms: Int)

  final case class DecodedImage(
      media_ref: String,
      width: Int, height: Int, channels: Int,
      pixel_hash: Long) // deterministic content hash of the "decoded" pixels

  final case class MediaFeature(media_ref: String, feature: Array[Float])

  /** Deterministic synthetic media table (bytes derived from the ref). */
  def synthesize(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val ref = s"s3://media/m$id"
      val mime = (id % 3) match {
        case 0 => "image/png"
        case 1 => "audio/wav"
        case _ => "video/mp4"
      }
      val len = 256 + (id % 512).toInt
      val bytes = new Array[Byte](len)
      var h = id * 0x9E3779B97F4A7C15L + 1
      var i = 0
      while (i < len) {
        h ^= h >>> 12; h ^= h << 25; h ^= h >>> 27
        bytes(i) = (h * 0x2545F4914F6CDD1DL >>> 56).toByte
        i += 1
      }
      MediaRow(ref, mime, bytes,
        width = 64 + (id % 960).toInt, height = 64 + (id % 540).toInt,
        duration_ms = if (mime == "image/png") 0 else 1000 + (id % 60000).toInt)
    }
  }

  /** STUB image decode: batched per-partition transform (the mapInPandas
    * analog). Deterministic: "pixels" are a rolling hash of the payload.
    * A real decoder replaces only the body of the map function.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.filter(_.mime.startsWith("image/")).map { m =>
        var h = 1125899906842597L
        var i = 0
        while (i < m.bytes.length) { h = 31 * h + (m.bytes(i) & 0xFF); i += 1 }
        DecodedImage(m.media_ref, m.width, m.height, channels = 3, pixel_hash = h)
      }
    }
  }

  /** STUB frame sampling for video: every `everyMs` milliseconds → frame
    * refs (plumbing for a real frame extractor).
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Int = 1000): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.mime.startsWith("video/"))
      .flatMap { m =>
        (0 until m.duration_ms by everyMs).map(t => (m.media_ref, t, s"${m.media_ref}#t=$t"))
      }
      .toDF("media_ref", "ts_ms", "frame_ref")
  }

  /** STUB feature extraction: 8-dim deterministic pseudo-embedding from the
    * payload hash (swap for a real encoder; schema and batching stay).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        var h = 1125899906842597L
        var i = 0
        while (i < m.bytes.length) { h = 31 * h + (m.bytes(i) & 0xFF); i += 1 }
        val f = new Array[Float](8)
        var j = 0
        var s = h
        while (j < 8) {
          s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
          f(j) = ((s * 0x2545F4914F6CDD1DL >>> 11).toDouble / (1L << 53).toDouble).toFloat
          j += 1
        }
        MediaFeature(m.media_ref, f)
      }
    }
  }
}
