package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: image/audio/video as
  * opaque binary columns with typed metadata.
  *
  * All three modalities are REAL end to end:
  *   - images: actual PNG payloads decoded by the JDK's headless ImageIO
  *     (PNG is lossless → bit-deterministic pixels);
  *   - audio: actual 16-bit PCM WAVs, hand-rolled RIFF chunk walk +
  *     integer sample statistics;
  *   - video: actual MJPEG-in-AVI containers — hand-rolled RIFF writer and
  *     walker, frame timing from the avih header, frames decoded as plain
  *     JPEGs by ImageIO.
  * Every stage runs as a batched mapPartitions over binary columns, and
  * decode failures are rows, not exceptions — the shape that survives a
  * 100 TB corpus where a fixed fraction of payloads is always corrupt.
  */
object Multimodal {

  java.lang.System.setProperty("java.awt.headless", "true")
  // ImageIO's default stream cache is a temp FILE per read/write call —
  // thousands of create/write/delete syscalls per media batch for
  // kilobyte-sized payloads. Memory caching changes no pixel/byte output
  // (PNG/JPEG codecs are untouched), it only removes disk round-trips.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRow(
      media_ref: String,
      mime: String,
      bytes: Array[Byte], // image/*: real PNG bytes; audio/video: opaque payload
      width: Int, height: Int, duration_ms: Int)

  final case class DecodedImage(
      media_ref: String,
      width: Int, height: Int, channels: Int,
      pixel_hash: Long) // rolling hash over the decoded ARGB raster

  final case class MediaFeature(media_ref: String, feature: Array[Float])

  /** Deterministic tiny RGB image for id (pure function of id). */
  private def synthImage(id: Long): BufferedImage = {
    val w = 8 + (id % 24).toInt
    val h = 8 + (id % 16).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var s = id * 0x9E3779B97F4A7C15L + 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
        img.setRGB(x, y, ((s * 0x2545F4914F6CDD1DL) >>> 40).toInt & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Canonical 44-byte-header mono 16-bit PCM WAV with a deterministic
    * waveform (integer triangle wave + xorshift dither — pure integer math,
    * bit-identical everywhere).
    */
  private def synthWav(id: Long): (Array[Byte], Int) = {
    val sampleRate = 8000
    val durationMs = 40 + (id % 200).toInt // 40-240 ms → 320-1920 samples
    val n = sampleRate * durationMs / 1000
    val data = new Array[Byte](44 + n * 2)
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    val period = 40 + (id % 60).toInt
    var s = id * 0x9E3779B97F4A7C15L + 7
    var i = 0
    while (i < n) {
      val phase = i % period
      val tri = if (phase < period / 2) phase * 4000 / period else (period - phase) * 4000 / period
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      val dither = ((s * 0x2545F4914F6CDD1DL) >>> 56).toInt - 128
      bb.putShort((tri - 1000 + dither).toShort)
      i += 1
    }
    (data, durationMs)
  }

  /** One deterministic media row (pure function of id) — shared by the
    * distributed [[synthesize]] and the driver-side sequential expectation
    * loop that oracles the media contract queries.
    */
  def synthRow(id: Long): MediaRow = {
    val ref = s"s3://media/m$id"
    (id % 3) match {
      case 0 =>
        val img = synthImage(id)
        val bos = new ByteArrayOutputStream()
        ImageIO.write(img, "png", bos)
        MediaRow(ref, "image/png", bos.toByteArray,
          width = img.getWidth, height = img.getHeight, duration_ms = 0)
      case 1 =>
        val (wav, durMs) = synthWav(id)
        MediaRow(ref, "audio/wav", wav, width = 0, height = 0, duration_ms = durMs)
      case _ =>
        val (avi, w, h, durMs) = synthAvi(id)
        MediaRow(ref, "video/avi", avi, width = w, height = h, duration_ms = durMs)
    }
  }

  /** Deterministic synthetic media table: image rows carry REAL encoded
    * PNG bytes, audio rows REAL PCM WAV bytes, video rows REAL
    * MJPEG-in-AVI containers.
    */
  def synthesize(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(id => synthRow(id))
  }

  /** Modality-pruned synthesis: only the ids whose mime class the caller
    * will consume are generated. The media contract queries each decode ONE
    * modality but previously paid full payload synthesis (PNG/JPEG/WAV
    * encode) for all three classes and filtered after — this pushes the
    * mime predicate below the (opaque-to-Catalyst) row generator, the §4.2
    * "prune before the opaque function" rule. Partitioning is
    * scale-adaptive (session default parallelism), sized for the encode
    * kernel rather than the tiny id range.
    */
  def synthesizeClass(spark: SparkSession, n: Long, mimePrefix: String): Dataset[MediaRow] = {
    import spark.implicits._
    val cls = mimePrefix match {
      case "image" => 0L
      case "audio" => 1L
      case _ => 2L
    }
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .where(org.apache.spark.sql.functions.col("id") % 3 === cls)
      .map(id => synthRow(id))
  }

  // ── MJPEG-in-AVI: hand-rolled RIFF writer + walker (same approach as the
  // WAV chunk walk — no codec library exists in this container, but MJPEG
  // frames are plain JPEG files the JDK's ImageIO decodes natively, so the
  // video path is REAL end to end: container parse, frame timing from the
  // avih header, frame decode, pixel statistics) ──

  private val AviUsPerFrame = 250000 // 4 fps

  private def leInt(v: Int): Array[Byte] = {
    val b = new Array[Byte](4)
    b(0) = v.toByte; b(1) = (v >> 8).toByte; b(2) = (v >> 16).toByte; b(3) = (v >> 24).toByte
    b
  }

  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(payload.length + 9)
    bos.write(id.getBytes("US-ASCII")); bos.write(leInt(payload.length))
    bos.write(payload)
    if ((payload.length & 1) == 1) bos.write(0) // RIFF word alignment
    bos.toByteArray
  }

  private def riffList(listType: String, chunks: Array[Byte]*): Array[Byte] =
    riffChunk("LIST", listType.getBytes("US-ASCII") ++ chunks.flatten)

  /** Deterministic MJPEG AVI for id: 3-7 frames of an 8×8..15×13 xorshift
    * raster, JPEG-encoded. Returns (bytes, width, height, duration_ms).
    */
  private def synthAvi(id: Long): (Array[Byte], Int, Int, Int) = {
    val w = 8 + (id % 8).toInt
    val h = 8 + (id % 6).toInt
    val nFrames = 3 + (id % 5).toInt
    val frames = (0 until nFrames).map { k =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var s = id * 0x9E3779B97F4A7C15L + k * 1000003L + 13
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
          img.setRGB(x, y, ((s * 0x2545F4914F6CDD1DL) >>> 40).toInt & 0xFFFFFF)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avih = riffChunk("avih",
      Array(AviUsPerFrame, 0, 0, 0, nFrames, 0, 1, 0, w, h, 0, 0, 0, 0).flatMap(leInt))
    val strh = riffChunk("strh",
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
        Array(0, 0, 0, 1 /*scale*/, 4 /*rate*/, 0, nFrames, 0, -1, 0, 0, 0).flatMap(leInt))
    val strf = riffChunk("strf",
      Array(40, w, h, 1 | (24 << 16)).flatMap(leInt) ++ "MJPG".getBytes("US-ASCII") ++
        Array(w * h * 3, 0, 0, 0, 0).flatMap(leInt))
    val hdrl = riffList("hdrl", avih, riffList("strl", strh, strf))
    val movi = riffList("movi", frames.map(f => riffChunk("00dc", f)): _*)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = new ByteArrayOutputStream(body.length + 8)
    out.write("RIFF".getBytes("US-ASCII")); out.write(leInt(body.length)); out.write(body)
    (out.toByteArray, w, h, nFrames * (AviUsPerFrame / 1000))
  }

  /** RIFF AVI walk: (microseconds per frame from avih, video frame chunks
    * '##dc'/'##db' in stream order). Honors odd-size padding; malformed
    * containers → None (failure is data at corpus scale).
    */
  private[pipeline] def parseAvi(bytes: Array[Byte]): Option[(Int, Vector[Array[Byte]])] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def str4 = { val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII") }
      require(str4 == "RIFF"); bb.getInt
      require(str4 == "AVI ")
      var usPerFrame = 0
      val frames = Vector.newBuilder[Array[Byte]]
      def walk(end: Int): Unit = {
        while (bb.position() + 8 <= end) {
          val id = str4
          val size = bb.getInt
          val next = math.min(bb.position() + size + (size & 1), bytes.length)
          id match {
            case "LIST" =>
              str4 // list type — walk contents regardless (hdrl/strl/movi)
              walk(math.min(bb.position() + size - 4, bytes.length))
            case "avih" => usPerFrame = bb.getInt
            case v if v.length == 4 && (v.endsWith("dc") || v.endsWith("db")) =>
              val data = new Array[Byte](size)
              bb.get(data)
              frames += data
            case _ => // strh/strf/JUNK/idx1: skip
          }
          bb.position(next)
        }
      }
      walk(bytes.length)
      if (usPerFrame <= 0) None else Some((usPerFrame, frames.result()))
    } catch { case _: Exception => None }

  final case class DecodedAudio(
      media_ref: String,
      sample_rate: Int, channels: Int, n_samples: Int, duration_ms: Int,
      rms_x100: Long, zero_crossings: Int, peak: Int)

  /** Canonical RIFF/fmt/data chunk walk for 16-bit PCM WAV. */
  private def parseWav(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def str4 = { val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII") }
      require(str4 == "RIFF"); bb.getInt
      require(str4 == "WAVE")
      var sampleRate = 0
      var channels = 0
      var samples: Array[Short] = null
      while (bb.remaining() >= 8 && samples == null) {
        val chunk = str4
        val size = bb.getInt
        // RIFF word alignment: chunks are padded to even byte counts, so
        // skipping/closing an odd-sized chunk must advance size + 1
        val skip = size + (size & 1)
        chunk match {
          case "fmt " =>
            val fmtEnd = bb.position() + skip
            require(bb.getShort == 1, "PCM only")
            channels = bb.getShort
            sampleRate = bb.getInt
            bb.getInt; bb.getShort
            require(bb.getShort == 16, "16-bit only")
            bb.position(fmtEnd)
          case "data" =>
            val n = size / 2
            samples = new Array[Short](n)
            var i = 0
            while (i < n) { samples(i) = bb.getShort; i += 1 }
          case _ => bb.position(bb.position() + skip)
        }
      }
      if (samples == null || sampleRate <= 0 || channels <= 0) None
      else Some((sampleRate, channels, samples))
    } catch { case _: Exception => None }

  /** (sumSq, zero crossings, peak) over PCM samples — integer math. */
  private def pcmStats(samples: Array[Short]): (Long, Int, Int) = {
    var sumSq = 0L
    var zc = 0
    var peak = 0
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toInt
      sumSq += v.toLong * v
      if (i > 0 && ((v >= 0) != (samples(i - 1) >= 0))) zc += 1
      if (math.abs(v) > peak) peak = math.abs(v)
      i += 1
    }
    (sumSq, zc, peak)
  }

  /** Per-row WAV kernel — shared by [[decodeAudio]] and the sequential
    * expectation path.
    */
  def decodeAudioRow(m: MediaRow): DecodedAudio =
    parseWav(m.bytes) match {
      case Some((sampleRate, channels, samples)) =>
        val (sumSq, zc, peak) = pcmStats(samples)
        val rmsX100 = (math.sqrt(sumSq.toDouble / math.max(samples.length, 1)) * 100).toLong
        DecodedAudio(m.media_ref, sampleRate, channels,
          samples.length / channels,
          (samples.length.toLong / channels * 1000 / sampleRate).toInt,
          rmsX100, zc, peak)
      case None => DecodedAudio(m.media_ref, 0, 0, 0, 0, 0L, 0, 0)
    }

  /** REAL WAV decode: chunk walk + 16-bit PCM statistics, all integer math
    * (IEEE sqrt is exactly rounded, so the ×100 RMS floor is
    * deterministic). Malformed payloads emit a failure row (channels = 0).
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.filter(_.mime.startsWith("audio/")).map(decodeAudioRow _)
    }
  }

  /** Rolling hash over the decoded ARGB raster (row-major). */
  private def rasterHash(img: BufferedImage): Long = {
    var h = 1125899906842597L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        h = 31 * h + img.getRGB(x, y)
        x += 1
      }
      y += 1
    }
    h
  }

  /** REAL image decode: batched per-partition transform running JDK
    * ImageIO (headless, thread-safe per call). Undecodable payloads emit a
    * failure row (channels = 0) instead of killing the task — at corpus
    * scale decode errors are data, not exceptions.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.filter(_.mime.startsWith("image/")).map(decodeImageRow _)
    }
  }

  /** Per-row image kernel — shared by [[decodeImages]] and the sequential
    * expectation path.
    */
  def decodeImageRow(m: MediaRow): DecodedImage =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(m.bytes))
      if (img == null) DecodedImage(m.media_ref, -1, -1, 0, 0L)
      else DecodedImage(m.media_ref, img.getWidth, img.getHeight,
        channels = img.getColorModel.getNumComponents,
        pixel_hash = rasterHash(img))
    } catch {
      case _: Exception => DecodedImage(m.media_ref, -1, -1, 0, 0L)
    }

  final case class ResizedImage(
      media_ref: String,
      width: Int, height: Int, // output dims
      png: Array[Byte], pixel_hash: Long)

  /** REAL image resize: decode → nearest-neighbor downscale to fit
    * `maxDim` (aspect preserved) → re-encode PNG. Nearest-neighbor is
    * implemented by hand (integer source-index math) so the resampled
    * pixels are bit-deterministic across platforms — AWT's filtered
    * scalers are not. Upscaling is never done (training pipelines
    * normalize down, not up).
    */
  def resizeImages(media: Dataset[MediaRow], maxDim: Int): Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.filter(_.mime.startsWith("image/")).flatMap(resizeImageRow(_, maxDim))
    }
  }

  /** Per-row resize kernel — shared by [[resizeImages]] and the sequential
    * expectation path.
    */
  def resizeImageRow(m: MediaRow, maxDim: Int): Option[ResizedImage] =
    try {
      val src = ImageIO.read(new ByteArrayInputStream(m.bytes))
      if (src == null) None
      else {
        val scaleNum = math.min(maxDim, math.max(src.getWidth, src.getHeight))
        val scaleDen = math.max(src.getWidth, src.getHeight)
        val w = math.max(src.getWidth * scaleNum / scaleDen, 1)
        val h = math.max(src.getHeight * scaleNum / scaleDen, 1)
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          val sy = y * src.getHeight / h
          var x = 0
          while (x < w) {
            out.setRGB(x, y, src.getRGB(x * src.getWidth / w, sy) & 0xFFFFFF)
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        Some(ResizedImage(m.media_ref, w, h, bos.toByteArray, rasterHash(out)))
      }
    } catch { case _: Exception => None }

  /** Materialize PDF-embedded rasters as MediaRows — the media side of the
    * OCR path (O2): one row per decodable image XObject, `media_ref`
    * matching the extraction kernel's span refs
    * (`pdf:<doc>/page<N>/<name>.<ext>`, Extractor's OCR-trigger branch), so
    * an equi-join on media_ref against extracted media spans yields exactly
    * the OCR-triggered payloads. Byte materialization happens HERE, not in
    * the text kernel — at 100 TB most rasters are never OCR'd, so run this
    * on the ref-pruned doc subset (semi-join the corpus against the
    * extracted media refs first; `Extraction.extractOcrQueue` is that plan)
    * and only triggered documents ever pay decode cost (reference behavior:
    * pdf_images.go:30-67 extracts page images only when the OCR rule fires).
    */
  def pdfMediaRows(docs: Dataset[Doc]): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      it.flatMap { d =>
        d.spans.iterator
          .filter(s => s.kind == "pdf" || s.kind == "bin")
          .flatMap { s =>
            val payload = graft.core.Extractor.decodePayload(s.text)
            if (graft.core.Extractor.sniff(payload) != "pdf") Iterator.empty
            else try {
              graft.core.pdf.PdfImages.extractAll(payload).iterator.map {
                case (p, name, ext, mime, bytes) =>
                  MediaRow(s"pdf:${d.doc_id}/page$p/$name.$ext", mime, bytes,
                    width = 0, height = 0, duration_ms = 0)
              }
            } catch { case _: Exception => Iterator.empty }
          }
      }
    }
  }

  /** REAL frame sampling for video: walk the RIFF AVI container, pick the
    * frame under each `everyMs` grid point (timing from the avih
    * microseconds-per-frame header), decode the MJPEG frame with ImageIO,
    * and emit dims + raster hash. Unparseable containers produce one
    * failure row (frame_idx = −1) — data, not an exception.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Int = 1000): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.mime.startsWith("video/"))
      .flatMap(m => sampleFrameRows(m, everyMs))
      .toDF("media_ref", "ts_ms", "frame_ref", "frame_idx", "width", "height", "pixel_hash")
  }

  /** Per-row frame-sampling kernel — shared by [[sampleFrames]] and the
    * sequential expectation path.
    */
  def sampleFrameRows(m: MediaRow, everyMs: Int): Iterator[(String, Int, String, Int, Int, Int, Long)] =
    parseAvi(m.bytes) match {
      case Some((usPerFrame, frames)) if frames.nonEmpty =>
        val frameMs = math.max(usPerFrame / 1000, 1)
        val durMs = frames.length * frameMs
        (0 until durMs by everyMs).iterator.map { t =>
          val idx = math.min(t / frameMs, frames.length - 1)
          val img = try ImageIO.read(new ByteArrayInputStream(frames(idx)))
          catch { case _: Exception => null }
          if (img == null)
            (m.media_ref, t, s"${m.media_ref}#t=$t", idx, -1, -1, 0L)
          else
            (m.media_ref, t, s"${m.media_ref}#t=$t", idx,
              img.getWidth, img.getHeight, rasterHash(img))
        }
      case _ =>
        Iterator((m.media_ref, -1, s"${m.media_ref}#unparseable", -1, -1, -1, 0L))
    }

  /** Feature extraction: REAL 8-dim features everywhere — image pixels via
    * ImageIO, audio via the PCM walk, video via the AVI walk + first-frame
    * MJPEG decode (same pixel statistics as images). Only undecodable
    * payloads fall back to a deterministic pseudo-embedding of the raw
    * bytes (the honest failure path).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val decoded =
          if (m.mime.startsWith("image/"))
            try Option(ImageIO.read(new ByteArrayInputStream(m.bytes)))
            catch { case _: Exception => None }
          else if (m.mime.startsWith("video/"))
            parseAvi(m.bytes).flatMap(_._2.headOption).flatMap { f =>
              try Option(ImageIO.read(new ByteArrayInputStream(f)))
              catch { case _: Exception => None }
            }
          else None
        decoded match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var grad = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
                if (x > 0) grad += math.abs((p & 0xFF) - (img.getRGB(x - 1, y) & 0xFF))
                x += 1
              }
              y += 1
            }
            val n = (w * h).toFloat
            MediaFeature(m.media_ref, Array(
              w.toFloat, h.toFloat,
              sr / n, sg / n, sb / n,
              grad / n,
              (rasterHash(img) & 0xFFFF).toFloat,
              n))
          case None =>
            val audio = if (m.mime.startsWith("audio/")) parseWav(m.bytes) else None
            audio match {
              case Some((sampleRate, channels, samples)) =>
                // real PCM features: rate, channels, length, RMS, ZC rate, peak
                val (sumSq, zc, peak) = pcmStats(samples)
                val n = math.max(samples.length, 1).toFloat
                MediaFeature(m.media_ref, Array(
                  sampleRate.toFloat, channels.toFloat, samples.length.toFloat,
                  math.sqrt(sumSq.toDouble / n).toFloat,
                  zc / n, peak.toFloat,
                  (samples.length.toLong * 1000 / (sampleRate.toLong * channels)).toFloat,
                  1f))
              case None => // undecodable payload: deterministic pseudo-embedding
                var hsh = 1125899906842597L
                var i = 0
                while (i < m.bytes.length) { hsh = 31 * hsh + (m.bytes(i) & 0xFF); i += 1 }
                val f = new Array[Float](8)
                var j = 0
                var s = hsh
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
  }
}
