package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batched feature extraction over partitions.
  *
  * IMAGE payloads decode for real: the JDK ships ImageIO codecs for
  * PNG/JPEG/BMP/GIF, so `format` in the image family routes through
  * [[Multimodal.decodeImage]] (width/height/channels/mean-luminance
  * features from actual pixels). AUDIO payloads decode for real too:
  * javax.sound.sampled reads WAV/AU/AIFF PCM, so the audio family
  * routes through [[Multimodal.decodeAudio]] (sample rate/channels/
  * duration/RMS from actual samples). Video and opaque payloads
  * keep the deterministic `decodeStub` (no such codecs in the JVM);
  * everything around the decode — schema, per-partition batching,
  * feature column shapes, partition sizing — is the same engine
  * surface either way, and on a cluster the stub body is the only
  * thing swapped for a JNI/FFmpeg codec, keeping the operator
  * contract.
  */
object Multimodal {

  /** Formats the JDK's ImageIO decodes out of the box. */
  private val imageFormats = Set("png", "jpg", "jpeg", "bmp", "gif")

  /** Formats the JDK's javax.sound.sampled decodes out of the box. */
  private val audioFormats = Set("wav", "wave", "au", "aiff", "aif")

  case class MediaRow(doc_id: Long, media: Array[Byte], format: String,
                      n_bytes: Long)
  /** Feature vector flattened to fixed scalar slots (f0..f3) — scalar
    * columns survive any downstream compare/sort harness and columnar
    * stats (min/max pruning) apply per-slot, which an array column
    * would forfeit. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
                           mean_byte: Double, f0: Double, f1: Double,
                           f2: Double, f3: Double)

  /** Build a media table from documents (payload = UTF-8 bytes standing
    * in for an image/audio blob). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("media"),
      lit("txt").as("format"),
      length(col("text")).cast("long").as("n_bytes"))

  /** Build an AUDIO media table from documents: each doc's UTF-8
    * bytes become the sample words of a REAL RIFF/WAVE container
    * (8-bit unsigned mono PCM at 8 kHz), so the downstream
    * [[extractFeatures]] exercises the genuine javax.sound.sampled
    * decode path — header parse, format negotiation, PCM read — not
    * the opaque-payload stub. Deterministic by construction, which
    * is what lets a SQL oracle re-derive rate/channels/duration/RMS
    * arithmetically from the same bytes. mapPartitions is the codec
    * boundary tier (same as decode); nothing shuffles. */
  def audioTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, data) =>
          val n = data.length
          val bb = java.nio.ByteBuffer.allocate(44 + n)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + n)
          bb.put("WAVE".getBytes("US-ASCII"))
          bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
          bb.putShort(1) // PCM
          bb.putShort(1) // mono
          bb.putInt(8000) // sample rate
          bb.putInt(8000) // byte rate (8-bit mono)
          bb.putShort(1) // block align
          bb.putShort(8) // bits per sample
          bb.put("data".getBytes("US-ASCII")); bb.putInt(n)
          bb.put(data)
          MediaRow(id, bb.array(), "wav", n.toLong)
        }
      }.toDF()
  }

  /** STUB decoder: deterministic byte statistics standing in for a real
    * image/audio decode. Replace with a codec at deployment; signature
    * (bytes -> fixed-width feature vector) is the contract. */
  private def decodeStub(bytes: Array[Byte]): (Long, Double, Array[Double]) = {
    var sum = 0L
    var checksum = 17L
    val hist = new Array[Double](4)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      checksum = checksum * 31 + b
      hist(b % 4) += 1d
      i += 1
    }
    val mean = if (bytes.length == 0) 0d else sum.toDouble / bytes.length
    (checksum, mean, hist)
  }

  /** Resize: media payload -> payload at a target resolution. The
    * codec body is a STUB (deterministic byte subsampling standing in
    * for a real scaler); the engine surface — binary-in/binary-out
    * per-partition batching, metadata recomputation — is real. At
    * 100 TB this runs wherever the scan runs; nothing shuffles. */
  case class ResizedRow(doc_id: Long, media: Array[Byte], format: String,
                        n_bytes: Long)

  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "format", "n_bytes").as[MediaRow]
      .mapPartitions(_.map { r =>
        val out =
          if (r.media.length <= targetBytes) r.media
          else { // stub scaler: stride-subsample to the target size
            val stride = r.media.length.toDouble / targetBytes
            Array.tabulate(targetBytes)(i => r.media((i * stride).toInt))
          }
        ResizedRow(r.doc_id, out, r.format, out.length.toLong)
      }).toDF()
  }

  /** Frame sampling: one media payload -> n frame payloads, exploded to
    * a row per frame (the shape a video pipeline feeds to per-frame
    * feature extraction). Stub decoder: contiguous byte ranges stand in
    * for decoded frames; the row explosion, frame indexing, and
    * downstream-compatible schema are the real contract. */
  case class FrameRow(doc_id: Long, frame_no: Int, media: Array[Byte],
                      format: String, n_bytes: Long)

  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "format", "n_bytes").as[MediaRow]
      .flatMap { r =>
        val n = math.min(nFrames, math.max(1, r.media.length))
        (0 until n).map { f =>
          val from = r.media.length.toLong * f / n
          val until = r.media.length.toLong * (f + 1) / n
          val bytes = r.media.slice(from.toInt, until.toInt)
          FrameRow(r.doc_id, f, bytes, r.format, bytes.length.toLong)
        }
      }.toDF()
  }

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF — no
    * external codec needed). Features from actual pixels:
    * f0=width, f1=height, f2=color channels, f3=mean luminance
    * (ITU-R BT.601 weights, 0-255); checksum folds the RGB raster;
    * mean = mean luminance. None when the payload is not a decodable
    * image (caller falls back to the opaque-payload stub). */
  private def decodeImage(bytes: Array[Byte])
      : Option[(Long, Double, Array[Double])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val channels = img.getColorModel.getNumComponents.toDouble
        var lumSum = 0d
        var checksum = 17L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            lumSum += 0.299 * r + 0.587 * g + 0.114 * b
            checksum = checksum * 31 + (rgb & 0xffffff)
            x += 1
          }
          y += 1
        }
        val mean = lumSum / (w.toLong * h)
        Some((checksum, mean,
          Array(w.toDouble, h.toDouble, channels, mean)))
      }
    } catch { case _: Exception => None }

  /** REAL audio decode via the JDK's javax.sound.sampled
    * (WAV/AU/AIFF PCM — no external codec needed). Features from
    * actual samples: f0=sample rate (Hz), f1=channels, f2=duration
    * (seconds), f3=RMS amplitude normalized to [0,1]; checksum folds
    * the raw sample words; mean = the normalized RMS. None when the
    * payload is not a decodable audio stream (caller falls back to
    * the opaque-payload stub — compressed codecs like MP3/Opus are
    * the deployment-time swap, same contract). */
  private def decodeAudio(bytes: Array[Byte])
      : Option[(Long, Double, Array[Double])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val rate = fmt.getSampleRate.toDouble
        val channels = fmt.getChannels
        val bits = fmt.getSampleSizeInBits
        val frames = in.getFrameLength
        if (rate <= 0 || channels <= 0 || frames <= 0) return None
        val data = in.readAllBytes()
        // INTEGER sum of squares: the RMS is then sqrt of one exact
        // rational — bit-reproducible against any oracle that folds
        // the same sample words, with no float-accumulation-order
        // drift (Long holds 16-bit squares for ~2^33 samples)
        var sumSq = 0L
        var n = 0L
        var checksum = 17L
        var scale = 1d
        if (bits == 16) {
          scale = 32768d
          val big = fmt.isBigEndian
          var i = 0
          while (i + 1 < data.length) {
            val s =
              if (big) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
              else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
            sumSq += s.toLong * s
            checksum = checksum * 31 + s
            n += 1
            i += 2
          }
        } else if (bits == 8) {
          // WAV 8-bit PCM is UNSIGNED, centered at 128
          scale = 128d
          var i = 0
          while (i < data.length) {
            val s = (data(i) & 0xff) - 128
            sumSq += s.toLong * s
            checksum = checksum * 31 + s
            n += 1
            i += 1
          }
        } else return None
        if (n == 0) return None
        val rms = math.sqrt(sumSq / (n * scale * scale))
        val duration = frames / rate
        Some((checksum, rms,
          Array(rate, channels.toDouble, duration, rms)))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Batched per-partition feature extraction (mapPartitions is the
    * right tier here — the decode is genuinely imperative; everything
    * upstream/downstream stays in Catalyst). Image formats decode
    * real pixels, audio formats real PCM samples; opaque payloads
    * take the deterministic stub. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "format", "n_bytes").as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val f = r.format.toLowerCase
          val (checksum, mean, hist) =
            (if (imageFormats.contains(f)) decodeImage(r.media)
            else if (audioFormats.contains(f)) decodeAudio(r.media)
            else None).getOrElse(decodeStub(r.media))
          MediaFeatures(r.doc_id, r.n_bytes, checksum, mean,
            hist(0), hist(1), hist(2), hist(3))
        }
      }.toDF()
  }
}
