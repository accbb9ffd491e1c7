package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batched feature extraction over partitions.
  *
  * The decode step is STUBBED (no image/audio codecs in this
  * environment) with a deterministic fake decoder; everything around it
  * — schema, per-partition batching, feature column shapes, partition
  * sizing — is the real engine surface a 100 TB media pipeline uses.
  * On a cluster the `decodeStub` body is the only thing swapped for a
  * real codec (JNI/FFmpeg/libjpeg), keeping the operator contract.
  */
object Multimodal {

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

  /** Batched per-partition feature extraction (mapPartitions is the
    * right tier here — the decode is genuinely imperative; everything
    * upstream/downstream stays in Catalyst). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "format", "n_bytes").as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val (checksum, mean, hist) = decodeStub(r.media)
          MediaFeatures(r.doc_id, r.n_bytes, checksum, mean,
            hist(0), hist(1), hist(2), hist(3))
        }
      }.toDF()
  }
}
