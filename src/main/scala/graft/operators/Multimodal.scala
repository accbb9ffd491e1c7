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
