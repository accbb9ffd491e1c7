package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Bitmap-index aggregation family — the reference's
  * `ewah_bitmap` / `ewah_bitmap_and` / `ewah_bitmap_or` /
  * `ewah_bitmap_empty` (ql/exec/FunctionRegistry.java:450-452,483;
  * ql/udf/generic/GenericUDAFEWAHBitmap.java) used for bitmap indexes.
  *
  * Re-expression: the aggregate collects row positions into a sparse
  * 64-bit-word bitmap encoded as a flat `[chunk0, word0, chunk1, word1,
  * ...]` array (chunks sorted ascending — deterministic under any merge
  * order). The ops (AND/OR/cardinality/empty) are semantics-compatible;
  * the byte layout intentionally is NOT javaewah's RLW stream — Hive
  * never exposes those bytes to queries, only to these same operators.
  */
object BitmapAgg {

  type WordMap = Map[Long, Long]

  /** positions -> sparse bitmap words. */
  class BitmapAggregator extends Aggregator[Long, WordMap, Array[Long]] {
    override def zero: WordMap = Map.empty
    override def reduce(b: WordMap, pos: Long): WordMap = {
      val chunk = pos >> 6
      b.updated(chunk, b.getOrElse(chunk, 0L) | (1L << (pos & 63)))
    }
    override def merge(a: WordMap, b: WordMap): WordMap =
      b.foldLeft(a) { case (acc, (c, w)) =>
        acc.updated(c, acc.getOrElse(c, 0L) | w)
      }
    override def finish(r: WordMap): Array[Long] =
      r.toSeq.sortBy(_._1).flatMap { case (c, w) => Seq(c, w) }.toArray
    override def bufferEncoder: Encoder[WordMap] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  // --- javaewah 0.3.2 long-array framing (the format Hive's
  // ewah_bitmap family passes through SQL arrays — writeExternal via
  // BitmapObjectOutput appends every int/long as one array slot):
  // [sizeInBits, wordCount, bufferCapacity, words..., lastRlwPos].
  // Verified against the reference's udf_bitmap_{and,or,empty}
  // goldens: empty-with-13-bits is [13,1,4,2,0]; bit 12 is
  // [13,2,4,8589934592,4096,0].

  /** Sparse pairs + target sizeInBits -> javaewah array framing.
    * Emulates the incremental set()+setSizeInBits construction:
    * canonical-greedy words, zero-run padding to the target word
    * count, and capacity growth by doubling from 4. */
  def toWire(pairs: Seq[Long], sizeInBitsIn: Long = -1L): Array[Long] = {
    val entries = pairs.grouped(2)
      .collect { case Seq(c, w) if w != 0L => (c, w) }.toArray.sortBy(_._1)
    val maxPos =
      if (entries.isEmpty) -1L
      else entries.last._1 * 64 + (63 - java.lang.Long.numberOfLeadingZeros(
        entries.last._2))
    val sizeInBits = math.max(sizeInBitsIn, maxPos + 1)
    val target = (sizeInBits + 63) / 64
    val (words, lastRlw) =
      if (entries.isEmpty) (Array(target << 1), 0)
      else {
        val (words0, lastRlw0, _) = Ewah.encodeWords(entries.flatMap {
          case (c, w) => Seq(c, w) }.toIndexedSeq)
        val covered = entries.last._1 + 1
        if (target > covered)
          (words0 :+ ((target - covered) << 1), words0.length)
        else (words0, lastRlw0)
      }
    var capacity = 4
    while (capacity < words.length) capacity *= 2
    (Seq(sizeInBits, words.length.toLong, capacity.toLong) ++ words :+
      lastRlw.toLong).toArray
  }

  /** javaewah array framing -> (sparse pairs, sizeInBits). */
  def fromWire(a: Seq[Long]): (Array[Long], Long) = {
    if (a.length < 3) return (Array.empty, 0L)
    val sizeInBits = a(0)
    val n = a(1).toInt
    (Ewah.decodeWords(a.drop(3).take(n)), sizeInBits)
  }

  /** positions -> javaewah-framed array (Hive's ewah_bitmap UDAF). */
  class EwahBitmapAggregator extends Aggregator[Long, WordMap, Array[Long]] {
    private val inner = new BitmapAggregator
    override def zero: WordMap = inner.zero
    override def reduce(b: WordMap, pos: Long): WordMap = inner.reduce(b, pos)
    override def merge(a: WordMap, b: WordMap): WordMap = inner.merge(a, b)
    override def finish(r: WordMap): Array[Long] = toWire(inner.finish(r))
    override def bufferEncoder: Encoder[WordMap] = inner.bufferEncoder
    override def outputEncoder: Encoder[Array[Long]] = inner.outputEncoder
  }

  def wireAnd(a: Seq[Long], b: Seq[Long]): Array[Long] = {
    val (pa, sa) = fromWire(a); val (pb, sb) = fromWire(b)
    toWire(and(pa.toIndexedSeq, pb.toIndexedSeq).toIndexedSeq,
      math.max(sa, sb))
  }
  def wireOr(a: Seq[Long], b: Seq[Long]): Array[Long] = {
    val (pa, sa) = fromWire(a); val (pb, sb) = fromWire(b)
    toWire(or(pa.toIndexedSeq, pb.toIndexedSeq).toIndexedSeq,
      math.max(sa, sb))
  }
  def wireEmpty(a: Seq[Long]): Boolean =
    cardinality(fromWire(a)._1.toIndexedSeq) == 0L

  private def toMap(a: Seq[Long]): WordMap =
    a.grouped(2).collect { case Seq(c, w) => c -> w }.toMap
  private def fromMap(m: WordMap): Array[Long] =
    m.toSeq.filter(_._2 != 0L).sortBy(_._1)
      .flatMap { case (c, w) => Seq(c, w) }.toArray

  def and(a: Seq[Long], b: Seq[Long]): Array[Long] = {
    val (ma, mb) = (toMap(a), toMap(b))
    fromMap(ma.keySet.intersect(mb.keySet)
      .map(c => c -> (ma(c) & mb(c))).toMap)
  }

  def or(a: Seq[Long], b: Seq[Long]): Array[Long] =
    fromMap(toMap(b).foldLeft(toMap(a)) { case (acc, (c, w)) =>
      acc.updated(c, acc.getOrElse(c, 0L) | w)
    })

  def cardinality(a: Seq[Long]): Long =
    toMap(a).values.map(java.lang.Long.bitCount(_).toLong).sum

  def isEmpty(a: Seq[Long]): Boolean = cardinality(a) == 0

  def register(spark: SparkSession): Unit = {
    spark.udf.register("bitmap_agg",
      org.apache.spark.sql.functions.udaf(new BitmapAggregator))
    spark.udf.register("bitmap_and", (a: Seq[Long], b: Seq[Long]) => and(a, b))
    spark.udf.register("bitmap_or", (a: Seq[Long], b: Seq[Long]) => or(a, b))
    spark.udf.register("bitmap_count", (a: Seq[Long]) => cardinality(a))
    spark.udf.register("bitmap_empty", (a: Seq[Long]) => isEmpty(a))
    // the reference's registry names for the same family
    // (ql/exec/FunctionRegistry.java:441-445; set semantics per
    // README — the wire format is the sparse word array, not javaewah)
    spark.udf.register("ewah_bitmap",
      org.apache.spark.sql.functions.udaf(new EwahBitmapAggregator))
    spark.udf.register("ewah_bitmap_and",
      (a: Seq[Long], b: Seq[Long]) => wireAnd(a, b))
    spark.udf.register("ewah_bitmap_or",
      (a: Seq[Long], b: Seq[Long]) => wireOr(a, b))
    spark.udf.register("ewah_bitmap_empty", (a: Seq[Long]) => wireEmpty(a))
    // actual EWAH64 RLW byte stream at the serialization boundary
    // (see graft.functions.Ewah)
    spark.udf.register("ewah_encode", (a: Seq[Long]) => Ewah.encode(a))
    spark.udf.register("ewah_decode",
      (b: Array[Byte]) => Ewah.decode(b))
  }
}
