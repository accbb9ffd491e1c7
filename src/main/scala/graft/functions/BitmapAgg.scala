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
      org.apache.spark.sql.functions.udaf(new BitmapAggregator))
    spark.udf.register("ewah_bitmap_and",
      (a: Seq[Long], b: Seq[Long]) => and(a, b))
    spark.udf.register("ewah_bitmap_or",
      (a: Seq[Long], b: Seq[Long]) => or(a, b))
    spark.udf.register("ewah_bitmap_empty", (a: Seq[Long]) => isEmpty(a))
    // actual EWAH64 RLW byte stream at the serialization boundary
    // (see graft.functions.Ewah)
    spark.udf.register("ewah_encode", (a: Seq[Long]) => Ewah.encode(a))
    spark.udf.register("ewah_decode",
      (b: Array[Byte]) => Ewah.decode(b))
  }
}
