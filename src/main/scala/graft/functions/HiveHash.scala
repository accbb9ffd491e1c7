package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bit-compatible re-implementation of Hive's `hash()` UDF.
  *
  * Semantics transcribed from the reference:
  *  - per-value hash: serde2/objectinspector/ObjectInspectorUtils.java:643-714
  *    (null->0, boolean->1/0, byte/short/int->value,
  *     long->(int)((v>>>32)^v), float->floatToIntBits,
  *     double->fold of doubleToLongBits, string->31-fold over UTF-8 bytes)
  *  - multi-arg combine: getBucketHashCode, ObjectInspectorUtils.java:633-640
  *    (h = 31*h + fieldHash, seed 0)
  *  - UDF entry: ql/udf/generic/GenericUDFHash.java:46-53
  *
  * Bit-compatibility matters because Hive bucket layouts are derived from
  * this value (getBucketNumber) — an engine reading Hive-bucketed tables
  * must agree on it. Interpreted eval (CodegenFallback) — not a hot path.
  */
case class HiveHash(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "hive_hash"

  override def eval(input: InternalRow): Any = {
    var h = 0
    children.foreach { c =>
      h = 31 * h + HiveHash.hashValue(c.eval(input), c.dataType)
    }
    h
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HiveHash =
    copy(children = newChildren)
}

object HiveHash {
  /** Text.hashCode / WritableComparator.hashBytes: 31-fold, seed 1. */
  private def textHash(bytes: Array[Byte]): Int = {
    var r = 1
    var i = 0
    while (i < bytes.length) { r = r * 31 + bytes(i); i += 1 }
    r
  }

  def hashValue(v: Any, dt: DataType): Int = (v, dt) match {
    case (null, _) => 0
    // TIMESTAMP: TimestampWritable.hashCode (serde2/io/TimestampWritable
    // .java:406-411) — seconds<<30 | nanos, folded. Spark's value is
    // epoch micros; Hive's nanos part only ever holds micro precision
    // here, so the two agree exactly.
    case (l: Long, TimestampType) =>
      val seconds = Math.floorDiv(l, 1000000L)
      val nanos = Math.floorMod(l, 1000000L) * 1000L
      val x = (seconds << 30) | nanos
      ((x >>> 32) ^ x).toInt
    // DECIMAL: HiveDecimalWritable.hashCode -> normalized (trailing
    // zeros stripped) BigDecimal.hashCode
    // (storage-api/.../common/type/HiveDecimal.java normalization)
    case (d: org.apache.spark.sql.types.Decimal, _) =>
      // BigDecimal.stripTrailingZeros can go to NEGATIVE scale
      // ("90.00" -> 9E+1, unscaled 9 scale -1) — HiveDecimal's
      // normalized form never does (FastHiveDecimal scale >= 0:
      // unscaled 90, scale 0), and the two hash differently
      val s = d.toJavaBigDecimal.stripTrailingZeros()
      (if (s.scale < 0) s.setScale(0) else s).hashCode()
    // BINARY: BytesWritable.hashCode = WritableComparator.hashBytes
    // (seed 1, 31-fold)
    case (b: Array[Byte], _) =>
      var r = 1
      var i = 0
      while (i < b.length) { r = 31 * r + b(i); i += 1 }
      r
    case (b: Boolean, _) => if (b) 1 else 0
    case (b: Byte, _) => b.toInt
    case (s: Short, _) => s.toInt
    // covers INT and DATE (DateWritable.hashCode = daysSinceEpoch,
    // which IS Spark's DateType value)
    case (i: Int, _) => i
    case (l: Long, _) => ((l >>> 32) ^ l).toInt
    case (f: Float, _) => java.lang.Float.floatToIntBits(f)
    case (d: Double, _) =>
      val a = java.lang.Double.doubleToLongBits(d)
      ((a >>> 32) ^ a).toInt
    // CHAR/VARCHAR: HiveCharWritable/HiveVarcharWritable.hashCode =
    // Text.hashCode of the STRIPPED value — WritableComparator
    // .hashBytes, which seeds 1 (unlike STRING's seed-0 fold;
    // serde2/io/HiveCharWritable.java:108-110,
    // HiveBaseCharWritable.java:61-63)
    case (s: UTF8String, _: CharType) =>
      textHash(s.trimRight().getBytes)
    case (s: UTF8String, _: VarcharType) =>
      textHash(s.getBytes)
    case (s: UTF8String, _) =>
      val bytes = s.getBytes
      var r = 0
      var i = 0
      while (i < bytes.length) { r = r * 31 + bytes(i); i += 1 }
      r
    case (other, _) =>
      throw new IllegalArgumentException(
        s"hive_hash: unsupported type $dt ($other)")
  }
}
