package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hive's variance family computes the running-sum-of-squares stream
  * update `variance += (count*v - sum)^2 / (count*(count-1))` per row
  * and a pairwise-combine on merge
  * (ql/udf/generic/GenericUDAFVariance.java:206-266,
  * GenericUDAFVarianceSample.java:85). Spark's Welford-style
  * CentralMomentAgg produces the same value mathematically but a
  * different floating-point rounding, and goldens that render the
  * result inside compute_stats structs record Hive's exact bits.
  * These compat aggregates replay Hive's arithmetic; sequential
  * (single-partition) input reproduces a single-reducer Hive run
  * bit-for-bit. Strings that fail to parse are skipped, as Hive
  * skips NumberFormatException rows. */
object HiveVariance {
  final class Buf(var count: Long, var sum: Double, var variance: Double)
    extends Serializable
}

abstract class HiveVarianceBase
    extends TypedImperativeAggregate[HiveVariance.Buf] {
  import HiveVariance.Buf

  def child: Expression
  /** divisor: count for pop, count-1 for samp. */
  protected def sample: Boolean
  /** sqrt the result (stddev) or not (variance). */
  protected def sqrtResult: Boolean

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def createAggregationBuffer(): Buf = new Buf(0L, 0.0, 0.0)

  private def toDouble(v: Any): java.lang.Double = v match {
    case null => null
    case d: Double => d
    case f: Float => f.toDouble
    case n: Number => n.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case s: UTF8String =>
      try java.lang.Double.valueOf(s.toString.trim)
      catch { case _: NumberFormatException => null }
    case _ => null
  }

  override def update(b: Buf, input: InternalRow): Buf = {
    val v0 = toDouble(child.eval(input))
    if (v0 != null) {
      val v = v0.doubleValue()
      b.count += 1
      b.sum += v
      if (b.count > 1) {
        val t = b.count * v - b.sum
        b.variance += (t * t) / (b.count.toDouble * (b.count - 1))
      }
    }
    b
  }

  override def merge(b: Buf, o: Buf): Buf = {
    val n = b.count; val m = o.count
    if (n == 0) { b.count = o.count; b.sum = o.sum; b.variance = o.variance }
    else if (m != 0) {
      val a = b.sum; val bb = o.sum
      b.count += m
      b.sum += bb
      val t = (m / n.toDouble) * a - bb
      b.variance += o.variance + ((n / m.toDouble) / (n.toDouble + m)) * t * t
    }
    b
  }

  // Null only for count==0; count==1 yields 0.0 even for the sample
  // variants (GenericUDAFVarianceSample.java:78-88: "for one element
  // the variance is always 0").
  override def eval(b: Buf): Any =
    if (b.count == 0) null
    else {
      val r =
        if (b.count == 1) 0.0
        else b.variance / (if (sample) b.count - 1 else b.count)
      if (sqrtResult) math.sqrt(r) else r
    }

  override def serialize(b: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24)
    bb.putLong(b.count).putDouble(b.sum).putDouble(b.variance)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    new Buf(bb.getLong, bb.getDouble, bb.getDouble)
  }
}

case class HiveVarPop(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HiveVarianceBase {
  override protected def sample = false
  override protected def sqrtResult = false
  override def withNewMutableAggBufferOffset(o: Int): HiveVarPop =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HiveVarPop =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HiveVarPop = copy(child = c.head)
  override def prettyName: String = "hive_var_pop"
}

case class HiveVarSamp(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HiveVarianceBase {
  override protected def sample = true
  override protected def sqrtResult = false
  override def withNewMutableAggBufferOffset(o: Int): HiveVarSamp =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HiveVarSamp =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HiveVarSamp = copy(child = c.head)
  override def prettyName: String = "hive_var_samp"
}

case class HiveStddevPop(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HiveVarianceBase {
  override protected def sample = false
  override protected def sqrtResult = true
  override def withNewMutableAggBufferOffset(o: Int): HiveStddevPop =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HiveStddevPop =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HiveStddevPop = copy(child = c.head)
  override def prettyName: String = "hive_stddev_pop"
}

case class HiveStddevSamp(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HiveVarianceBase {
  override protected def sample = true
  override protected def sqrtResult = true
  override def withNewMutableAggBufferOffset(o: Int): HiveStddevSamp =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HiveStddevSamp =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HiveStddevSamp = copy(child = c.head)
  override def prettyName: String = "hive_stddev_samp"
}
