package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hive's `compute_stats(col, numBitVectors)` aggregate
  * (ref: ql/udf/generic/GenericUDAFComputeStats.java), the collector
  * behind ANALYZE ... COMPUTE STATISTICS FOR COLUMNS. Emits the
  * column-type-specific stats struct rendered the way Hive prints it:
  *
  *   {"columntype":"Long","min":4,"max":344,"countnulls":1,
  *    "numdistinctvalues":11,"ndvbitvector":"{0, 1, 2}..."}
  *
  * The distinct-value estimate is Flajolet-Martin over `numBitVectors`
  * pairwise-independent hashes in GF(2^31-1), bit-compatible with the
  * reference (ql/udf/generic/NumDistinctValueEstimator.java:80-120:
  * a/b drawn from java.util.Random(99397)/Random(9876413) skipping
  * even values, negatives shifted by 2^30) so the serialized
  * `ndvbitvector` strings and estimates match the golden outputs
  * exactly. Hash inputs per type follow the reference: raw long for
  * integral types, java.lang.Double#hashCode for float/double,
  * String#hashCode for strings, epoch days for dates, and the
  * normalized (trailing-zero-trimmed) BigDecimal hashCode for
  * decimals (storage-api HiveDecimal#hashCode).
  *
  * Distributed shape: classic partial-aggregate — per-partition
  * buffers carry counts + k 32-bit sketch words and merge by OR, so
  * the shuffle moves O(k) bytes per group regardless of input size.
  */
case class ComputeStats(
    child: Expression,
    numVectorsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ComputeStats.Buffer]
  with BinaryLike[Expression] {

  import ComputeStats._

  override def left: Expression = child
  override def right: Expression = numVectorsExpr
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ComputeStats =
    copy(child = newLeft, numVectorsExpr = newRight)

  override def withNewMutableAggBufferOffset(o: Int): ComputeStats =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ComputeStats =
    copy(inputAggBufferOffset = o)

  override def prettyName: String = "compute_stats"
  override def nullable: Boolean = false
  override def dataType: DataType = StringType

  /** numBitVectors must be a constant in [0, 1024] — Hive rejects
    * anything above MAX_BIT_VECTORS
    * (GenericUDAFComputeStats.java:905-908), and a non-foldable
    * argument would otherwise fail obscurely at eval time. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (!numVectorsExpr.foldable)
      TypeCheckFailure(
        "compute_stats: numBitVectors must be a constant")
    else numVectorsExpr.eval(InternalRow.empty) match {
      case null => TypeCheckFailure(
        "compute_stats: numBitVectors must not be null")
      case n: Number if n.intValue() < 0 || n.intValue() > 1024 =>
        TypeCheckFailure("compute_stats: numBitVectors must be " +
          s"between 0 and 1024, got ${n.intValue()}")
      case _: Number => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"compute_stats: numBitVectors must be integral, got $other")
    }
  }

  private lazy val numVectors: Int =
    numVectorsExpr.eval(InternalRow.empty) match {
      case null => 0
      case n: Number => n.intValue()
      case other => other.toString.toInt
    }

  /** Whether this column type carries an NDV sketch (booleans and
    * binaries don't — GenericUDAFComputeStats boolean/binary agg
    * buffers have no estimator). */
  private lazy val hasNdv: Boolean = child.dataType match {
    case BooleanType | BinaryType => false
    case _ => true
  }

  /** Hive dispatch folds CHAR/VARCHAR into the String evaluator
    * (GenericUDAFComputeStats.getEvaluator:82-85). */
  private def statsType(dt: DataType): DataType = dt match {
    case _: CharType | _: VarcharType => StringType
    case other => other
  }

  override def createAggregationBuffer(): Buffer = new Buffer

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    // Hive initializes the estimator on the FIRST row, null or not
    // (iterate() resolves numVectors before the null check) — an
    // all-null column serializes k empty vectors, an empty one ""
    if (hasNdv && buf.vectors == null && numVectors > 0)
      buf.vectors = new Array[Int](numVectors)
    val v = child.eval(input)
    if (v == null) { buf.countNulls += 1; return buf }
    statsType(child.dataType) match {
      case BooleanType =>
        if (v.asInstanceOf[Boolean]) buf.trues += 1 else buf.falses += 1
      case ByteType | ShortType | IntegerType | LongType |
          TimestampType =>
        val l = v match {
          case b: Byte => b.toLong
          case s: Short => s.toLong
          case i: Int => i.toLong
          case l0: Long =>
            // timestamps hash/compare at second granularity, FLOORED —
            // TimestampUtils.millisToSeconds does (millis-999)/1000 for
            // negatives (storage-api TimestampUtils.java:174-180), so a
            // pre-1970 fractional second rounds toward -inf, not zero
            if (child.dataType == TimestampType)
              Math.floorDiv(l0, 1000000L) else l0
        }
        if (!buf.has || l < buf.minL) buf.minL = l
        if (!buf.has || l > buf.maxL) buf.maxL = l
        buf.has = true
        addToEstimator(buf.vectors, numVectors, l)
      case FloatType | DoubleType =>
        val d = v match {
          case f: Float => f.toDouble
          case d0: Double => d0
        }
        if (!buf.has || d < buf.minD) buf.minD = d
        if (!buf.has || d > buf.maxD) buf.maxD = d
        buf.has = true
        addToEstimator(buf.vectors, numVectors,
          java.lang.Double.hashCode(d).toLong)
      case StringType =>
        // char(n) measures and hashes the pad-STRIPPED value — the
        // string evaluator reads HiveChar through getStrippedValue
        // (char_udf1 golden: max/avg length of a char(20) column count
        // the content, not the padding)
        val s = child.dataType match {
          case CharType(_) =>
            v.asInstanceOf[UTF8String].toString
              .replaceAll("\\s+$", "")
          case _ => v.asInstanceOf[UTF8String].toString
        }
        val len = s.length.toLong
        if (len > buf.maxLength) buf.maxLength = len
        buf.sumLength += len
        buf.count += 1
        addToEstimator(buf.vectors, numVectors, s.hashCode.toLong)
      case BinaryType =>
        val len = v.asInstanceOf[Array[Byte]].length.toLong
        if (len > buf.maxLength) buf.maxLength = len
        buf.sumLength += len
        buf.count += 1
      case DateType =>
        val days = v.asInstanceOf[Int].toLong
        if (!buf.has || days < buf.minL) buf.minL = days
        if (!buf.has || days > buf.maxL) buf.maxL = days
        buf.has = true
        addToEstimator(buf.vectors, numVectors, days)
      case _: DecimalType =>
        val bd = normalizeDec(v.asInstanceOf[org.apache.spark.sql.types
          .Decimal].toJavaBigDecimal)
        if (buf.minDec == null || bd.compareTo(buf.minDec) < 0)
          buf.minDec = bd
        if (buf.maxDec == null || bd.compareTo(buf.maxDec) > 0)
          buf.maxDec = bd
        addToEstimator(buf.vectors, numVectors, bd.hashCode.toLong)
      case other =>
        throw new IllegalArgumentException(
          s"compute_stats: unsupported column type $other")
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    buf.countNulls += other.countNulls
    buf.count += other.count
    buf.sumLength += other.sumLength
    if (other.maxLength > buf.maxLength) buf.maxLength = other.maxLength
    buf.trues += other.trues
    buf.falses += other.falses
    if (other.has) {
      if (!buf.has || other.minL < buf.minL) buf.minL = other.minL
      if (!buf.has || other.maxL > buf.maxL) buf.maxL = other.maxL
      if (!buf.has || other.minD < buf.minD) buf.minD = other.minD
      if (!buf.has || other.maxD > buf.maxD) buf.maxD = other.maxD
      buf.has = true
    }
    if (other.minDec != null && (buf.minDec == null ||
        other.minDec.compareTo(buf.minDec) < 0)) buf.minDec = other.minDec
    if (other.maxDec != null && (buf.maxDec == null ||
        other.maxDec.compareTo(buf.maxDec) > 0)) buf.maxDec = other.maxDec
    if (other.vectors != null) {
      if (buf.vectors == null) buf.vectors = other.vectors.clone()
      else {
        var i = 0
        while (i < buf.vectors.length) {
          buf.vectors(i) |= other.vectors(i); i += 1
        }
      }
    }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val sb = new StringBuilder("{\"columntype\":\"")
    def ndvTail(): Unit = {
      val dv =
        if (buf.vectors == null) 0L else estimate(buf.vectors)
      val bv =
        if (buf.vectors == null) "" else serializeVectors(buf.vectors)
      sb.append(",\"numdistinctvalues\":").append(dv)
        .append(",\"ndvbitvector\":\"").append(bv).append("\"}")
    }
    statsType(child.dataType) match {
      case BooleanType =>
        sb.append("Boolean\",\"counttrues\":").append(buf.trues)
          .append(",\"countfalses\":").append(buf.falses)
          .append(",\"countnulls\":").append(buf.countNulls).append("}")
      case ByteType | ShortType | IntegerType | LongType |
          TimestampType =>
        sb.append("Long\",\"min\":")
          .append(if (buf.has) buf.minL.toString else "null")
          .append(",\"max\":")
          .append(if (buf.has) buf.maxL.toString else "null")
          .append(",\"countnulls\":").append(buf.countNulls)
        ndvTail()
      case FloatType | DoubleType =>
        sb.append("Double\",\"min\":")
          .append(if (buf.has) buf.minD.toString else "null")
          .append(",\"max\":")
          .append(if (buf.has) buf.maxD.toString else "null")
          .append(",\"countnulls\":").append(buf.countNulls)
        ndvTail()
      case StringType | BinaryType =>
        val total = buf.count + buf.countNulls
        val avg =
          if (total == 0) 0.0 else buf.sumLength / (1.0 * total)
        sb.append(if (statsType(child.dataType) == StringType) "String"
          else "Binary")
          .append("\",\"maxlength\":").append(buf.maxLength)
          .append(",\"avglength\":").append(avg)
          .append(",\"countnulls\":").append(buf.countNulls)
        if (statsType(child.dataType) == StringType) ndvTail()
        else sb.append("}")
      case DateType =>
        sb.append("Date\",\"min\":")
          .append(if (buf.has)
            "\"" + java.time.LocalDate.ofEpochDay(buf.minL) + "\""
          else "null")
          .append(",\"max\":")
          .append(if (buf.has)
            "\"" + java.time.LocalDate.ofEpochDay(buf.maxL) + "\""
          else "null")
          .append(",\"countnulls\":").append(buf.countNulls)
        ndvTail()
      case _: DecimalType =>
        sb.append("Decimal\",\"min\":")
          .append(if (buf.minDec != null) buf.minDec.toPlainString
          else "null")
          .append(",\"max\":")
          .append(if (buf.maxDec != null) buf.maxDec.toPlainString
          else "null")
          .append(",\"countnulls\":").append(buf.countNulls)
        ndvTail()
      case other =>
        throw new IllegalArgumentException(
          s"compute_stats: unsupported column type $other")
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(buf); oos.close()
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): Buffer =
    new ObjectInputStream(new ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[Buffer]
}

object ComputeStats {

  /** One partial-aggregation state: counters + the FM sketch words
    * (bit i of vectors(j) = bit i of the reference's FastBitSet j). */
  final class Buffer extends Serializable {
    var countNulls = 0L
    var count = 0L // non-null count (string/binary length stats)
    var sumLength = 0L
    var maxLength = 0L
    var trues = 0L
    var falses = 0L
    var has = false // numeric/date min-max seen
    var minL = 0L
    var maxL = 0L
    var minD = 0.0
    var maxD = 0.0
    var minDec: java.math.BigDecimal = null
    var maxDec: java.math.BigDecimal = null
    var vectors: Array[Int] = null // null = estimator untouched
  }

  private val BitVectorSize = 31
  private val Phi = 0.77351
  private val Mod = (1 << BitVectorSize) - 1 // 2^31-1, prime

  /** Pairwise-independent hash multipliers, reproduced exactly:
    * drawn from java.util.Random with the reference's prime seeds,
    * rejecting even draws, shifting negatives by 2^30
    * (NumDistinctValueEstimator.java:80-112). Cached per vector
    * count. */
  private val abCache =
    scala.collection.concurrent.TrieMap.empty[Int, (Array[Int], Array[Int])]
  private def ab(k: Int): (Array[Int], Array[Int]) =
    abCache.getOrElseUpdate(k, {
      val ra = new java.util.Random(99397L)
      val rb = new java.util.Random(9876413L)
      val a = new Array[Int](k)
      val b = new Array[Int](k)
      var i = 0
      while (i < k) {
        var x = ra.nextInt()
        while (x % 2 == 0) x = ra.nextInt()
        a(i) = if (x < 0) x + (1 << (BitVectorSize - 1)) else x
        var y = rb.nextInt()
        while (y % 2 == 0) y = rb.nextInt()
        b(i) = if (y < 0) y + (1 << (BitVectorSize - 1)) else y
        i += 1
      }
      (a, b)
    })

  /** FM insert: for each vector, hash into GF(2^31-1) and set the bit
    * at the index of the least significant 1 bit of the hash. */
  private[functions] def addToEstimator(vectors: Array[Int], k: Int,
      v: Long): Unit = {
    if (vectors == null) return
    val (a, b) = ab(k)
    var i = 0
    while (i < vectors.length) {
      var temp = a(i).toLong * v + b(i)
      temp %= Mod
      var hash = temp.toInt
      if (hash < 0) hash += Mod
      var index = 0
      while (index < BitVectorSize && hash % 2 == 0) {
        index += 1
        hash = hash >> 1
      }
      vectors(i) |= (1 << index)
      i += 1
    }
  }

  /** FM estimate: average index of the lowest clear bit, corrected by
    * log2(phi) (NumDistinctValueEstimator.estimateNumDistinctValues). */
  private[functions] def estimate(vectors: Array[Int]): Long = {
    var sum = 0
    var i = 0
    while (i < vectors.length) {
      sum += java.lang.Integer.numberOfTrailingZeros(~vectors(i))
      i += 1
    }
    val avg = sum / (vectors.length * 1.0) - math.log(Phi) / math.log(2.0)
    math.pow(2.0, avg).toLong
  }

  /** The reference's serialized form: each vector's FastBitSet
    * toString ("{0, 1, 2}"), concatenated. */
  private[functions] def serializeVectors(vectors: Array[Int]): String = {
    val sb = new StringBuilder
    vectors.foreach { bits =>
      sb.append('{')
      var first = true
      var i = 0
      while (i < 32) {
        if ((bits & (1 << i)) != 0) {
          if (!first) sb.append(", ")
          sb.append(i)
          first = false
        }
        i += 1
      }
      sb.append('}')
    }
    sb.toString
  }

  /** HiveDecimal normalization before hashing: trailing fraction
    * zeros trimmed, scale floored at 0 (storage-api
    * HiveDecimal#hashCode hashes the normalized BigDecimal). */
  private[functions] def normalizeDec(
      bd0: java.math.BigDecimal): java.math.BigDecimal = {
    val bd = bd0.stripTrailingZeros()
    if (bd.scale() < 0) bd.setScale(0) else bd
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "compute_stats",
      exprs => ComputeStats(exprs(0),
        if (exprs.length > 1) exprs(1) else Literal(0)),
      "built-in")
  }
}
