package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.types._

/** Hive's collect_set / collect_list accept ANY element type —
  * including maps and structs containing maps — because they gather
  * standard Java objects into a HashSet/ArrayList
  * (ql/udf/generic/GenericUDAFMkCollectionEvaluator.java); Spark's
  * CollectSet rejects MapType as unhashable in the Catalyst
  * representation. This SQL-registered variant converts each value to
  * its external Scala form (structural equality holds for maps there)
  * and dedups in encounter order.
  *
  * Scale note: buffers java-serialize between partial and final
  * aggregation, so this is the SQL-dialect compatibility path; the
  * engine's Column-API collect_set stays Spark-native and codegen'd
  * for large pipelines. */
abstract class HiveCollectBase
    extends TypedImperativeAggregate[java.util.ArrayList[Any]] {

  def child: Expression
  protected def dedup: Boolean

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, false)
  override def createAggregationBuffer(): java.util.ArrayList[Any] =
    new java.util.ArrayList[Any]()

  @transient private lazy val toExt =
    CatalystTypeConverters.createToScalaConverter(child.dataType)
  @transient private lazy val toCat =
    CatalystTypeConverters.createToCatalystConverter(dataType)

  override def update(buffer: java.util.ArrayList[Any],
      input: InternalRow): java.util.ArrayList[Any] = {
    val v = child.eval(input)
    if (v != null) {
      val ext = toExt(v)
      if (!dedup || !buffer.contains(ext)) buffer.add(ext)
    }
    buffer
  }

  override def merge(buffer: java.util.ArrayList[Any],
      other: java.util.ArrayList[Any]): java.util.ArrayList[Any] = {
    val it = other.iterator()
    while (it.hasNext) {
      val ext = it.next()
      if (!dedup || !buffer.contains(ext)) buffer.add(ext)
    }
    buffer
  }

  /** hadoop writable hashCodes for the element types Hive stores in
    * its HashSet (copyToStandardObject WRITABLE): DoubleWritable is
    * (int)doubleToLongBits, Text is WritableComparator.hashBytes
    * (31-polynomial over UTF-8, seeded 1), LongWritable folds halves.
    * None = unknown type, keep insertion order. */
  private def writableHash(v: Any): Option[Int] = v match {
    case d: Double => Some(java.lang.Double.doubleToLongBits(d).toInt)
    case f: Float => Some(java.lang.Float.floatToIntBits(f))
    case i: Int => Some(i)
    case s: Short => Some(s.toInt)
    case b: Byte => Some(b.toInt)
    case l: Long => Some((l ^ (l >>> 32)).toInt)
    case b: Boolean => Some(if (b) 1 else 0)
    case s: String =>
      var h = 1
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .foreach(b => h = 31 * h + b)
      Some(h)
    case _ => None
  }

  override def eval(buffer: java.util.ArrayList[Any]): Any = {
    import scala.jdk.CollectionConverters._
    val elems = buffer.asScala.toVector
    val ordered =
      if (!dedup) elems
      else {
        // Hive iterates a java.util.HashSet: order = JDK8 bucket walk
        // (spread(hash) & (cap-1)) with insertion order inside each
        // bucket — the goldens record that order for nested sets
        val hs = elems.map(writableHash)
        if (hs.exists(_.isEmpty)) elems
        else {
          var cap = 16
          while (elems.size > cap * 3 / 4) cap <<= 1
          def bucket(h: Int) = ((h ^ (h >>> 16)) & (cap - 1))
          elems.indices.sortBy(i => (bucket(hs(i).get), i)).map(elems)
        }
      }
    toCat(ordered)
  }

  override def serialize(buffer: java.util.ArrayList[Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(buffer); oos.close()
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[Any] =
    new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[java.util.ArrayList[Any]]
}

/** Hive's map_keys / map_values iterate the post-shuffle standard
  * java.util.HashMap (copyToStandardObject), so element order is the
  * JDK8 bucket walk over the KEYS' writable hashCodes — the goldens
  * record that order. Spark's MapKeys/MapValues keep storage order. */
object HiveHashOrder {
  import org.apache.spark.sql.catalyst.util.MapData

  def writableHash(v: Any): Option[Int] = v match {
    case d: Double => Some(java.lang.Double.doubleToLongBits(d).toInt)
    case f: Float => Some(java.lang.Float.floatToIntBits(f))
    case i: Int => Some(i)
    case s: Short => Some(s.toInt)
    case b: Byte => Some(b.toInt)
    case l: Long => Some((l ^ (l >>> 32)).toInt)
    case b: Boolean => Some(if (b) 1 else 0)
    case u: org.apache.spark.unsafe.types.UTF8String =>
      var h = 1
      u.getBytes.foreach(b => h = 31 * h + b)
      Some(h)
    case _ => None
  }

  /** Index order of `m`'s entries under the JDK HashMap walk; None
    * when a key type has no writable-hash model (keep storage order). */
  def mapOrder(m: MapData, keyType: DataType): Option[IndexedSeq[Int]] = {
    val keys = m.keyArray().toObjectArray(keyType)
    val hs = keys.map(writableHash)
    if (hs.exists(_.isEmpty)) None
    else {
      var cap = 16
      while (m.numElements() > cap * 3 / 4) cap <<= 1
      def bucket(h: Int) = (h ^ (h >>> 16)) & (cap - 1)
      Some(keys.indices.sortBy(i => (bucket(hs(i).get), i)))
    }
  }
}

abstract class HiveMapExtract
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}

  protected def keysNotValues: Boolean
  private lazy val mt = child.dataType.asInstanceOf[MapType]
  override def dataType: DataType =
    if (keysNotValues) ArrayType(mt.keyType, containsNull = false)
    else ArrayType(mt.valueType, mt.valueContainsNull)

  // GenericUDFMapKeys/MapValues return an EMPTY list for a null map
  // (retArray.clear() then no addAll), never null
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => new GenericArrayData(Array.empty[Any])
      case v => nullSafeEval(v)
    }

  override def nullSafeEval(v: Any): Any = {
    val m = v.asInstanceOf[MapData]
    val arr: ArrayData = if (keysNotValues) m.keyArray() else m.valueArray()
    HiveHashOrder.mapOrder(m, mt.keyType) match {
      case Some(idx) =>
        val et = if (keysNotValues) mt.keyType else mt.valueType
        val objs = arr.toObjectArray(et)
        new GenericArrayData(idx.map(objs))
      case None => arr
    }
  }
}

case class HiveMapKeys(child: Expression) extends HiveMapExtract {
  override protected def keysNotValues = true
  override def prettyName: String = "map_keys"
  override protected def withNewChildInternal(c: Expression): HiveMapKeys =
    copy(child = c)
}

case class HiveMapValues(child: Expression) extends HiveMapExtract {
  override protected def keysNotValues = false
  override def prettyName: String = "map_values"
  override protected def withNewChildInternal(c: Expression): HiveMapValues =
    copy(child = c)
}

case class HiveCollectSet(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HiveCollectBase {
  override protected def dedup: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): HiveCollectSet =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HiveCollectSet =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HiveCollectSet = copy(child = c.head)
  override def prettyName: String = "collect_set"
}

case class HiveCollectList(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HiveCollectBase {
  override protected def dedup: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): HiveCollectList =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HiveCollectList =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HiveCollectList = copy(child = c.head)
  override def prettyName: String = "collect_list"
}
