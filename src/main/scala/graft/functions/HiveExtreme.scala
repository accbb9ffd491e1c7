package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.types._

/** Hive's MIN/MAX over complex values order nested NULL fields the
  * opposite way Spark does: GenericUDAFMin compares candidates with
  * ObjectInspectorUtils.compare(..., NullValueOption.MAXVALUE) — a
  * null struct field sorts LAST, so min(named_struct('f', 1), ...,
  * named_struct('f', null)) is {"f":1} — while GenericUDAFMax uses
  * the default MINVALUE, so nulls sort FIRST and never win a max
  * (ql/udf/generic/GenericUDAFMin.java:121-127,
  * GenericUDAFMax.java:123). Spark's Min/Max interpreted ordering
  * puts nulls first for both. These SQL-registered variants
  * (`hive_min` / `hive_max`) re-implement the Hive comparator over
  * external values; rows whose whole argument is NULL are skipped,
  * as in both engines.
  *
  * Scale note: buffers hold ONE value and java-serialize between
  * partial and final aggregation — the dialect-compatibility path.
  * Flat-typed min/max stay on Spark's codegen'd aggregates. */
object HiveExtreme {
  /** ObjectInspectorUtils.compare re-derived over Catalyst EXTERNAL
    * values: structs field-wise, lists element-wise then by length,
    * primitives by natural order; `nullMax` selects the
    * NullValueOption (MAXVALUE for min, MINVALUE for max). */
  def cmp(a: Any, b: Any, dt: DataType, nullMax: Boolean): Int = {
    if (a == null && b == null) return 0
    if (a == null) return if (nullMax) 1 else -1
    if (b == null) return if (nullMax) -1 else 1
    dt match {
      case st: StructType =>
        val ra = a.asInstanceOf[org.apache.spark.sql.Row]
        val rb = b.asInstanceOf[org.apache.spark.sql.Row]
        var i = 0
        while (i < st.fields.length) {
          val c = cmp(ra.get(i), rb.get(i), st.fields(i).dataType, nullMax)
          if (c != 0) return c
          i += 1
        }
        0
      case ArrayType(et, _) =>
        val sa = a.asInstanceOf[scala.collection.Seq[Any]]
        val sb = b.asInstanceOf[scala.collection.Seq[Any]]
        val n = math.min(sa.length, sb.length)
        var i = 0
        while (i < n) {
          val c = cmp(sa(i), sb(i), et, nullMax)
          if (c != 0) return c
          i += 1
        }
        java.lang.Integer.compare(sa.length, sb.length)
      case _: MapType =>
        // maps have no order in Hive either (compare needs an
        // explicit MapEqualComparer); size is the only total facet
        java.lang.Integer.compare(a.asInstanceOf[Map[_, _]].size,
          b.asInstanceOf[Map[_, _]].size)
      case _ => (a, b) match {
        case (x: String, y: String) =>
          // Hive orders Text by unsigned UTF-8 bytes = code-point
          // order (ObjectInspectorUtils.compare → Text.compareTo);
          // String.compareTo is UTF-16 code-unit order, which
          // disagrees for supplementary-plane vs U+E000..U+FFFF.
          val xb = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val yb = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val n = math.min(xb.length, yb.length)
          var i = 0
          while (i < n) {
            val c = java.lang.Integer.compare(xb(i) & 0xff, yb(i) & 0xff)
            if (c != 0) return c
            i += 1
          }
          java.lang.Integer.compare(xb.length, yb.length)
        case (x: java.lang.Comparable[_], y) =>
          x.asInstanceOf[java.lang.Comparable[Any]].compareTo(y)
        case (x: Array[Byte], y: Array[Byte]) =>
          // unsigned, as WritableComparator.compareBytes does
          val n = math.min(x.length, y.length)
          var i = 0
          while (i < n) {
            val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
            if (c != 0) return c
            i += 1
          }
          java.lang.Integer.compare(x.length, y.length)
        case _ => 0
      }
    }
  }
}

abstract class HiveExtremeBase
    extends TypedImperativeAggregate[java.util.ArrayList[Any]] {

  def child: Expression
  /** true = hive_min (nulls sort LAST, keep the smaller value). */
  protected def isMin: Boolean

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType
  // buffer: empty = no value yet; one element = current extreme
  override def createAggregationBuffer(): java.util.ArrayList[Any] =
    new java.util.ArrayList[Any](1)

  @transient private lazy val toExt =
    CatalystTypeConverters.createToScalaConverter(child.dataType)
  @transient private lazy val toCat =
    CatalystTypeConverters.createToCatalystConverter(child.dataType)

  private def consider(buffer: java.util.ArrayList[Any], ext: Any): Unit =
    if (buffer.isEmpty) buffer.add(ext)
    else {
      val c = HiveExtreme.cmp(ext, buffer.get(0), child.dataType,
        nullMax = isMin)
      if (if (isMin) c < 0 else c > 0) buffer.set(0, ext)
    }

  override def update(buffer: java.util.ArrayList[Any],
      input: InternalRow): java.util.ArrayList[Any] = {
    val v = child.eval(input)
    if (v != null) consider(buffer, toExt(v))
    buffer
  }

  override def merge(buffer: java.util.ArrayList[Any],
      other: java.util.ArrayList[Any]): java.util.ArrayList[Any] = {
    if (!other.isEmpty) consider(buffer, other.get(0))
    buffer
  }

  override def eval(buffer: java.util.ArrayList[Any]): Any =
    if (buffer.isEmpty) null else toCat(buffer.get(0))

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

case class HiveMin(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HiveExtremeBase {
  override protected def isMin: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): HiveMin =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HiveMin =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HiveMin = copy(child = c.head)
  override def prettyName: String = "hive_min"
}

case class HiveMax(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HiveExtremeBase {
  override protected def isMin: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): HiveMax =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HiveMax =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HiveMax = copy(child = c.head)
  override def prettyName: String = "hive_max"
}
