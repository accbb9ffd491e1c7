package graft.sources

import java.io.{ByteArrayInputStream, DataInputStream, EOFException}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.compress.CompressionCodec
import org.apache.hadoop.util.ReflectionUtils
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** RCFile reader — the reference's columnar `STORED AS RCFILE` format
  * (ql/io/RCFile.java). Re-derived from the on-disk contract, not a
  * port:
  *
  *   header   = "RCF"+version | "SEQ"+0x06 + key/value class names,
  *              isCompressed bool [+ blockCompressed=false for SEQ],
  *              codec class name when compressed, metadata map
  *              (carries hive.io.rcfile.column.number), 16-byte sync
  *   record   = recordLen int (-1 = 16-byte sync marker, re-read),
  *              keyLen int, compressedKeyLen int, KeyBuffer bytes
  *              (codec-decompressed when compressed),
  *              then per column its value bytes
  *   KeyBuffer (RCFile.java:465-496) = rowCount vint, then per column:
  *              on-disk valueLen vint, uncompressedLen vint,
  *              cell-length buffer (vint count + bytes)
  *   cell lengths are run-length encoded (RCFile.java:868-922):
  *              `len` starts a group, `~n` repeats the previous
  *              length n more times
  *
  * Cells hold LazySimpleSerDe text bytes; `\N` is NULL (the same
  * lazy-parse contract as the delimited-text and SequenceFile
  * sources). Vints are Hadoop WritableUtils zig-zag-free variable
  * ints.
  *
  * Scale design: one task per container file (`binaryFiles`); RCFile
  * row groups are small (4 MB default) and the format is
  * sync-splittable, so a block-split InputFormat is the natural
  * extension if multi-GB legacy RCFiles ever matter. For this
  * engine's purpose — reading reference-era data into parquet-backed
  * tables once — per-file parallelism across the load set is the
  * scan pattern.
  */
object RcFileIO {

  private val NullBytes = Array[Byte]('\\', 'N')

  // ---- Hadoop WritableUtils vlong ---------------------------------
  private def decodeVIntSize(b: Byte): Int =
    if (b >= -112) 1 else if (b < -120) -119 - b else -111 - b
  private def isNegative(b: Byte): Boolean =
    b < -120 || (b >= -112 && b < 0)
  private def readVLong(in: DataInputStream): Long = {
    val first = in.readByte()
    val len = decodeVIntSize(first)
    if (len == 1) return first.toLong
    var v = 0L
    var i = 0
    while (i < len - 1) { v = (v << 8) | (in.readByte() & 0xff); i += 1 }
    if (isNegative(first)) ~v else v
  }
  private def readVInt(in: DataInputStream): Int = readVLong(in).toInt

  /** Text.readString — vint length + UTF-8 bytes. */
  private def readString(in: DataInputStream): String = {
    val n = readVInt(in)
    val b = new Array[Byte](n)
    in.readFully(b)
    new String(b, "UTF-8")
  }

  private def fully(in: DataInputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    in.readFully(b)
    b
  }

  /** Decode one RCFile container into per-row cell byte arrays
    * (null where the cell is the serde null sequence). */
  def rows(bytes: Array[Byte]): Iterator[Array[Array[Byte]]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val magic = fully(in, 3)
    val isSeq = magic.sameElements(Array[Byte]('S', 'E', 'Q'))
    require(isSeq || magic.sameElements(Array[Byte]('R', 'C', 'F')),
      s"not an RCFile (magic ${new String(magic)})")
    val version = in.readByte()
    if (isSeq) {
      require(version == 6, s"SEQ version $version is not an RCFile")
      val k = readString(in); val v = readString(in)
      require(k.endsWith("RCFile$KeyBuffer") &&
        v.endsWith("RCFile$ValueBuffer"), s"not an RCFile ($k/$v)")
    }
    val compressed = in.readBoolean()
    if (isSeq) require(!in.readBoolean(), "block-compressed RCFile")
    val codec: Option[CompressionCodec] =
      if (!compressed) None
      else {
        val name = readString(in)
        val conf = new Configuration(false)
        Some(ReflectionUtils.newInstance(
          Class.forName(name).asSubclass(classOf[CompressionCodec]), conf))
      }
    // SequenceFile.Metadata: int count + (Text,Text) pairs
    val metaCount = in.readInt()
    val meta = (0 until metaCount).map { _ =>
      readString(in) -> readString(in)
    }.toMap
    val columnCount = meta.getOrElse("hive.io.rcfile.column.number", "0").toInt
    require(columnCount > 0, "RCFile metadata lacks column count")
    fully(in, 16) // sync

    def decompress(data: Array[Byte], uncompressedLen: Int): Array[Byte] =
      codec match {
        case None => data
        case Some(c) =>
          val s = c.createInputStream(new ByteArrayInputStream(data))
          val out = new Array[Byte](uncompressedLen)
          var off = 0
          while (off < uncompressedLen) {
            val n = s.read(out, off, uncompressedLen - off)
            require(n > 0, "truncated compressed column")
            off += n
          }
          s.close()
          out
      }

    new Iterator[Array[Array[Byte]]] {
      private var group: Iterator[Array[Array[Byte]]] = Iterator.empty
      private var done = false

      private def readRecordLength(): Int =
        try {
          var len = in.readInt()
          if (len == -1) { // sync escape
            fully(in, 16)
            len = in.readInt()
          }
          len
        } catch { case _: EOFException => -1 }

      private def loadGroup(): Unit = {
        val recordLen = readRecordLength()
        if (recordLen == -1) { done = true; return }
        val keyLen = in.readInt()
        val compressedKeyLen = in.readInt()
        val keyIn =
          if (compressed)
            new DataInputStream(new ByteArrayInputStream(
              decompress(fully(in, compressedKeyLen), keyLen)))
          else in
        val rowCount = readVInt(keyIn)
        val colValueLen = new Array[Int](columnCount)
        val colPlainLen = new Array[Int](columnCount)
        val cellLens = Array.ofDim[Array[Int]](columnCount)
        for (c <- 0 until columnCount) {
          colValueLen(c) = readVInt(keyIn)
          colPlainLen(c) = readVInt(keyIn)
          val bufLen = readVInt(keyIn)
          val lenIn = new DataInputStream(
            new ByteArrayInputStream(fully(keyIn, bufLen)))
          // run-length decode: v >= 0 starts a group of that length,
          // ~n repeats the previous length n more times
          val lens = new Array[Int](rowCount)
          var i = 0
          var prev = -1
          while (i < rowCount) {
            val v = readVLong(lenIn)
            if (v < 0) {
              val run = (~v).toInt
              var j = 0
              while (j < run && i < rowCount) {
                lens(i) = prev; i += 1; j += 1
              }
            } else {
              prev = v.toInt
              lens(i) = prev
              i += 1
            }
          }
          cellLens(c) = lens
        }
        val cols = (0 until columnCount).map { c =>
          decompress(fully(in, colValueLen(c)), colPlainLen(c))
        }
        group = new Iterator[Array[Array[Byte]]] {
          private var r = 0
          private val offsets = new Array[Int](columnCount)
          override def hasNext: Boolean = r < rowCount
          override def next(): Array[Array[Byte]] = {
            val row = new Array[Array[Byte]](columnCount)
            var c = 0
            while (c < columnCount) {
              val n = cellLens(c)(r)
              val cell = java.util.Arrays.copyOfRange(
                cols(c), offsets(c), offsets(c) + n)
              offsets(c) += n
              row(c) =
                if (java.util.Arrays.equals(cell, NullBytes)) null
                else cell
              c += 1
            }
            r += 1
            row
          }
        }
      }

      override def hasNext: Boolean = {
        while (!group.hasNext && !done) loadGroup()
        group.hasNext
      }
      override def next(): Array[Array[Byte]] = {
        if (!hasNext) throw new NoSuchElementException
        group.next()
      }
    }
  }

  /** Typed distributed read: one task per container file, cells
    * lazy-parsed per the declared schema (unparseable → NULL, the
    * LazySimpleSerDe contract). */
  /** `zone` anchors text timestamp cells (Hive wall-clock strings) to
    * an explicit instant; defaults to the session timezone so results
    * don't depend on the JVM default zone (which sbt pins to
    * America/Los_Angeles for golden replay). */
  def read(spark: SparkSession, path: String, schema: StructType,
      zone: Option[String] = None): DataFrame = {
    val zoneId = zone.getOrElse(
      spark.conf.get("spark.sql.session.timeZone"))
    val types = schema.fields.map(_.dataType).toSeq
    val rdd = spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) => rows(pds.toArray()) }
      .map { cells =>
        val z = java.time.ZoneId.of(zoneId)
        Row.fromSeq(types.zipWithIndex.map { case (dt, i) =>
          val cell = if (i < cells.length) cells(i) else null
          if (cell == null) null
          else parseCell(new String(cell, "UTF-8"), dt, z)
        })
      }
    spark.createDataFrame(rdd, schema)
  }

  private def parseCell(raw: String, dt: DataType,
      zone: java.time.ZoneId): Any = dt match {
    case StringType => raw
    case IntegerType => raw.toIntOption.map(Int.box).orNull
    case LongType => raw.toLongOption.map(Long.box).orNull
    case ShortType => raw.toShortOption.map(Short.box).orNull
    case ByteType => raw.toByteOption.map(Byte.box).orNull
    case DoubleType => raw.toDoubleOption.map(Double.box).orNull
    case FloatType => raw.toFloatOption.map(Float.box).orNull
    case BooleanType => raw.toBooleanOption.map(Boolean.box).orNull
    case d: DecimalType =>
      try {
        val v = new java.math.BigDecimal(raw).setScale(d.scale,
          java.math.RoundingMode.HALF_UP)
        if (v.precision > d.precision) null else v
      } catch { case _: NumberFormatException => null }
    case DateType =>
      try java.sql.Date.valueOf(raw)
      catch { case _: IllegalArgumentException => null }
    case TimestampType =>
      // wall-clock string -> instant via the EXPLICIT zone, not the
      // JVM default (Timestamp.valueOf would bind to user.timezone)
      try {
        val ldt = java.time.LocalDateTime.parse(
          raw.trim.replaceFirst(" ", "T"))
        java.sql.Timestamp.from(ldt.atZone(zone).toInstant)
      } catch { case _: java.time.format.DateTimeParseException => null }
    case BinaryType => raw.getBytes("UTF-8")
    case other => sys.error(s"rcfile: unsupported column type $other")
  }
}
