package graft.sources

import java.math.{BigDecimal => JBigDecimal}

import org.apache.hadoop.io.{NullWritable, Text, Writable}
import org.apache.hadoop.io.compress.{CompressionCodec, DefaultCodec}
import org.apache.hadoop.mapred.{JobConf, SequenceFileInputFormat,
  SequenceFileOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode,
  SparkSession}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider,
  DataSourceRegister, RelationProvider, SchemaRelationProvider, TableScan}
import org.apache.spark.sql.types._

/** SequenceFile source/sink — the reference's `STORED AS SEQUENCEFILE`
  * text tables (ql/io/HiveSequenceFileOutputFormat.java; row encoding
  * serde2/lazy/LazySimpleSerDe.java: delimited fields inside a Text
  * value, key ignored).
  *
  * Scale design: SequenceFile is natively splittable on its sync
  * markers — `SequenceFileInputFormat` hands out block splits, so one
  * large container file fans out across the cluster exactly like the
  * reference's input format. Reads are tolerant of any Writable key
  * class (Hive writes BytesWritable, ours NullWritable, others vary);
  * only the Text value is decoded.
  *
  * Value parsing follows LazySimpleSerDe: fields split on the delimiter
  * (Hive default ^A), `\N` is NULL, a field that fails to parse as its
  * declared primitive type reads as NULL (Hive's lazy-parse contract),
  * missing trailing fields are NULL.
  */
object SequenceFileIO {

  val DefaultDelim = "\u0001" // Hive's ^A field delimiter
  val NullString = "\\N"      // serdeConstants default null sequence

  private def parsePrim(raw: String, dt: DataType): Any = dt match {
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
        val v = new JBigDecimal(raw).setScale(d.scale,
          java.math.RoundingMode.HALF_UP)
        if (v.precision > d.precision) null else v
      } catch { case _: NumberFormatException => null }
    case DateType =>
      try java.sql.Date.valueOf(raw)
      catch { case _: IllegalArgumentException => null }
    case TimestampType =>
      try java.sql.Timestamp.valueOf(raw)
      catch { case _: IllegalArgumentException => null }
    case BinaryType => raw.getBytes("UTF-8")
    case other => sys.error(s"sequencefile: unsupported column type $other")
  }

  def read(spark: SparkSession, path: String, schema: StructType,
      delim: String = DefaultDelim): DataFrame = {
    val fields = schema.fields.toSeq.map(f => f.dataType) // serializable
    val d = delim
    // minPartitions drives FileInputFormat's goal split size, so even a
    // single container file fans out across the cluster (sync-marker
    // record boundaries keep splits exact)
    val rows = spark.sparkContext
      .hadoopFile(path, classOf[SequenceFileInputFormat[Writable, Text]],
        classOf[Writable], classOf[Text],
        spark.sparkContext.defaultParallelism)
      .map(_._2.toString) // materialize before Hadoop reuses the buffer
      .map { line =>
        val a = line.split(java.util.regex.Pattern.quote(d), -1)
        Row.fromSeq(fields.zipWithIndex.map { case (dt, i) =>
          val raw = if (i < a.length) a(i) else null
          if (raw == null || raw == NullString) null else parsePrim(raw, dt)
        })
      }
    spark.createDataFrame(rows, schema)
  }

  /** Columns c0..cN as strings, split per the first value's field count. */
  def inferSchema(spark: SparkSession, path: String,
      delim: String = DefaultDelim): StructType = {
    val first = spark.sparkContext
      .hadoopFile(path, classOf[SequenceFileInputFormat[Writable, Text]],
        classOf[Writable], classOf[Text])
      .map(_._2.toString).take(1)
    require(first.nonEmpty, s"cannot infer schema of empty sequencefile $path")
    val n = first.head.split(java.util.regex.Pattern.quote(delim), -1).length
    StructType((0 until n).map(i => StructField(s"c$i", StringType)))
  }

  def write(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
      delim: String = DefaultDelim, compression: String = "none"): Unit = {
    val spark = df.sparkSession
    val out = new Path(path)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(out)) mode match {
      case SaveMode.Overwrite => fs.delete(out, true)
      case SaveMode.ErrorIfExists => sys.error(s"path exists: $path")
      case SaveMode.Ignore => return
      case SaveMode.Append => sys.error(
        "sequencefile sink: append unsupported (fixed part file names)")
    }
    val d = delim
    val conf = new JobConf(spark.sparkContext.hadoopConfiguration)
    compression match {
      case "none" =>
      case "record" | "block" =>
        conf.setBoolean("mapreduce.output.fileoutputformat.compress", true)
        conf.set("mapreduce.output.fileoutputformat.compress.type",
          compression.toUpperCase)
        conf.setClass("mapreduce.output.fileoutputformat.compress.codec",
          classOf[DefaultCodec], classOf[CompressionCodec])
      case other => sys.error(s"sequencefile compression: $other " +
        "(none|record|block)")
    }
    df.rdd.map { r =>
      val line = (0 until r.length).map(i =>
        if (r.isNullAt(i)) NullString else r.get(i).toString).mkString(d)
      (NullWritable.get(), new Text(line))
    }.saveAsHadoopFile(path, classOf[NullWritable], classOf[Text],
      classOf[SequenceFileOutputFormat[NullWritable, Text]], conf)
  }
}

/** `spark.read.format("sequencefile")` / `df.write.format("sequencefile")`
  * registration. Options: `delimiter` (default ^A), `compression`
  * (none|record|block, sink only). */
class SequenceFileDataSource extends RelationProvider
    with SchemaRelationProvider with CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "sequencefile"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      sys.error("sequencefile source requires a path"))

  private def delim(parameters: Map[String, String]): String =
    parameters.getOrElse("delimiter", SequenceFileIO.DefaultDelim)

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    SequenceFileRelation(path(parameters), None, delim(parameters))(ctx)

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String], schema: StructType): BaseRelation =
    SequenceFileRelation(path(parameters), Some(schema),
      delim(parameters))(ctx)

  override def createRelation(ctx: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val p = path(parameters)
    SequenceFileIO.write(data, p, mode, delim(parameters),
      parameters.getOrElse("compression", "none"))
    SequenceFileRelation(p, Some(data.schema), delim(parameters))(ctx)
  }
}

case class SequenceFileRelation(path: String,
    userSchema: Option[StructType], delim: String)(
    @transient val ctx: SQLContext)
    extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = ctx

  override val schema: StructType = userSchema.getOrElse(
    SequenceFileIO.inferSchema(ctx.sparkSession, path, delim))

  override def buildScan(): org.apache.spark.rdd.RDD[Row] =
    SequenceFileIO.read(ctx.sparkSession, path, schema, delim).rdd
}
