package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** `CREATE TABLE ... STORED BY 'handler.class'` surface — the
  * dialect's equivalent of Hive's HiveStorageHandler extension point
  * (ref ql/src/java/org/apache/hadoop/hive/ql/metadata/
  * HiveStorageHandler.java): a handler owns the table's schema and
  * scan and names the serde class the metastore records for it; the
  * storage descriptor carries no file formats (`null` input/output —
  * the layout druid_basic1.q.out records).
  *
  * Real connector backends (HBase regionservers, a Druid broker) are
  * external services and out of scope here; the registry ships the
  * reference's QTest druid handlers — whose serde answers the segment
  * metadata request from a recorded response (QTestDruidSerDe.java:
  * 43-71), i.e. a fixed schema over an empty datasource — so the DDL,
  * DESCRIBE and query surface over handler tables works end-to-end,
  * and a user connector plugs in through [[StorageHandlers.register]].
  */
trait StorageHandler {

  /** The serde class recorded in the storage descriptor. */
  def serdeClass: String

  /** Table schema, resolved from TBLPROPERTIES (the druid handler
    * reads `druid.datasource`; an HBase handler would read
    * `hbase.columns.mapping`). */
  def schema(props: Map[String, String]): StructType

  /** The table's scan. Defaults to an empty relation over
    * [[schema]] — a connector overrides this with its real read. */
  def scan(spark: SparkSession, props: Map[String, String]): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](), schema(props))
}

object StorageHandlers {

  private val registry =
    scala.collection.concurrent.TrieMap[String, StorageHandler]()

  def register(handlerClass: String, h: StorageHandler): Unit =
    registry(handlerClass.toLowerCase) = h

  def get(handlerClass: String): Option[StorageHandler] =
    registry.get(handlerClass.toLowerCase)

  /** The wikipedia segment schema QTestDruidSerDe's recorded
    * segmentMetadata response resolves to (QTestDruidSerDe.java:43-71;
    * DruidSerDeUtils type mapping: the __time LONG renders timestamp,
    * STRING dimensions string, FLOAT metrics float). */
  private val wikipedia = StructType(
    StructField("__time", TimestampType) +:
      (Seq("robot", "namespace", "anonymous", "unpatrolled", "page",
        "language", "newpage", "user")
        .map(StructField(_, StringType)) ++
        Seq("count", "added", "delta", "variation", "deleted")
          .map(StructField(_, FloatType))))

  private final class QTestDruid(val serdeClass: String)
      extends StorageHandler {
    def schema(props: Map[String, String]): StructType = wikipedia
  }

  register("org.apache.hadoop.hive.druid.QTestDruidStorageHandler",
    new QTestDruid("org.apache.hadoop.hive.druid.QTestDruidSerDe"))
  // the second QTest handler reuses the same datasource with a serde
  // variant (QTestDruidStorageHandler2.java) — same dialect surface
  register("org.apache.hadoop.hive.druid.QTestDruidStorageHandler2",
    new QTestDruid("org.apache.hadoop.hive.druid.QTestDruidSerDe2"))

  register("org.apache.hive.storage.jdbc.JdbcStorageHandler",
    new JdbcStorageHandler)
}

/** Hive's JDBC storage handler re-expressed Spark-first (ref
  * jdbc-handler/src/java/org/apache/hive/storage/jdbc/
  * JdbcStorageHandler.java; property names from its Constants):
  * TBLPROPERTIES carry the connection (`hive.sql.jdbc.url`,
  * `hive.sql.jdbc.driver`, `hive.sql.table` or `hive.sql.query`) and
  * the scan delegates to Spark's DISTRIBUTED jdbc source — predicate
  * pushdown and ranged parallel reads (`hive.sql.partitionColumn` /
  * `lowerBound` / `upperBound` / `numPartitions`) come with it, so a
  * handler table reads like any JDBC-backed dimension at scale
  * instead of a single-connection serde loop. Proves the
  * [[StorageHandler]] extension point end-to-end with a REAL backend
  * (embedded Derby in the spec). */
final class JdbcStorageHandler extends StorageHandler {

  override def serdeClass: String =
    "org.apache.hive.storage.jdbc.JdbcSerDe"

  private def url(props: Map[String, String]): String =
    props.getOrElse("hive.sql.jdbc.url", sys.error(
      "jdbc handler requires TBLPROPERTIES ('hive.sql.jdbc.url'=...)"))

  /** The relation to read: a table name, or a pushdown query wrapped
    * as a derived table (JdbcInputFormat's query form). */
  private def dbtable(props: Map[String, String]): String =
    props.get("hive.sql.table")
      .orElse(props.get("hive.sql.query").map(q => s"($q) graft_q"))
      .getOrElse(sys.error("jdbc handler requires 'hive.sql.table' " +
        "or 'hive.sql.query' in TBLPROPERTIES"))

  /** Schema from the backend's own metadata: a zero-row probe on a
    * driver-side connection (DatabaseAccessor.getColumnNames
    * equivalent) — no Spark job, no data read. */
  override def schema(props: Map[String, String]): StructType = {
    props.get("hive.sql.jdbc.driver").foreach(Class.forName(_))
    val conn = java.sql.DriverManager.getConnection(url(props))
    try {
      val md = conn
        .prepareStatement(s"SELECT * FROM ${dbtable(props)} WHERE 1=0")
        .getMetaData
      import java.sql.Types._
      StructType((1 to md.getColumnCount).map { i =>
        val dt = md.getColumnType(i) match {
          case INTEGER => IntegerType
          case BIGINT => LongType
          case SMALLINT | TINYINT => ShortType
          case DOUBLE | FLOAT => DoubleType
          case REAL => FloatType
          case NUMERIC | DECIMAL =>
            DecimalType(md.getPrecision(i) max 1, md.getScale(i) max 0)
          case DATE => DateType
          case TIMESTAMP => TimestampType
          case BOOLEAN | BIT => BooleanType
          case BINARY | VARBINARY | LONGVARBINARY | BLOB => BinaryType
          case _ => StringType
        }
        StructField(md.getColumnName(i).toLowerCase, dt,
          md.isNullable(i) != java.sql.ResultSetMetaData.columnNoNulls)
      })
    } finally conn.close()
  }

  override def scan(spark: SparkSession,
      props: Map[String, String]): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", url(props))
      .option("dbtable", dbtable(props))
    props.get("hive.sql.jdbc.driver")
      .foreach(d => r = r.option("driver", d))
    for (k <- Seq("partitionColumn", "lowerBound", "upperBound",
        "numPartitions"); v <- props.get("hive.sql." + k))
      r = r.option(k, v)
    // under preserveCharVarcharTypeInfo (the engine's Hive
    // char/varchar semantics) Spark's JDBC schema derivation keeps
    // VarcharType, which its own row getters can't materialize —
    // the probe schema (VARCHAR → string, JdbcSerDe's mapping)
    // rides in as customSchema so the scan reads Hive types
    r = r.option("customSchema", schema(props).toDDL)
    r.load()
  }
}
