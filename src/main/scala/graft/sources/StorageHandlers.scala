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
}
