package graft.sources

import graft.{Engine, HiveStatements, SparkSpec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** `CREATE TABLE ... STORED BY 'handler'` through the public entry:
  * the registered handler owns schema and scan, and the metadata
  * layer records the handler's serde with null file formats (ref
  * ql/metadata/HiveStorageHandler.java; layout druid_basic1.q.out).
  */
class StorageHandlersSpec extends SparkSpec {

  test("QTest druid handler: CREATE STORED BY binds the recorded " +
      "wikipedia segment schema; DESCRIBE FORMATTED records the " +
      "handler serde over null formats") {
    val h = new HiveStatements(spark)
    h.sql("DROP TABLE IF EXISTS druid_t")
    h.sql("""CREATE EXTERNAL TABLE druid_t
      STORED BY 'org.apache.hadoop.hive.druid.QTestDruidStorageHandler'
      TBLPROPERTIES ("druid.datasource" = "wikipedia")""")
    val df = spark.table("druid_t")
    assert(df.schema.fieldNames.toSeq ===
      Seq("__time", "robot", "namespace", "anonymous", "unpatrolled",
        "page", "language", "newpage", "user", "count", "added",
        "delta", "variation", "deleted"))
    assert(df.schema("__time").dataType === TimestampType)
    assert(df.schema("count").dataType === FloatType)
    assert(df.count() === 0) // QTest datasource is empty
    val rows = h.sql("DESCRIBE FORMATTED druid_t").get.collect()
      .map(r => (r.getString(0).trim, r.getString(1).trim,
        Option(r.getString(2)).map(_.trim).getOrElse("")))
    assert(rows.exists(r => r._1 == "SerDe Library:" &&
      r._2 == "org.apache.hadoop.hive.druid.QTestDruidSerDe"),
      rows.mkString("\n"))
    assert(rows.exists(r => r._1 == "InputFormat:" && r._2 == "null"))
    assert(rows.exists(r => r._1 == "OutputFormat:" && r._2 == "null"))
    assert(rows.exists(r => r._1 == "Table Type:" &&
      r._2 == "EXTERNAL_TABLE"))
    // handler serdes re-derive columns: "from deserializer" comments
    assert(rows.exists(r => r._1 == "robot" && r._2 == "string" &&
      r._3 == "from deserializer"), rows.mkString("\n"))
    h.sql("DROP TABLE druid_t")
  }

  test("a user-registered handler serves real rows through its scan") {
    StorageHandlers.register("example.KvStorageHandler",
      new StorageHandler {
        val serdeClass = "example.KvSerDe"
        def schema(props: Map[String, String]) = StructType(Seq(
          StructField("k", IntegerType), StructField("v", StringType)))
        override def scan(spark: SparkSession,
            props: Map[String, String]): DataFrame = {
          // a connector would read its external store here; the
          // row count doubles as a props-plumbing check
          val n = props.getOrElse("kv.rows", "0").toInt
          spark.range(n).selectExpr("cast(id as int) as k",
            "concat('v', id) as v")
        }
      })
    val h = new HiveStatements(spark)
    h.sql("DROP TABLE IF EXISTS kv_t")
    h.sql("""CREATE TABLE kv_t
      STORED BY 'example.KvStorageHandler'
      TBLPROPERTIES ('kv.rows' = '3')""")
    val got = h.sql("SELECT k, v FROM kv_t ORDER BY k").get.collect()
    assert(got.map(_.getInt(0)).toSeq === Seq(0, 1, 2))
    assert(got.map(_.getString(1)).toSeq === Seq("v0", "v1", "v2"))
    h.sql("DROP TABLE kv_t")
  }

  test("JdbcStorageHandler serves a REAL backend scan end-to-end " +
      "(embedded Derby): DDL, schema from JDBC metadata, rows, " +
      "predicate, parallel ranged read") {
    // a real external store: embedded Derby with actual rows
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby")
    val url = s"jdbc:derby:$dbDir/db;create=true"
    Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE EMP (ID INT NOT NULL, NAME VARCHAR(32), " +
        "SAL DOUBLE)")
      st.execute("INSERT INTO EMP VALUES (1,'ann',10.5), (2,'bob',20.0)," +
        " (3,'cat',30.25), (4,'dee',40.0)")
    } finally conn.close()

    val h = new HiveStatements(spark)
    h.sql("DROP TABLE IF EXISTS jdbc_t")
    h.sql(s"""CREATE EXTERNAL TABLE jdbc_t
      STORED BY 'org.apache.hive.storage.jdbc.JdbcStorageHandler'
      TBLPROPERTIES ('hive.sql.jdbc.url' = '$url',
        'hive.sql.table' = 'EMP',
        'hive.sql.partitionColumn' = 'ID',
        'hive.sql.lowerBound' = '1', 'hive.sql.upperBound' = '5',
        'hive.sql.numPartitions' = '2')""")
    val df = spark.table("jdbc_t")
    // schema came from the backend's metadata, and the scan is a
    // ranged PARALLEL read (2 partitions), not one connection
    assert(df.schema.fieldNames.map(_.toLowerCase).toSeq ===
      Seq("id", "name", "sal"))
    assert(df.rdd.getNumPartitions === 2)
    val got = h.sql("SELECT id, name FROM jdbc_t WHERE sal > 15 " +
      "ORDER BY id").get.collect()
    assert(got.map(_.getInt(0)).toSeq === Seq(2, 3, 4))
    assert(got.map(_.getString(1)).toSeq === Seq("bob", "cat", "dee"))
    // handler.schema(props) agrees with the live scan's schema
    val hd = StorageHandlers
      .get("org.apache.hive.storage.jdbc.JdbcStorageHandler").get
    val probed = hd.schema(Map("hive.sql.jdbc.url" -> url,
      "hive.sql.table" -> "EMP"))
    assert(probed.fieldNames.toSeq === Seq("id", "name", "sal"))
    assert(probed("sal").dataType === org.apache.spark.sql.types
      .DoubleType)
    // metadata surface records the jdbc serde for the handler table
    val rows = h.sql("DESCRIBE FORMATTED jdbc_t").get.collect()
      .map(r => (r.getString(0).trim, r.getString(1).trim))
    assert(rows.exists(r => r._1 == "SerDe Library:" &&
      r._2 == "org.apache.hive.storage.jdbc.JdbcSerDe"),
      rows.mkString("\n"))
    h.sql("DROP TABLE jdbc_t")

    // the ranged read is REALLY parallel: numPartitions=4 produces 4
    // scan partitions and the multi-partition read returns the exact
    // row set of an unsplit read (range boundaries neither drop nor
    // duplicate boundary ids)
    h.sql(s"""CREATE EXTERNAL TABLE jdbc_t4
      STORED BY 'org.apache.hive.storage.jdbc.JdbcStorageHandler'
      TBLPROPERTIES ('hive.sql.jdbc.url' = '$url',
        'hive.sql.table' = 'EMP',
        'hive.sql.partitionColumn' = 'ID',
        'hive.sql.lowerBound' = '1', 'hive.sql.upperBound' = '5',
        'hive.sql.numPartitions' = '4')""")
    h.sql(s"""CREATE EXTERNAL TABLE jdbc_t1
      STORED BY 'org.apache.hive.storage.jdbc.JdbcStorageHandler'
      TBLPROPERTIES ('hive.sql.jdbc.url' = '$url',
        'hive.sql.table' = 'EMP')""")
    val df4 = spark.table("jdbc_t4")
    assert(df4.rdd.getNumPartitions === 4)
    assert(spark.table("jdbc_t1").rdd.getNumPartitions === 1)
    val seq4 = df4.collect().map(r => (r.getInt(0), r.getString(1),
      r.getDouble(2))).toSeq.sortBy(_._1)
    val seq1 = spark.table("jdbc_t1").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    assert(seq4 === seq1)
    assert(seq4.map(_._1) === Seq(1, 2, 3, 4))
    h.sql("DROP TABLE jdbc_t4")
    h.sql("DROP TABLE jdbc_t1")
  }

  test("an unregistered handler class fails loudly") {
    val h = new HiveStatements(spark)
    val e = intercept[IllegalArgumentException] {
      h.sql("CREATE TABLE nope_t STORED BY 'com.example.NoSuchHandler'")
    }
    assert(e.getMessage.contains("NoSuchHandler"))
  }
}
