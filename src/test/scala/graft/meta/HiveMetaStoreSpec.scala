package graft.meta

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Unit surface of the shipped metadata state machine (the golden
  * corpus exercises it end-to-end through the harness; these pin the
  * store's own contracts — ref ql/metadata/formatting/
  * MetaDataFormatUtils, metastore partition-descriptor semantics). */
class HiveMetaStoreSpec extends SparkSpec {

  private def store = new HiveMetaStore(spark, () => "default")

  test("CREATE records the storage descriptor; LIKE copies it; " +
      "LIKE a view falls back to text") {
    val m = store
    m.recordStorageMeta("CREATE TABLE t1 (a INT) STORED AS RCFILE " +
      "TBLPROPERTIES ('x'='1')")
    assert(m.tableStorage("t1")._2 ===
      "org.apache.hadoop.hive.ql.io.RCFileInputFormat")
    // engine default serde is HiveConf's LazyBinaryColumnarSerDe
    assert(m.tableStorage("t1")._1 ===
      "org.apache.hadoop.hive.serde2.columnar.LazyBinaryColumnarSerDe")
    assert(m.tableKind("t1") === "MANAGED_TABLE")
    m.recordStorageMeta("CREATE TABLE t2 LIKE t1")
    assert(m.tableStorage("t2") === m.tableStorage("t1"))
    m.recordStorageMeta("CREATE VIEW v1 AS SELECT 1", view = true)
    assert(m.tableKind("v1") === "VIRTUAL_VIEW")
    assert(m.tableStorage("v1")._1 === "null") // views carry no serde
    m.recordStorageMeta("CREATE TABLE t3 LIKE v1")
    assert(m.tableStorage("t3")._2 ===
      "org.apache.hadoop.mapred.TextInputFormat")
  }

  test("bucket/sort/skew clauses parse; ALTER NOT CLUSTERED clears") {
    val m = store
    m.recordStorageMeta("CREATE TABLE b1 (k INT, v STRING) " +
      "CLUSTERED BY (k) SORTED BY (k DESC) INTO 8 BUCKETS " +
      "SKEWED BY (v) ON ('a','b') STORED AS ORC")
    assert(m.bucketMeta("b1") === (Seq("k"), Seq(("k", 0)), 8))
    assert(m.tableSkew("b1") === (Seq("v"), Seq(Seq("a"), Seq("b")), false))
    m.trackAlterStorage("ALTER TABLE b1 NOT CLUSTERED")
    assert(m.bucketMeta("b1") === (Nil, Nil, -1))
    m.trackAlterStorage("ALTER TABLE b1 NOT SKEWED")
    assert(!m.tableSkew.contains("b1"))
  }

  test("a partition snapshots its descriptor at creation; later " +
      "table-level ALTERs do not touch it (metastore semantics)") {
    val m = store
    m.recordStorageMeta("CREATE TABLE p1 (a INT) PARTITIONED BY " +
      "(ds STRING) STORED AS ORC")
    m.tablePartCols("p1") = Seq("ds")
    m.partSchemas.getOrElseUpdate("p1",
      scala.collection.mutable.Map.empty)(Seq("2008")) =
      StructType(Seq(StructField("a", IntegerType)))
    m.snapshotPartMeta("p1", Seq("2008"))
    m.trackAlterStorage("ALTER TABLE p1 SET FILEFORMAT PARQUET")
    // table moved to parquet, the existing partition stays ORC
    assert(m.tableStorage("p1")._1.contains("Parquet"))
    assert(m.partStorage(("p1", Seq("2008")))._1.contains("Orc"))
    // a partition-scoped ALTER addresses just that partition
    m.trackAlterStorage("ALTER TABLE p1 PARTITION (ds='2008') " +
      "SET SERDE 'my.Custom'")
    assert(m.partStorage(("p1", Seq("2008")))._1 === "my.Custom")
    assert(m.tableStorage("p1")._1.contains("Parquet"))
  }

  test("matchingPartKeys: bare names are wildcards") {
    val m = store
    m.tablePartCols("w1") = Seq("p1", "p2")
    val pm = m.partSchemas.getOrElseUpdate("w1",
      scala.collection.mutable.Map.empty)
    pm(Seq("a", "1")) = StructType(Nil)
    pm(Seq("b", "1")) = StructType(Nil)
    pm(Seq("a", "2")) = StructType(Nil)
    assert(m.matchingPartKeys("w1", "p1, p2='1'").toSet ===
      Set(Seq("a", "1"), Seq("b", "1")))
    assert(m.matchingPartKeys("w1", "p1='a'").toSet ===
      Set(Seq("a", "1"), Seq("a", "2")))
  }

  test("tblproperties set/unset; CHANGE COLUMN inherits its comment") {
    val m = store
    m.trackTblProps("CREATE TABLE tp (a INT) TBLPROPERTIES " +
      "('k1'='v1','k2'='v2')", create = true)
    m.trackTblProps("ALTER TABLE tp UNSET TBLPROPERTIES ('k2')",
      create = false)
    assert(m.tableProps("tp").toMap === Map("k1" -> "v1"))
    m.colComments("tp") = Map("a" -> "the a column")
    m.trackAlterComments("ALTER TABLE tp CHANGE a b BIGINT")
    assert(m.commentOf("tp", "b") === "the a column")
    m.trackAlterComments("ALTER TABLE tp CHANGE b c INT COMMENT 'now c'")
    assert(m.commentOf("tp", "c") === "now c")
  }

  test("describeFormattedCore renders the Hive column block and " +
      "whitelisted labels") {
    val m = store
    m.recordStorageMeta("CREATE TABLE d1 (a INT) STORED AS ORC")
    m.colComments("d1") = Map("a" -> "col a")
    val (cols, labels) = m.describeFormattedCore("d1", "default",
      Seq(StructField("a", IntegerType)),
      Seq(StructField("ds", StringType)), None, Nil)
    assert(cols.head === MetaRender.colHeader)
    assert(cols.exists(_ ===
      MetaRender.colLine("a", "int", "col a")), cols.mkString("\n"))
    assert(cols.exists(_.startsWith("# Partition Information")))
    assert(labels("SerDe Library:") ===
      "org.apache.hadoop.hive.ql.io.orc.OrcSerde")
    assert(labels("Table Type:") === "MANAGED_TABLE")
    assert(labels("Num Buckets:") === "-1")
  }

  test("renameTable re-keys every map; dropTable clears them") {
    val m = store
    m.recordStorageMeta("CREATE TABLE r1 (a INT) STORED AS ORC")
    m.tablePartCols("r1") = Seq("ds")
    m.tableProps.getOrElseUpdate("r1",
      scala.collection.mutable.LinkedHashMap.empty)("k") = "v"
    m.renameTable("r1", "r2")
    assert(!m.tableStorage.contains("r1") &&
      m.tableStorage("r2")._1.contains("Orc"))
    assert(m.tablePartCols("r2") === Seq("ds"))
    assert(m.tableProps("r2")("k") === "v")
    m.dropTable("r2")
    assert(!m.tableStorage.contains("r2") &&
      !m.tableProps.contains("r2"))
  }

  test("escapePathName escapes control bytes and reserved chars") {
    assert(MetaRender.escapePathName("a=b/c d") === "a%3Db%2Fc d")
    assert(MetaRender.escapePathName("x\u0001y") === "x%01y")
    assert(MetaRender.escapePathName("plain-1.0_z") === "plain-1.0_z")
  }

  test("view expanded text: author keyword case, db qualification, " +
      "column-list wrapper (SemanticAnalyzer createView expansion)") {
    import org.apache.spark.sql.functions._
    spark.range(1).select(col("id").as("col1"))
      .createOrReplaceTempView("vsrc")
    val m = store
    m.recordStorageMeta("create table vsrc (col1 int)")
    m.dbOwner("vsrc") = "default"
    // plain view, lowercase author keywords
    m.recordStorageMeta("create view v1 as select col1 from vsrc",
      view = true)
    assert(m.viewExpandedTextExact("v1").get ===
      "select `vsrc`.`col1` from `default`.`vsrc`")
    // uppercase author keywords survive; star expands
    m.recordStorageMeta("CREATE VIEW v2 AS SELECT * FROM vsrc",
      view = true)
    assert(m.viewExpandedTextExact("v2").get ===
      "SELECT `vsrc`.`col1` FROM `default`.`vsrc`")
    // explicit column list wraps in Hive's aliasing subquery
    m.recordStorageMeta(
      "create view v3 (c COMMENT 'x') as select col1 from vsrc",
      view = true)
    m.dbOwner("v3") = "default"
    assert(m.viewExpandedTextExact("v3").get ===
      "SELECT `col1` AS `c` FROM " +
        "(select `vsrc`.`col1` from `default`.`vsrc`) `default.v3`")
    // multi-table shapes are not reconstructible -> None
    m.recordStorageMeta(
      "create view v4 as select a.col1 from vsrc a join vsrc b",
      view = true)
    assert(m.viewExpandedTextExact("v4").isEmpty)
  }

  test("a comment containing an escaped quote does not derail the " +
      "balanced column-list scan (table comment still records)") {
    val m = store
    m.recordStorageMeta("create table ec (col1 string comment " +
      "'a\\nb\\'\\;') comment 'tbl' partitioned by (p1 string)")
    assert(m.tableComment.get("ec").contains("tbl"))
  }

  test("ALTER SET TBLPROPERTIES stamps last_modified_*") {
    val m = store
    m.trackTblProps("create table lm (a int)", create = true)
    m.trackTblProps("alter table lm set tblproperties ('k'='v')",
      create = false)
    assert(m.tableProps("lm")("k") === "v")
    assert(m.tableProps("lm").contains("last_modified_by"))
    assert(m.tableProps("lm").contains("last_modified_time"))
  }
}
