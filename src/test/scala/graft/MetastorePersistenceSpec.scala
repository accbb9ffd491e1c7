package graft

/** Metastore persistence (`spark.graft.metastore.path`): a fresh
  * [[HiveStatements]] instance over the same conf must serve the
  * metadata read surface identically after a "restart" — the
  * reference metastore's restart contract (ObjectStore over an RDBMS;
  * here a single-file ledger next to the warehouse).
  */
class MetastorePersistenceSpec extends SparkSpec {

  private def render(h: HiveStatements, q: String): Seq[String] =
    h.sql(q).get.collect().map(_.toSeq.map {
      case null => ""
      case v => v.toString
    }.mkString("")).toSeq

  test("a fresh HiveStatements over the same ledger serves DESCRIBE " +
      "FORMATTED / SHOW PARTITIONS / column stats / namespace " +
      "identically after restart") {
    val ledger = java.nio.file.Files
      .createTempDirectory("graft_ms").toString + "/metastore.ledger"
    spark.conf.set("spark.graft.metastore.path", ledger)
    try {
      val h1 = new HiveStatements(spark)
      h1.sql("CREATE DATABASE IF NOT EXISTS perdb COMMENT 'persisted db'")
      h1.sql("DROP TABLE IF EXISTS perdb.per_t")
      h1.sql("CREATE TABLE perdb.per_t (k INT COMMENT 'the key', " +
        "v STRING) PARTITIONED BY (ds STRING) " +
        "CLUSTERED BY (k) SORTED BY (k ASC) INTO 4 BUCKETS " +
        "STORED AS ORC TBLPROPERTIES ('who'='me')")
      h1.sql("ALTER TABLE perdb.per_t ADD PARTITION (ds='2026-01-01')")
      h1.sql("ALTER TABLE perdb.per_t ADD PARTITION (ds='2026-01-02')")
      spark.sql("DROP TABLE IF EXISTS per_s")
      h1.sql("CREATE TABLE per_s (k INT, v STRING) STORED AS PARQUET")
      h1.sql("INSERT INTO per_s VALUES (1,'aa'), (2,'bbb'), (2,'aa')")
      h1.sql("ANALYZE TABLE per_s COMPUTE STATISTICS FOR COLUMNS k, v")
      h1.sql("ALTER TABLE per_s UPDATE STATISTICS " +
        "SET ('numRows'='3')")

      val queries = Seq(
        "DESCRIBE FORMATTED perdb.per_t",
        "SHOW PARTITIONS perdb.per_t",
        "SHOW CREATE TABLE perdb.per_t",
        "DESCRIBE FORMATTED per_s k",
        "DESCRIBE FORMATTED per_s v",
        "DESCRIBE FORMATTED per_s",
        "SHOW DATABASES",
        "SHOW TABLES IN perdb",
        "DESCRIBE DATABASE perdb")
      val before = queries.map(q => q -> render(h1, q)).toMap

      // "restart": a brand-new dispatcher restores from the ledger
      val h2 = new HiveStatements(spark)
      for (q <- queries)
        assert(render(h2, q) === before(q), s"after restart: $q")
      // restored stats are live metadata, not just rendering: the
      // column-stat ledger serves overrides set before the restart
      h2.sql("ALTER TABLE per_s UPDATE STATISTICS FOR COLUMN k " +
        "SET ('numDVs'='99')")
      val kRow = h2.sql("DESCRIBE FORMATTED per_s k").get.collect()
        .find(_.getString(0).trim == "k").get
      assert(kRow.getString(5).trim === "99")
      assert(kRow.getString(2).trim === "1") // min from pre-restart ANALYZE
    } finally {
      spark.conf.unset("spark.graft.metastore.path")
      val h = new HiveStatements(spark)
      h.sql("DROP TABLE IF EXISTS perdb.per_t")
      spark.sql("DROP TABLE IF EXISTS perdb__per_t")
      spark.sql("DROP TABLE IF EXISTS per_s")
    }
  }

  test("catalog DATA tables re-register from the ledger: a fresh " +
      "dispatcher serves SELECT after the in-memory catalog forgot " +
      "the binding (restart recovery, not just DESCRIBE)") {
    val base = java.nio.file.Files.createTempDirectory("graft_msd")
    val ledger = s"$base/metastore.ledger"
    spark.conf.set("spark.graft.metastore.path", ledger)
    try {
      val h1 = new HiveStatements(spark)
      spark.sql("DROP TABLE IF EXISTS per_data")
      // EXTERNAL: dropping the catalog entry below simulates a
      // restart (files survive; a managed drop would delete them)
      h1.sql(s"CREATE EXTERNAL TABLE per_data (k INT, v STRING) " +
        s"STORED AS PARQUET LOCATION '$base/per_data'")
      h1.sql("INSERT INTO per_data VALUES (1,'a'), (2,'b')")
      spark.sql("DROP TABLE IF EXISTS per_part")
      h1.sql(s"CREATE EXTERNAL TABLE per_part (k INT) " +
        s"PARTITIONED BY (ds STRING) STORED AS PARQUET " +
        s"LOCATION '$base/per_part'")
      h1.sql("INSERT INTO per_part PARTITION (ds='a') VALUES (1)")
      h1.sql("INSERT INTO per_part PARTITION (ds='b') VALUES (2)")
      // the "restart": catalog forgets, warehouse files survive
      spark.sessionState.catalog.dropTable(
        org.apache.spark.sql.catalyst.TableIdentifier("per_data"),
        ignoreIfNotExists = false, purge = false)
      spark.sessionState.catalog.dropTable(
        org.apache.spark.sql.catalyst.TableIdentifier("per_part"),
        ignoreIfNotExists = false, purge = false)
      assert(!spark.catalog.tableExists("per_data"))
      val h2 = new HiveStatements(spark)
      val got = h2.sql("SELECT k, v FROM per_data ORDER BY k").get
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(got === Seq((1, "a"), (2, "b")))
      // partitioned recovery: partitions rebuilt from the dir layout,
      // and partition pruning still applies to the recovered table
      val p = h2.sql("SELECT k FROM per_part WHERE ds='b'").get
        .collect().map(_.getInt(0)).toSeq
      assert(p === Seq(2))
      spark.sql("DROP TABLE IF EXISTS per_data")
      spark.sql("DROP TABLE IF EXISTS per_part")
    } finally spark.conf.unset("spark.graft.metastore.path")
  }

  test("a DELIMITED (csv-provider) table restores its storage " +
      "OPTIONS after restart — separator and null markers read " +
      "back, not default commas") {
    val base = java.nio.file.Files.createTempDirectory("graft_msc")
    val ledger = s"$base/metastore.ledger"
    spark.conf.set("spark.graft.metastore.path", ledger)
    try {
      val h1 = new HiveStatements(spark)
      spark.sql("DROP TABLE IF EXISTS per_csv")
      h1.sql("CREATE EXTERNAL TABLE per_csv (k INT, v STRING) " +
        "ROW FORMAT DELIMITED FIELDS TERMINATED BY '|' " +
        s"STORED AS TEXTFILE LOCATION '$base/per_csv'")
      h1.sql("INSERT INTO per_csv VALUES (1,'a,b'), (2,'c')")
      val before = h1.sql("SELECT k, v FROM per_csv ORDER BY k").get
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(before === Seq((1, "a,b"), (2, "c")),
        s"pre-restart read: $before")
      // the "restart": catalog forgets, files + ledger survive
      spark.sessionState.catalog.dropTable(
        org.apache.spark.sql.catalyst.TableIdentifier("per_csv"),
        ignoreIfNotExists = false, purge = false)
      val h2 = new HiveStatements(spark)
      val after = h2.sql("SELECT k, v FROM per_csv ORDER BY k").get
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      // the defining assert: the value containing a COMMA is intact
      // (a restore that lost the '|' separator option would re-split
      // "1|a,b" on commas and corrupt both columns)
      assert(after === before, "storage options survived restart")
      assert(after.head === ((1, "a,b")))
      spark.sql("DROP TABLE IF EXISTS per_csv")
    } finally spark.conf.unset("spark.graft.metastore.path")
  }

  test("crash between tmp-write and rename recovers: the load path " +
      "falls back to the surviving .tmp snapshot") {
    val base = java.nio.file.Files.createTempDirectory("graft_msx")
    val ledger = s"$base/ms.ledger"
    spark.conf.set("spark.graft.metastore.path", ledger)
    try {
      val h1 = new HiveStatements(spark)
      spark.sql("DROP TABLE IF EXISTS crash_t")
      h1.sql("CREATE TABLE crash_t (k INT) COMMENT 'survives' " +
        "STORED AS PARQUET")
      // simulate the worst-case crash: the primary is gone and only
      // the freshly-written temp snapshot exists
      val lf = new java.io.File(ledger)
      val tmp = new java.io.File(lf.getParentFile,
        "." + lf.getName + ".tmp")
      java.nio.file.Files.move(lf.toPath, tmp.toPath)
      assert(!lf.exists() && tmp.exists())
      val h2 = new HiveStatements(spark)
      assert(h2.meta.tableComment.get("crash_t").contains("survives"),
        "state recovered from .tmp")
      spark.sql("DROP TABLE IF EXISTS crash_t")
    } finally spark.conf.unset("spark.graft.metastore.path")
  }

  test("format pin: a COMMITTED v2 fixture ledger loads across " +
      "upgrades (explicit JSON, not Java serialization)") {
    val url = getClass.getResource("/fixture_v2.ledger")
    assert(url != null, "fixture_v2.ledger missing from resources")
    spark.conf.set("spark.graft.metastore.path", url.getPath)
    try {
      val h = new HiveStatements(spark)
      assert(h.meta.tableComment.get("fix_t").contains("pinned comment"))
      assert(h.meta.createTime.get("fix_t").contains(1700000000L))
      assert(h.auth.roles.contains("fixrole"))
      val lines = h.sql("SHOW GRANT USER alice ON TABLE fix_t").get
        .collect().map(_.toSeq.mkString("\t"))
      assert(lines.toSeq === Seq(
        "default\tfix_t\t\t\talice\tUSER\tSELECT\ttrue\t-1\tbob"))
    } finally spark.conf.unset("spark.graft.metastore.path")
  }

  test("authorization state persists: grant -> restart -> SHOW " +
      "GRANT / SHOW ROLES identical") {
    val base = java.nio.file.Files.createTempDirectory("graft_msa")
    spark.conf.set("spark.graft.metastore.path", s"$base/ms.ledger")
    try {
      val h1 = new HiveStatements(spark)
      h1.sql("CREATE ROLE pledge")
      h1.sql("GRANT ROLE pledge TO USER carol")
      h1.sql("GRANT SELECT, INSERT ON TABLE fix_auth TO USER carol " +
        "WITH GRANT OPTION")
      def dump(h: HiveStatements): Seq[String] =
        h.sql("SHOW GRANT USER carol ON TABLE fix_auth").get.collect()
          .map(_.toSeq.mkString("\t")).toSeq ++
          h.sql("SHOW ROLES").get.collect().map(_.getString(0)).toSeq ++
          h.sql("SHOW ROLE GRANT USER carol").get.collect()
            .map(_.toSeq.mkString("\t")).toSeq
      val before = dump(h1)
      assert(before.exists(_.contains("pledge")), before.mkString("\n"))
      val h2 = new HiveStatements(spark)
      assert(dump(h2) === before, "auth state survived restart")
    } finally spark.conf.unset("spark.graft.metastore.path")
  }

  test("incremental persistence: a mass ADD PARTITION script writes " +
      "per-statement DELTA segments (changed keys only), not full " +
      "snapshots; restart merges base+deltas; compaction bounds the " +
      "segment count") {
    val base = java.nio.file.Files.createTempDirectory("graft_msi")
    val ledger = s"$base/ms.ledger"
    spark.conf.set("spark.graft.metastore.path", ledger)
    try {
      val h1 = new HiveStatements(spark)
      spark.sql("DROP TABLE IF EXISTS inc_t")
      h1.sql("CREATE TABLE inc_t (k INT) PARTITIONED BY (ds STRING) " +
        "STORED AS PARQUET")
      val lf = new java.io.File(ledger)
      val dd = new java.io.File(lf.getParentFile,
        "." + lf.getName + ".delta")
      val baseLenAfterCreate = lf.length()
      val baseModAfterCreate = lf.lastModified()
      // 40 ADD PARTITIONs: each persists durably but must cost only
      // a small delta, never a base rewrite (O(changed-keys) bytes —
      // the O(n^2) mass-migration hazard)
      (1 to 40).foreach(i =>
        h1.sql(s"ALTER TABLE inc_t ADD PARTITION (ds='d$i')"))
      assert(lf.length() === baseLenAfterCreate &&
        lf.lastModified() === baseModAfterCreate,
        "base snapshot must not rewrite per statement")
      val segs = dd.listFiles().filter(_.getName.endsWith(".json"))
      assert(segs.length === 40, s"got ${segs.length} delta segments")
      // each delta holds only the keys that changed (a handful of
      // lines), not the whole metastore
      val segLines = scala.io.Source.fromFile(segs.head)
        .getLines().size
      assert(segLines < 8, s"delta holds $segLines keys")
      // restart: base + deltas merge, last writer per key wins
      val h2 = new HiveStatements(spark)
      val parts = h2.sql("SHOW PARTITIONS inc_t").get.collect()
        .map(_.getString(0)).toSeq
      assert(parts.size === 40 && parts.contains("ds=d40"), parts.size)
      // compaction: 70 more statements cross the in-process segment
      // threshold (64) — everything folds back into one base snapshot
      // and the segment count stays bounded
      (41 to 110).foreach(i =>
        h2.sql(s"ALTER TABLE inc_t ADD PARTITION (ds='d$i')"))
      val segs2 = Option(dd.listFiles()).map(
        _.count(_.getName.endsWith(".json"))).getOrElse(0)
      assert(segs2 < 64, s"compaction never ran: $segs2 segments")
      assert(lf.lastModified() > baseModAfterCreate,
        "compaction rewrote the base")
      val h3 = new HiveStatements(spark)
      assert(h3.sql("SHOW PARTITIONS inc_t").get.collect().length === 110)
      // crash between a compaction's base-write and its segment
      // cleanup: a STALE segment (older epoch) must not replay over
      // the newer base — plant one carrying a bogus table comment
      val stale = new java.io.File(dd, "00000000.00000001.json")
      dd.mkdirs()
      val pw = new java.io.PrintWriter(stale, "UTF-8")
      try pw.println(graft.meta.LedgerJson.encodeLine("tableComment",
        scala.collection.mutable.LinkedHashMap(
          "inc_t" -> "STALE-EPOCH")))
      finally pw.close()
      val h4 = new HiveStatements(spark)
      assert(!h4.meta.tableComment.get("inc_t").contains("STALE-EPOCH"),
        "stale-epoch segment replayed over the newer base")
      assert(h4.sql("SHOW PARTITIONS inc_t").get.collect().length === 110)
      spark.sql("DROP TABLE IF EXISTS inc_t")
    } finally spark.conf.unset("spark.graft.metastore.path")
  }

  test("the ledger file is written on DDL and absent conf means no " +
      "writes (session-only metadata, harness-safe default)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ms2")
    val ledger = dir.toString + "/ms.ledger"
    spark.conf.set("spark.graft.metastore.path", ledger)
    try {
      val h = new HiveStatements(spark)
      spark.sql("DROP TABLE IF EXISTS led_t")
      h.sql("CREATE TABLE led_t (k INT) STORED AS PARQUET")
      assert(new java.io.File(ledger).exists(), "ledger written on DDL")
      spark.sql("DROP TABLE IF EXISTS led_t")
    } finally spark.conf.unset("spark.graft.metastore.path")
    val before = new java.io.File(ledger).lastModified()
    val h2 = new HiveStatements(spark) // no conf: no load, no writes
    spark.sql("DROP TABLE IF EXISTS led2_t")
    h2.sql("CREATE TABLE led2_t (k INT) STORED AS PARQUET")
    assert(new java.io.File(ledger).lastModified() === before)
    spark.sql("DROP TABLE IF EXISTS led2_t")
  }
}
