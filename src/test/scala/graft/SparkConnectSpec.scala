package graft

/** SURVEY §3.4 remote entry: the engine's HiveQL surface served over
  * Spark Connect — the Spark-native analogue of HiveServer2's thrift
  * endpoint (service/cli/operation/SQLOperation.java:91). The server
  * runs in-process on the suite's SparkContext; a REAL Connect client
  * (gRPC over localhost, the bundled Scala client) drives Hive-format
  * DDL, a dialect-only statement (UPDATE), a metadata read
  * (DESCRIBE FORMATTED in Hive layout), and a query.
  */
class SparkConnectSpec extends SparkSpec {

  test("Spark Connect endpoint serves the Hive dialect: CREATE " +
      "STORED AS, UPDATE, DESCRIBE FORMATTED, query — via gRPC client") {
    val sc = spark.sparkContext
    org.apache.spark.sql.connect.service.SparkConnectService.start(sc)
    // the bound port is private[connect] — read it reflectively
    val svc = org.apache.spark.sql.connect.service.SparkConnectService
    val srv = svc.getClass.getMethod("server").invoke(svc)
    val port = srv.getClass.getMethod("getPort").invoke(srv)
      .asInstanceOf[Int]
    assert(port > 0, "connect server did not bind")
    try {
      val remote = org.apache.spark.sql.connect.SparkSession.builder()
        .remote(s"sc://localhost:$port").create()
      try {
        // the parser facade is inert until the session opts in
        remote.sql("SET spark.graft.dialect=true").collect()
        remote.sql("DROP TABLE IF EXISTS conn_t").collect()
        // Hive-format CREATE: Spark's in-memory catalog would reject
        // STORED AS — the dialect converts it (hiveCreateRewrite) and
        // the metadata layer keeps the declared storage descriptor
        remote.sql("CREATE TABLE conn_t (k INT COMMENT 'the key', " +
          "v STRING) STORED AS PARQUET").collect()
        remote.sql("INSERT INTO conn_t VALUES (1, 'a'), (2, 'b')")
          .collect()
        val cnt = remote.sql("SELECT count(*) AS c FROM conn_t")
          .collect()
        assert(cnt.head.getLong(0) === 2L)
        // dialect-only statement: Spark's parser rejects UPDATE on a
        // non-Delta catalog — the facade dispatches it (MergeInto
        // copy-on-write), exactly where HiveServer2 would run it
        remote.sql("UPDATE conn_t SET v = 'z' WHERE k = 1").collect()
        val z = remote.sql("SELECT v FROM conn_t WHERE k = 1 OR k = 2 " +
          "ORDER BY k").collect().map(_.getString(0)).toSeq
        assert(z === Seq("z", "b"))
        // metadata read in Hive's exact DESCRIBE FORMATTED layout,
        // served from the session's metadata layer over the wire
        val desc = remote.sql("DESCRIBE FORMATTED conn_t").collect()
          .map(r => (r.getString(0).trim, r.getString(1).trim))
        assert(desc.exists(r => r._1 == "k" && r._2 == "int"),
          desc.mkString("\n"))
        assert(desc.exists(_._1 == "# Detailed Table Information"),
          desc.mkString("\n"))
        assert(desc.exists(r => r._1 == "SerDe Library:" &&
          r._2.toLowerCase.contains("parquet")), desc.mkString("\n"))
        remote.sql("DROP TABLE conn_t").collect()
      } finally {
        remote.close()
        // session churn in the connect service clears the JVM-wide
        // default/active session — concurrently running suites (and
        // anything using SQLConf.get) depend on it
        org.apache.spark.sql.SparkSession.setDefaultSession(spark)
        org.apache.spark.sql.SparkSession.setActiveSession(spark)
      }
    } finally {
      org.apache.spark.sql.connect.service.SparkConnectService
        .stop(None, None)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("authorization over gRPC: GRANT / SET ROLE / SHOW GRANT / " +
      "SHOW CURRENT ROLES round-trip through a real Connect client") {
    val sc = spark.sparkContext
    org.apache.spark.sql.connect.service.SparkConnectService.start(sc)
    val svc = org.apache.spark.sql.connect.service.SparkConnectService
    val srv = svc.getClass.getMethod("server").invoke(svc)
    val port = srv.getClass.getMethod("getPort").invoke(srv)
      .asInstanceOf[Int]
    try {
      val remote = org.apache.spark.sql.connect.SparkSession.builder()
        .remote(s"sc://localhost:$port").create()
      try {
        remote.sql("SET spark.graft.dialect=true").collect()
        remote.sql("CREATE ROLE connrole").collect()
        remote.sql("GRANT ROLE connrole TO USER connuser").collect()
        remote.sql("GRANT SELECT, INSERT ON TABLE conn_auth_t " +
          "TO USER connuser WITH GRANT OPTION").collect()
        val g = remote.sql(
          "SHOW GRANT USER connuser ON TABLE conn_auth_t").collect()
          .map(_.toSeq.map(v => if (v == null) "" else v.toString)
            .mkString("\t")).toSeq
        assert(g.length === 2, g.mkString("\n"))
        assert(g.forall(_.startsWith("default\tconn_auth_t\t\t\t" +
          "connuser\tUSER\t")), g.mkString("\n"))
        assert(g.exists(_.contains("\tINSERT\ttrue\t")), g.mkString("\n"))
        // the 10-column Hive result schema rides over the wire
        val cols = remote.sql(
          "SHOW GRANT USER connuser ON TABLE conn_auth_t").columns
        assert(cols.toSeq === Seq("database", "table", "partition",
          "column", "principal_name", "principal_type", "privilege",
          "grant_option", "grant_time", "grantor"))
        // SET ROLE must dispatch to the dialect, not parse as a
        // Spark conf assignment
        remote.sql("SET ROLE connrole").collect()
        val cur = remote.sql("SHOW CURRENT ROLES").collect()
          .map(_.getString(0)).toSeq
        assert(cur === Seq("connrole"), cur)
        remote.sql("REVOKE ALL ON TABLE conn_auth_t FROM USER connuser")
          .collect()
        assert(remote.sql(
          "SHOW GRANT USER connuser ON TABLE conn_auth_t").collect()
          .isEmpty)
        remote.sql("DROP ROLE connrole").collect()
      } finally {
        remote.close()
        org.apache.spark.sql.SparkSession.setDefaultSession(spark)
        org.apache.spark.sql.SparkSession.setActiveSession(spark)
      }
    } finally {
      org.apache.spark.sql.connect.service.SparkConnectService
        .stop(None, None)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("enforcement DENIAL over gRPC: with authorization on, an " +
      "unprivileged client's SELECT raises and the wire error " +
      "carries the reference's Permission denied text") {
    val sc = spark.sparkContext
    org.apache.spark.sql.connect.service.SparkConnectService.start(sc)
    val svc = org.apache.spark.sql.connect.service.SparkConnectService
    val srv = svc.getClass.getMethod("server").invoke(svc)
    val port = srv.getClass.getMethod("getPort").invoke(srv)
      .asInstanceOf[Int]
    try {
      val remote = org.apache.spark.sql.connect.SparkSession.builder()
        .remote(s"sc://localhost:$port").create()
      try {
        remote.sql("SET spark.graft.dialect=true").collect()
        remote.sql("SET spark.graft.authorization=true").collect()
        // the scripts' identity model (test authenticator) is its own
        // opt-in while enforcement is on
        remote.sql("SET spark.graft.authorization.userswitch=true")
          .collect()
        // pin the creator identity (the session default is the OS
        // user; ownership keys on whoever runs the CREATE)
        remote.sql("SET user.name=conn_owner").collect()
        remote.sql("CREATE TABLE conn_deny_t (i INT)").collect()
        remote.sql("SET user.name=conn_unpriv").collect()
        val e = intercept[Exception](
          remote.sql("SELECT * FROM conn_deny_t").collect())
        val msg = Option(e.getMessage).getOrElse("")
        assert(msg.contains("Permission denied: Principal " +
          "[name=conn_unpriv, type=USER] does not have following " +
          "privileges for operation QUERY"), msg)
        assert(msg.contains("[SELECT] on Object [type=TABLE_OR_VIEW, " +
          "name=default.conn_deny_t]"), msg)
        // the owner still reads fine over the same wire
        remote.sql("SET user.name=conn_owner").collect()
        assert(remote.sql("SELECT * FROM conn_deny_t").collect()
          .isEmpty)
        remote.sql("SET spark.graft.authorization=false").collect()
        remote.sql("DROP TABLE IF EXISTS conn_deny_t").collect()
      } finally {
        remote.close()
        org.apache.spark.sql.SparkSession.setDefaultSession(spark)
        org.apache.spark.sql.SparkSession.setActiveSession(spark)
      }
    } finally {
      org.apache.spark.sql.connect.service.SparkConnectService
        .stop(None, None)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("durable grants across Connect clients: a grant by client A " +
      "persists through the metastore ledger and a LATER client B " +
      "sees it at construction (HiveServer2-style metastore sharing)") {
    val sc = spark.sparkContext
    org.apache.spark.sql.connect.service.SparkConnectService.start(sc)
    val svc = org.apache.spark.sql.connect.service.SparkConnectService
    val srv = svc.getClass.getMethod("server").invoke(svc)
    val port = srv.getClass.getMethod("getPort").invoke(srv)
      .asInstanceOf[Int]
    val ledger = java.nio.file.Files
      .createTempDirectory("graft_cxl").toString + "/ms.ledger"
    try {
      val a = org.apache.spark.sql.connect.SparkSession.builder()
        .remote(s"sc://localhost:$port").create()
      try {
        a.sql("SET spark.graft.dialect=true").collect()
        a.sql(s"SET spark.graft.metastore.path=$ledger").collect()
        a.sql("GRANT SELECT ON TABLE shared_auth_t TO USER mallory")
          .collect()
      } finally a.close()
      val b = org.apache.spark.sql.connect.SparkSession.builder()
        .remote(s"sc://localhost:$port").create()
      try {
        b.sql("SET spark.graft.dialect=true").collect()
        b.sql(s"SET spark.graft.metastore.path=$ledger").collect()
        val got = b.sql(
          "SHOW GRANT USER mallory ON TABLE shared_auth_t").collect()
          .map(_.toSeq.map(v => if (v == null) "" else v.toString)
            .mkString("\t")).toSeq
        assert(got.length === 1 && got.head.contains("\tSELECT\t"),
          got.mkString("\n"))
      } finally {
        b.close()
        org.apache.spark.sql.SparkSession.setDefaultSession(spark)
        org.apache.spark.sql.SparkSession.setActiveSession(spark)
      }
    } finally {
      org.apache.spark.sql.connect.service.SparkConnectService
        .stop(None, None)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("CONCURRENT grants from two live Connect clients on one " +
      "metastore path union — the nonce-named segments + per-path " +
      "lock close the rename-overwrite race end-to-end over gRPC") {
    val sc = spark.sparkContext
    org.apache.spark.sql.connect.service.SparkConnectService.start(sc)
    val svc = org.apache.spark.sql.connect.service.SparkConnectService
    val srv = svc.getClass.getMethod("server").invoke(svc)
    val port = srv.getClass.getMethod("getPort").invoke(srv)
      .asInstanceOf[Int]
    val ledger = java.nio.file.Files
      .createTempDirectory("graft_cxr").toString + "/ms.ledger"
    try {
      def client() = {
        val s = org.apache.spark.sql.connect.SparkSession.builder()
          .remote(s"sc://localhost:$port").create()
        s.sql("SET spark.graft.dialect=true").collect()
        s.sql(s"SET spark.graft.metastore.path=$ledger").collect()
        s
      }
      val a = client()
      // A writes first so B's dispatcher loads an existing base
      a.sql("GRANT SELECT ON TABLE race_conn_t TO USER seedA").collect()
      val b = client()
      try {
        val tA = new Thread(() => (1 to 12).foreach(i => a.sql(
          s"GRANT SELECT ON TABLE race_conn_t TO USER connA$i")
          .collect()))
        val tB = new Thread(() => (1 to 12).foreach(i => b.sql(
          s"GRANT INSERT ON TABLE race_conn_t TO USER connB$i")
          .collect()))
        tA.start(); tB.start(); tA.join(); tB.join()
      } finally { a.close(); b.close() }
      val c = client()
      try {
        val who = c.sql("SHOW GRANT ON TABLE race_conn_t").collect()
          .map(_.getString(4)).toSet
        (1 to 12).foreach { i =>
          assert(who.contains(s"connA$i"), s"connA$i lost in the race")
          assert(who.contains(s"connB$i"), s"connB$i lost in the race")
        }
        assert(who.contains("seedA"))
      } finally {
        c.close()
        org.apache.spark.sql.SparkSession.setDefaultSession(spark)
        org.apache.spark.sql.SparkSession.setActiveSession(spark)
      }
    } finally {
      org.apache.spark.sql.connect.service.SparkConnectService
        .stop(None, None)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("two Connect clients get isolated USE cursors and namespaces " +
      "(per-session HiveStatements, like HiveServer2 sessions)") {
    val sc = spark.sparkContext
    org.apache.spark.sql.connect.service.SparkConnectService.start(sc)
    val svc = org.apache.spark.sql.connect.service.SparkConnectService
    val srv = svc.getClass.getMethod("server").invoke(svc)
    val port = srv.getClass.getMethod("getPort").invoke(srv)
      .asInstanceOf[Int]
    try {
      val c1 = org.apache.spark.sql.connect.SparkSession.builder()
        .remote(s"sc://localhost:$port").create()
      val c2 = org.apache.spark.sql.connect.SparkSession.builder()
        .remote(s"sc://localhost:$port").create()
      try {
        // a previous run's MANAGED-table dirs would fail CREATE with
        // LOCATION_ALREADY_EXISTS (in-memory catalog, durable files)
        for (d <- Seq("isodb1__tiso", "isodb2__tiso")) {
          val f = new java.io.File(s"spark-warehouse/$d")
          if (f.exists())
            org.apache.commons.io.FileUtils.deleteDirectory(f)
        }
        for (c <- Seq(c1, c2))
          c.sql("SET spark.graft.dialect=true").collect()
        // interleaved: each client creates ITS OWN db, moves its USE
        // cursor there, and creates a same-named table — the cursors
        // and bindings must not bleed across clients
        c1.sql("CREATE DATABASE IF NOT EXISTS isodb1").collect()
        c2.sql("CREATE DATABASE IF NOT EXISTS isodb2").collect()
        c1.sql("USE isodb1").collect()
        c2.sql("USE isodb2").collect()
        c1.sql("CREATE TABLE tiso (k INT) STORED AS PARQUET").collect()
        c2.sql("CREATE TABLE tiso (k INT) STORED AS PARQUET").collect()
        c1.sql("INSERT INTO tiso VALUES (1)").collect()
        c2.sql("INSERT INTO tiso VALUES (2)").collect()
        // the bare name resolves through each client's own cursor
        val v1 = c1.sql("SELECT k FROM tiso").collect()
        val v2 = c2.sql("SELECT k FROM tiso").collect()
        assert(v1.map(_.getInt(0)).toSeq === Seq(1))
        assert(v2.map(_.getInt(0)).toSeq === Seq(2))
        // each client's SHOW TABLES lists its own cursor's namespace
        val t1 = c1.sql("SHOW TABLES").collect().map(_.getString(0))
        val t2 = c2.sql("SHOW TABLES").collect().map(_.getString(0))
        assert(t1.contains("tiso"), t1.mkString(","))
        assert(t2.contains("tiso"), t2.mkString(","))
        // c1's cursor is still isodb1 after c2's USE — a second
        // same-client query keeps resolving to its own table
        assert(c1.sql("SELECT sum(k) AS s FROM tiso").collect()
          .head.getLong(0) === 1L)
        c1.sql("DROP TABLE tiso").collect()
        c2.sql("DROP TABLE tiso").collect()
      } finally {
        c1.close(); c2.close()
        org.apache.spark.sql.SparkSession.setDefaultSession(spark)
        org.apache.spark.sql.SparkSession.setActiveSession(spark)
      }
    } finally {
      org.apache.spark.sql.connect.service.SparkConnectService
        .stop(None, None)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }
}
