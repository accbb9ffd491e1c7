package graft.meta

import graft.{HiveStatements, SparkSpec}

/** The GRANT/REVOKE/ROLE surface through the PUBLIC `sql()` entry —
  * statement round-trips in the reference's recorded layouts
  * (ref ql/exec/DDLTask.java grantOrRevokePrivileges/roleDDL;
  * layouts pinned against authorization_*.q.out recordings). */
class AuthorizationSpec extends SparkSpec {

  private def lines(h: HiveStatements, q: String): Seq[String] =
    h.sql(q).get.collect().map(_.toSeq.map {
      case null => ""
      case v => v.toString
    }.mkString("\t")).toSeq

  test("grant -> show grant -> revoke -> show grant round-trip " +
      "(table scope, wire layout)") {
    val h = new HiveStatements(spark)
    h.auth.currentUser = "granter1"
    h.sql("GRANT SELECT ON TABLE auth_t1 TO USER alice")
    h.sql("GRANT INSERT ON auth_t1 TO USER alice WITH GRANT OPTION")
    assert(lines(h, "SHOW GRANT USER alice ON TABLE auth_t1") === Seq(
      "default\tauth_t1\t\t\talice\tUSER\tINSERT\ttrue\t-1\tgranter1",
      "default\tauth_t1\t\t\talice\tUSER\tSELECT\tfalse\t-1\tgranter1"))
    h.sql("REVOKE SELECT ON TABLE auth_t1 FROM USER alice")
    assert(lines(h, "SHOW GRANT USER alice ON TABLE auth_t1") === Seq(
      "default\tauth_t1\t\t\talice\tUSER\tINSERT\ttrue\t-1\tgranter1"))
    h.sql("REVOKE ALL ON TABLE auth_t1 FROM USER alice")
    assert(lines(h, "SHOW GRANT USER alice ON TABLE auth_t1").isEmpty)
  }

  test("GRANT ALL expands to the four DML privileges (SQL-standard " +
      "authorizer) and principal case is preserved") {
    val h = new HiveStatements(spark)
    h.auth.currentUser = "u1"
    h.sql("GRANT ALL ON TABLE auth_t2 TO USER userA WITH GRANT OPTION")
    assert(lines(h, "SHOW GRANT USER userA ON TABLE auth_t2") === Seq(
      "default\tauth_t2\t\t\tuserA\tUSER\tDELETE\ttrue\t-1\tu1",
      "default\tauth_t2\t\t\tuserA\tUSER\tINSERT\ttrue\t-1\tu1",
      "default\tauth_t2\t\t\tuserA\tUSER\tSELECT\ttrue\t-1\tu1",
      "default\tauth_t2\t\t\tuserA\tUSER\tUPDATE\ttrue\t-1\tu1"))
  }

  test("column grants render one row per column; column-filtered " +
      "SHOW GRANT; database scope; global scope") {
    val h = new HiveStatements(spark)
    h.auth.currentUser = "hive_test_user"
    h.auth.expandAll = false // legacy provider behavior
    h.sql("GRANT SELECT (key, value) ON TABLE auth_t3 TO USER bob")
    h.sql("GRANT SELECT ON DATABASE default TO USER bob")
    h.sql("GRANT SELECT TO USER bob")
    assert(lines(h, "SHOW GRANT USER bob ON TABLE auth_t3(key)") ===
      Seq("default\tauth_t3\t\t[key]\tbob\tUSER\tSELECT\tfalse\t-1" +
        "\thive_test_user"))
    // the plain table query shows only non-column rows (none here)
    assert(lines(h, "SHOW GRANT USER bob ON TABLE auth_t3").isEmpty)
    assert(lines(h, "SHOW GRANT USER bob ON DATABASE default") ===
      Seq("default\t\t\t\tbob\tUSER\tSELECT\tfalse\t-1\thive_test_user"))
    // ON ALL sees every scope: global + database + column rows
    assert(lines(h, "SHOW GRANT USER bob ON ALL") === Seq(
      "\t\t\t\tbob\tUSER\tSELECT\tfalse\t-1\thive_test_user",
      "default\t\t\t\tbob\tUSER\tSELECT\tfalse\t-1\thive_test_user",
      "default\tauth_t3\t\t[key]\tbob\tUSER\tSELECT\tfalse\t-1" +
        "\thive_test_user",
      "default\tauth_t3\t\t[value]\tbob\tUSER\tSELECT\tfalse\t-1" +
        "\thive_test_user"))
    h.sql("REVOKE SELECT (key, value) ON TABLE auth_t3 FROM USER bob")
    assert(lines(h, "SHOW GRANT USER bob ON TABLE auth_t3(key)").isEmpty)
  }

  test("role lifecycle: create/grant/show role grant/show " +
      "principals/set role/show current roles/revoke/drop") {
    val h = new HiveStatements(spark)
    h.auth.currentUser = "adm"
    h.sql("CREATE ROLE Analyst") // roles lowercase (Hive lowercases)
    assert(lines(h, "SHOW ROLES") === Seq("admin", "analyst", "public"))
    h.sql("GRANT ROLE analyst TO USER dana WITH ADMIN OPTION")
    assert(lines(h, "SHOW ROLE GRANT USER dana") === Seq(
      "analyst\ttrue\t-1\tadm", "public\tfalse\t-1\t"))
    assert(lines(h, "SHOW PRINCIPALS analyst") === Seq(
      "dana\tUSER\ttrue\tadm\tUSER\t-1"))
    // the role-keyword-free form resolves to a role (name is no
    // privilege) and admin option revokes without removing membership
    h.sql("REVOKE ADMIN OPTION FOR analyst FROM USER dana")
    assert(lines(h, "SHOW ROLE GRANT USER dana") === Seq(
      "analyst\tfalse\t-1\tadm", "public\tfalse\t-1\t"))
    // current roles: granted + public by default; SET ROLE narrows
    h.auth.currentUser = "dana"
    assert(lines(h, "SHOW CURRENT ROLES") === Seq("analyst", "public"))
    h.sql("SET ROLE analyst")
    assert(lines(h, "SHOW CURRENT ROLES") === Seq("analyst"))
    h.sql("SET ROLE NONE")
    assert(lines(h, "SHOW CURRENT ROLES").isEmpty)
    h.sql("SET ROLE ALL")
    assert(lines(h, "SHOW CURRENT ROLES") === Seq("analyst", "public"))
    // transitive membership: a role granted TO analyst activates too
    h.auth.currentUser = "adm"
    h.sql("CREATE ROLE nested")
    h.sql("GRANT ROLE nested TO ROLE analyst")
    h.auth.currentUser = "dana"
    assert(lines(h, "SHOW CURRENT ROLES") ===
      Seq("analyst", "nested", "public"))
    h.auth.currentUser = "adm"
    h.sql("DROP ROLE nested")
    h.auth.currentUser = "dana"
    h.auth.currentUser = "adm"
    h.sql("REVOKE ROLE analyst FROM USER dana")
    assert(lines(h, "SHOW ROLE GRANT USER dana") === Seq(
      "public\tfalse\t-1\t"))
    h.sql("DROP ROLE analyst")
    assert(lines(h, "SHOW ROLES") === Seq("admin", "public"))
  }

  test("REVOKE GRANT OPTION FOR keeps the privilege but clears the " +
      "option") {
    val h = new HiveStatements(spark)
    h.auth.currentUser = "og"
    h.sql("GRANT SELECT ON TABLE auth_t4 TO USER erin WITH GRANT OPTION")
    h.sql("REVOKE GRANT OPTION FOR SELECT ON TABLE auth_t4 FROM " +
      "USER erin")
    assert(lines(h, "SHOW GRANT USER erin ON TABLE auth_t4") === Seq(
      "default\tauth_t4\t\t\terin\tUSER\tSELECT\tfalse\t-1\tog"))
  }

  test("partition-level privilege snapshots (legacy " +
      "PARTITION_LEVEL_PRIVILEGE): created partitions copy table " +
      "privs; table revoke leaves the copy; partition revoke and " +
      "rename edit only the copy") {
    val a = new AuthStore
    a.currentUser = "hive_test_user"
    a.expandAll = false
    a.executeStatement(
      "grant select(key) on table auth_p to user hive_test_user",
      "default")
    a.partitionCreated("default", "auth_p", "2010")
    def part(q: String): Seq[String] =
      a.showLines(q, "default").get._2
    assert(part("show grant user hive_test_user on table " +
      "auth_p(key) partition (ds='2010')") === Seq(
      "default\tauth_p\t[2010]\t[key]\thive_test_user\tUSER\tSELECT" +
        "\tfalse\t-1\thive_test_user"))
    // table-level revoke: the partition COPY survives (the recorded
    // authorization_2 behavior)
    a.executeStatement("revoke select(key) on table auth_p from " +
      "user hive_test_user", "default")
    assert(part("show grant user hive_test_user on table auth_p(key)")
      .isEmpty)
    assert(part("show grant user hive_test_user on table " +
      "auth_p(key) partition (ds='2010')").nonEmpty)
    // rename re-keys the copy (alter_rename_partition_authorization)
    a.partitionRenamed("default", "auth_p", "2010", "2010_tmp")
    assert(part("show grant user hive_test_user on table " +
      "auth_p(key) partition (ds='2010_tmp')").nonEmpty)
    // partition-scoped revoke removes only the copy
    a.executeStatement("revoke select(key) on table auth_p " +
      "partition (ds='2010_tmp') from user hive_test_user", "default")
    assert(part("show grant user hive_test_user on table " +
      "auth_p(key) partition (ds='2010_tmp')").isEmpty)
  }

  test("the Connect path routes authorization statements as lazy " +
      "commands: plan() defers to execute() on RUN, SHOW GRANT " +
      "renders as a local relation") {
    val h = new HiveStatements(spark)
    h.auth.currentUser = "cxn"
    val p = h.plan("GRANT SELECT ON TABLE cxn_t TO USER frank")
    assert(p.isInstanceOf[graft.HiveStatementCommand], p.getClass)
    // nothing mutated at parse time (plan() is side-effect-free)
    assert(h.auth.grants.isEmpty)
    p.asInstanceOf[graft.HiveStatementCommand].run(spark)
    assert(h.auth.grants.size === 1)
    // SET ROLE must not fall through to Spark's SET conf grammar
    h.sql("CREATE ROLE cxr")
    h.sql("GRANT ROLE cxr TO USER cxn")
    val pr = h.plan("SET ROLE cxr")
    assert(pr.isInstanceOf[graft.HiveStatementCommand], pr.getClass)
    pr.asInstanceOf[graft.HiveStatementCommand].run(spark)
    assert(h.auth.currentRoles === Some(Seq("cxr")))
    // the read surface renders through metaQuery → plan() local rel
    val show = h.plan("SHOW GRANT USER frank ON TABLE cxn_t")
    assert(!show.isInstanceOf[graft.HiveStatementCommand])
  }

  test("owner grants pin their grantor at first auth use " +
      "(CreateTableAutomaticGrant captures the session user once)") {
    val a = new AuthStore
    a.expandAll = true
    a.currentUser = "hive_admin_user"
    a.executeStatement("set role admin", "default") // pins the grantor
    a.currentUser = "user1"
    a.ownerGrantsOnCreate("default", "t1", "user1",
      Seq("DELETE", "INSERT", "SELECT", "UPDATE"))
    val rows = a.showLines("show grant user user1 on table t1",
      "default").get._2
    assert(rows === Seq("DELETE", "INSERT", "SELECT", "UPDATE").map(p =>
      s"default\tt1\t\t\tuser1\tUSER\t$p\ttrue\t-1\thive_admin_user"))
  }
}
