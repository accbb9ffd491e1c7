package graft

/** Conf-gated authorization ENFORCEMENT
  * (`spark.graft.authorization=true`): deny without grant, allow
  * after grant, role inheritance, ownership rules, admin bypass —
  * with denial messages byte-identical to the reference's recorded
  * clientnegative outputs (read from the reference tree at test
  * time, not copied). */
class AuthEnforcementSpec extends SparkSpec {

  private val negDir =
    "/root/reference/ql/src/test/results/clientnegative"

  /** The recorded `FAILED: HiveAccessControlException <msg>` line of
    * a clientnegative golden, minus the CLI prefix. */
  private def recordedDenial(file: String): String = {
    val src = scala.io.Source.fromFile(s"$negDir/$file", "UTF-8")
    try src.getLines()
      .filter(_.startsWith("FAILED: HiveAccessControlException "))
      .toSeq.last.stripPrefix("FAILED: HiveAccessControlException ")
    finally src.close()
  }

  private def fresh(names: String*): Unit = names.foreach { n =>
    spark.sql(s"DROP TABLE IF EXISTS $n")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    val d = new java.io.File("spark-warehouse/" + n)
    if (d.exists()) rm(d)
  }

  private def withEnforcement(body: HiveStatements => Unit): Unit = {
    spark.conf.set("spark.graft.authorization", "true")
    try body(new HiveStatements(spark))
    finally spark.conf.unset("spark.graft.authorization")
  }

  private def denialOf(h: HiveStatements, q: String): String =
    intercept[AuthEnforcement.HiveAccessControlException](h.sql(q))
      .getMessage

  test("SELECT without privilege denies with the reference's " +
      "recorded message (authorization_select.q.out, byte-identical)") {
    withEnforcement { h =>
      fresh("t1")
      h.sql("create table t1(i int)")
      h.sql("set user.name=user1")
      assert(denialOf(h, "select * from t1") ===
        recordedDenial("authorization_select.q.out"))
      fresh("t1")
    }
  }

  test("INSERT without privilege denies with action=INSERT " +
      "(authorization_insert_noinspriv.q.out, byte-identical); the " +
      "inserting user's OWN table passes its SELECT check via owner " +
      "grants") {
    withEnforcement { h =>
      fresh("t1", "user2tab")
      h.sql("create table t1(i int)")
      h.sql("set user.name=user1")
      h.sql("create table user2tab(i int)")
      assert(denialOf(h, "insert into table t1 select * from user2tab")
        === recordedDenial("authorization_insert_noinspriv.q.out"))
      fresh("t1", "user2tab")
    }
  }

  test("DROP PARTITION without DELETE denies as ALTERTABLE_DROPPARTS " +
      "(authorization_droppartition.q.out, byte-identical); the owner " +
      "may ADD the partition first") {
    withEnforcement { h =>
      fresh("tpart")
      h.sql("create table tpart(i int, j int) partitioned by (k string)")
      h.sql("alter table tpart add partition (k = 'abc')")
      h.sql("set user.name=user1")
      assert(denialOf(h, "alter table tpart drop partition (k = 'abc')")
        === recordedDenial("authorization_droppartition.q.out"))
      fresh("tpart")
    }
  }

  test("DROP TABLE by a non-owner denies with OBJECT OWNERSHIP " +
      "(authorization_not_owner_drop_tab.q.out, byte-identical)") {
    withEnforcement { h =>
      fresh("t1")
      h.sql("set user.name=user1")
      h.sql("create table t1(i int)")
      h.sql("set user.name=user2")
      assert(denialOf(h, "drop table t1") ===
        recordedDenial("authorization_not_owner_drop_tab.q.out"))
      h.sql("set user.name=user1")
      h.sql("drop table t1") // the owner may
      fresh("t1")
    }
  }

  test("allow after grant, re-deny after revoke") {
    withEnforcement { h =>
      fresh("ga_t")
      h.sql("create table ga_t(i int)")
      h.sql("insert into ga_t values (7)")
      h.sql("set user.name=user1")
      intercept[AuthEnforcement.HiveAccessControlException](
        h.sql("select * from ga_t"))
      h.sql("set user.name=hive_test_user")
      h.sql("grant select on table ga_t to user user1")
      h.sql("set user.name=user1")
      val got = h.sql("select i from ga_t").get.collect().map(_.getInt(0))
      assert(got.toSeq === Seq(7))
      // SELECT alone does not confer INSERT
      intercept[AuthEnforcement.HiveAccessControlException](
        h.sql("insert into ga_t values (8)"))
      h.sql("set user.name=hive_test_user")
      h.sql("revoke select on table ga_t from user user1")
      h.sql("set user.name=user1")
      intercept[AuthEnforcement.HiveAccessControlException](
        h.sql("select * from ga_t"))
      h.sql("set user.name=hive_test_user")
      fresh("ga_t")
    }
  }

  test("role inheritance: a privilege granted to a role reaches its " +
      "members, transitively through role-to-role grants") {
    withEnforcement { h =>
      fresh("role_t")
      h.sql("create table role_t(i int)")
      h.sql("insert into role_t values (3)")
      h.sql("create role readers")
      h.sql("create role analysts")
      h.sql("grant select on table role_t to role readers")
      // analysts ⊂ readers; user3 ∈ analysts
      h.sql("grant role readers to role analysts")
      h.sql("grant role analysts to user user3")
      h.sql("set user.name=user3")
      assert(h.sql("select i from role_t").get.collect()
        .map(_.getInt(0)).toSeq === Seq(3))
      h.sql("set user.name=user4") // not a member
      intercept[AuthEnforcement.HiveAccessControlException](
        h.sql("select * from role_t"))
      h.sql("set user.name=hive_test_user")
      h.sql("drop role readers")
      h.sql("drop role analysts")
      fresh("role_t")
    }
  }

  test("SET ROLE admin bypasses checks; dropping the role set " +
      "re-enables them") {
    withEnforcement { h =>
      fresh("adm_t")
      h.sql("create table adm_t(i int)")
      h.sql("set user.name=user9")
      intercept[AuthEnforcement.HiveAccessControlException](
        h.sql("select * from adm_t"))
      h.sql("set role admin")
      assert(h.sql("select * from adm_t").get.collect().length === 0)
      h.sql("set role none")
      intercept[AuthEnforcement.HiveAccessControlException](
        h.sql("select * from adm_t"))
      h.sql("set user.name=hive_test_user")
      fresh("adm_t")
    }
  }

  test("enforcement stays fully off without the conf — the " +
      "bookkeeping surface is unchanged for every existing caller") {
    val h = new HiveStatements(spark)
    fresh("off_t")
    h.sql("create table off_t(i int)")
    h.sql("set user.name=nobody")
    // no exception: enforcement dormant
    assert(h.sql("select * from off_t").get.collect().length === 0)
    h.sql("set user.name=hive_test_user")
    fresh("off_t")
  }
}
