package graft.meta

import graft.{HiveStatements, SparkSpec}

/** Informational PK/FK constraint bookkeeping
  * (`PRIMARY KEY ... DISABLE NOVALIDATE`, `FOREIGN KEY ... REFERENCES`):
  * parsed at CREATE/ALTER, stripped before Spark sees the DDL,
  * rendered by DESCRIBE FORMATTED/EXTENDED in the reference's
  * `# Constraints` layout (MetaDataFormatUtils.java:278-301,
  * create_with_constraints.q.out), persisted through the ledger. */
class ConstraintsSpec extends SparkSpec {

  private def fresh(names: String*): Unit = names.foreach { n =>
    spark.sql(s"DROP TABLE IF EXISTS $n")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    val d = new java.io.File("spark-warehouse/" + n)
    if (d.exists()) rm(d)
  }

  private def rows(h: HiveStatements, q: String): Seq[String] =
    h.sql(q).get.collect().map(_.toSeq.map {
      case null => ""
      case v => v.toString
    }.mkString("|")).toSeq

  test("CREATE with named PK + FK parses the clauses, strips them " +
      "from the Spark DDL, and DESCRIBE FORMATTED renders the " +
      "reference's # Constraints block") {
    val h = new HiveStatements(spark)
    fresh("ctab1", "ctab2")
    h.sql("CREATE TABLE ctab1 (a STRING, b STRING, " +
      "constraint pk1 primary key (a) disable novalidate)")
    h.sql("CREATE TABLE ctab2 (x STRING, y STRING, " +
      "PRIMARY KEY (x) disable novalidate, " +
      "CONSTRAINT fk1 FOREIGN KEY (x) REFERENCES ctab1(a) " +
      "DISABLE NOVALIDATE, " +
      "CONSTRAINT fk2 FOREIGN KEY (y) REFERENCES ctab1(b) " +
      "DISABLE NOVALIDATE)")
    // the stripped DDL really created working tables
    h.sql("INSERT INTO ctab1 VALUES ('k','v')")
    assert(spark.table("ctab2").columns.toSeq === Seq("x", "y"))

    val d1 = rows(h, "DESCRIBE FORMATTED ctab1")
    val i1 = d1.indexOf("# Constraints||")
    assert(i1 > 0, d1.mkString("\n"))
    assert(d1.slice(i1 + 1, i1 + 6) === Seq(
      "||",
      "# Primary Key||",
      "Table:|default.ctab1|",
      "Constraint Name:|pk1|",
      "Column Names:|a|"))

    val d2 = rows(h, "DESCRIBE FORMATTED ctab2")
    val i2 = d2.indexOf("# Foreign Keys||")
    assert(i2 > 0, d2.mkString("\n"))
    assert(d2.slice(i2 + 1, i2 + 7) === Seq(
      "Table:|default.ctab2|",
      "Constraint Name:|fk1|",
      "Parent Column Name:default.ctab1.a|Column Name:x|Key Sequence:1",
      "||",
      "Constraint Name:|fk2|",
      "Parent Column Name:default.ctab1.b|Column Name:y|Key Sequence:1"))
    fresh("ctab1", "ctab2")
  }

  test("DESCRIBE EXTENDED renders the Constraints summary rows " +
      "(PrimaryKeyInfo/ForeignKeyInfo toString layout)") {
    val h = new HiveStatements(spark)
    fresh("cext1", "cext2")
    h.sql("CREATE TABLE cext1 (a STRING, b STRING, " +
      "constraint pke primary key (a, b) disable novalidate)")
    h.sql("CREATE TABLE cext2 (x STRING, " +
      "constraint pkx primary key (x) disable novalidate, " +
      "CONSTRAINT fke FOREIGN KEY (x) REFERENCES cext1(a) " +
      "DISABLE NOVALIDATE)")
    val d1 = rows(h, "DESCRIBE EXTENDED cext1")
    assert(d1.contains("Constraints|Primary Key for default.cext1:" +
      "[a,b], Constraint Name: pke|"), d1.mkString("\n"))
    val d2 = rows(h, "DESCRIBE EXTENDED cext2")
    assert(d2.contains("Foreign Keys for default.cext2:[ " +
      "{Constraint Name: fke, (Parent Column Name: default.cext1.a, " +
      "Column Name: x, Key Sequence: 1)}]||"), d2.mkString("\n"))
    // plain DESCRIBE shows no constraint rows
    assert(!rows(h, "DESCRIBE cext1").exists(_.startsWith("Constraints")))
    fresh("cext1", "cext2")
  }

  test("ALTER TABLE DROP CONSTRAINT removes it; ADD CONSTRAINT " +
      "brings it back — metadata-only statements that don't reach " +
      "Spark's grammar") {
    val h = new HiveStatements(spark)
    fresh("calt")
    h.sql("CREATE TABLE calt (a STRING, " +
      "constraint pka primary key (a) disable novalidate)")
    assert(rows(h, "DESCRIBE FORMATTED calt")
      .contains("Constraint Name:|pka|"))
    h.sql("ALTER TABLE calt DROP CONSTRAINT pka")
    assert(!rows(h, "DESCRIBE FORMATTED calt")
      .exists(_.contains("# Constraints")))
    h.sql("ALTER TABLE calt ADD CONSTRAINT pkb primary key (a) " +
      "disable novalidate")
    fresh("calt2")
    h.sql("CREATE TABLE calt2 (z STRING, " +
      "constraint pkz primary key (z) disable novalidate)")
    h.sql("ALTER TABLE calt ADD CONSTRAINT fkb FOREIGN KEY (a) " +
      "REFERENCES calt2(z) DISABLE NOVALIDATE RELY")
    val d = rows(h, "DESCRIBE FORMATTED calt")
    assert(d.contains("Constraint Name:|pkb|"))
    assert(d.contains(
      "Parent Column Name:default.calt2.z|Column Name:a|Key Sequence:1"))
    // the metastore's FK listing joins to the PARENT's PK: dropping
    // it hides the FK, re-adding brings it back (the recorded
    // create_with_constraints table6/table2 behavior)
    h.sql("ALTER TABLE calt2 DROP CONSTRAINT pkz")
    assert(!rows(h, "DESCRIBE FORMATTED calt")
      .exists(_.contains("fkb")))
    h.sql("ALTER TABLE calt2 ADD CONSTRAINT pkz2 primary key (z) " +
      "disable novalidate")
    assert(rows(h, "DESCRIBE FORMATTED calt")
      .contains("Constraint Name:|fkb|"))
    fresh("calt", "calt2")
  }

  test("constraints survive restart through the metastore ledger") {
    val base = java.nio.file.Files.createTempDirectory("graft_cns")
    spark.conf.set("spark.graft.metastore.path", s"$base/ms.ledger")
    try {
      val h1 = new HiveStatements(spark)
      fresh("cper", "cparent")
      h1.sql("CREATE TABLE cparent (pb STRING, " +
        "constraint pkq primary key (pb) disable novalidate)")
      h1.sql("CREATE TABLE cper (a STRING, b STRING, " +
        "constraint pkp primary key (a) disable novalidate, " +
        "constraint fkp foreign key (b) references cparent(pb) " +
        "disable novalidate)")
      val before = rows(h1, "DESCRIBE FORMATTED cper")
      val h2 = new HiveStatements(spark)
      assert(rows(h2, "DESCRIBE FORMATTED cper") === before)
      assert(h2.meta.primaryKeys("cper") === (("pkp", Seq("a"))))
      assert(h2.meta.foreignKeys("cper") ===
        Vector(("fkp", "default.cparent", Seq(("pb", "b")))))
      fresh("cper", "cparent")
    } finally spark.conf.unset("spark.graft.metastore.path")
  }

  test("every create_with_constraints.q CREATE statement parses: " +
      "multi-column keys, RELY/NORELY, unnamed constraints get " +
      "generated names") {
    val h = new HiveStatements(spark)
    val names = (1 to 11).map(i => s"cwtable$i")
    fresh(names: _*)
    def c(i: Int, ddl: String): Unit = h.sql(ddl)
    c(1, "CREATE TABLE cwtable1 (a STRING, b STRING, primary key (a) disable novalidate)")
    c(2, "CREATE TABLE cwtable2 (a STRING, b STRING, constraint pk1 primary key (a) disable novalidate)")
    c(3, "CREATE TABLE cwtable3 (x string, PRIMARY KEY (x) disable novalidate, CONSTRAINT fk1 FOREIGN KEY (x) REFERENCES cwtable2(a)  DISABLE NOVALIDATE)")
    c(9, "CREATE TABLE cwtable9 (a STRING, b STRING, primary key (a, b) disable novalidate rely)")
    c(10, "CREATE TABLE cwtable10 (a STRING, b STRING, constraint pk10 primary key (a) disable novalidate norely, foreign key (a, b) references cwtable9(a, b) disable novalidate)")
    assert(h.meta.primaryKeys("cwtable1")._2 === Seq("a"))
    assert(h.meta.primaryKeys("cwtable1")._1.startsWith("pk_"))
    assert(h.meta.primaryKeys("cwtable9")._2 === Seq("a", "b"))
    val fk10 = h.meta.foreignKeys("cwtable10").head
    assert(fk10._2 === "default.cwtable9")
    assert(fk10._3 === Seq(("a", "a"), ("b", "b")))
    assert(fk10._1.startsWith("fk_"))
    // all created as real Spark tables with only the data columns
    assert(spark.table("cwtable10").columns.toSeq === Seq("a", "b"))
    fresh(names: _*)
  }
}
