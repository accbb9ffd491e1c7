package graft.plans

import graft.SparkSpec

/** Column lineage from the analyzed plan (LineageLogger analog).
  * The CTAS case asserts BYTE-EXACT parity with a line the reference
  * recorded (lineage2.q.out:8 — the `create table src2 as select`
  * statement), including the guava-md5 query hash and the
  * targets-then-sources vertex numbering.
  */
class ColumnLineageSpec extends SparkSpec {

  private def seed(): Unit = {
    import spark.implicits._
    Seq(("128", "val_128"), ("146", "val_146"), ("150", "val_150"))
      .toDF("key", "value").createOrReplaceTempView("src1")
  }

  test("CTAS lineage JSON matches the reference recording byte-exactly " +
      "(lineage2.q.out, create table src2 as select)") {
    seed()
    val queryText =
      "create table src2 as select key key2, value value2 from src1"
    val df = spark.sql("select key key2, value value2 from src1")
    val json = ColumnLineage.toJson(
      ColumnLineage.of(df, queryText, destTable = Some("default.src2")),
      engine = "mr")
    val recorded = "{\"version\":\"1.0\",\"engine\":\"mr\"," +
      "\"database\":\"default\"," +
      "\"hash\":\"3a39d46286e4c2cd2139c9bb248f7b4f\"," +
      "\"queryText\":\"create table src2 as select key key2, " +
      "value value2 from src1\"," +
      "\"edges\":[{\"sources\":[2],\"targets\":[0]," +
      "\"edgeType\":\"PROJECTION\"}," +
      "{\"sources\":[3],\"targets\":[1]," +
      "\"edgeType\":\"PROJECTION\"}]," +
      "\"vertices\":[" +
      "{\"id\":0,\"vertexType\":\"COLUMN\"," +
      "\"vertexId\":\"default.src2.key2\"}," +
      "{\"id\":1,\"vertexType\":\"COLUMN\"," +
      "\"vertexId\":\"default.src2.value2\"}," +
      "{\"id\":2,\"vertexType\":\"COLUMN\"," +
      "\"vertexId\":\"default.src1.key\"}," +
      "{\"id\":3,\"vertexType\":\"COLUMN\"," +
      "\"vertexId\":\"default.src1.value\"}]}"
    assert(json === recorded)
  }

  test("three more recorded hook lines match byte-exactly: CTAS " +
      "select-star (lineage2.q.out:34), INSERT select-star with " +
      "write-side target names (lineage2.q.out:39), nested-subquery " +
      "CTAS (lineage3.q.out)") {
    seed()
    import spark.implicits._
    Seq(("128", "val_128")).toDF("key2", "value2")
      .createOrReplaceTempView("src2")

    // lineage2.q.out:34
    val a = ColumnLineage.toJson(ColumnLineage.of(
      spark.sql("select * from src1"),
      "create table dest1 as select * from src1",
      destTable = Some("default.dest1")), engine = "mr")
    assert(a === "{\"version\":\"1.0\",\"engine\":\"mr\"," +
      "\"database\":\"default\"," +
      "\"hash\":\"712fe958c357bcfc978b95c43eb19084\"," +
      "\"queryText\":\"create table dest1 as select * from src1\"," +
      "\"edges\":[{\"sources\":[2],\"targets\":[0]," +
      "\"edgeType\":\"PROJECTION\"},{\"sources\":[3],\"targets\":[1]," +
      "\"edgeType\":\"PROJECTION\"}],\"vertices\":[" +
      "{\"id\":0,\"vertexType\":\"COLUMN\"," +
      "\"vertexId\":\"default.dest1.key\"}," +
      "{\"id\":1,\"vertexType\":\"COLUMN\"," +
      "\"vertexId\":\"default.dest1.value\"}," +
      "{\"id\":2,\"vertexType\":\"COLUMN\"," +
      "\"vertexId\":\"default.src1.key\"}," +
      "{\"id\":3,\"vertexType\":\"COLUMN\"," +
      "\"vertexId\":\"default.src1.value\"}]}")

    // lineage2.q.out:39 — INSERT names the DESTINATION's columns
    val b = ColumnLineage.toJson(ColumnLineage.of(
      spark.sql("select * from src2"),
      "insert into table dest1 select * from src2",
      destTable = Some("default.dest1"),
      destColumns = Some(Seq("key", "value"))), engine = "mr")
    assert(b === "{\"version\":\"1.0\",\"engine\":\"mr\"," +
      "\"database\":\"default\"," +
      "\"hash\":\"ecc718a966d8887b18084a55dd96f0bc\"," +
      "\"queryText\":\"insert into table dest1 select * from src2\"," +
      "\"edges\":[{\"sources\":[2],\"targets\":[0]," +
      "\"edgeType\":\"PROJECTION\"},{\"sources\":[3],\"targets\":[1]," +
      "\"edgeType\":\"PROJECTION\"}],\"vertices\":[" +
      "{\"id\":0,\"vertexType\":\"COLUMN\"," +
      "\"vertexId\":\"default.dest1.key\"}," +
      "{\"id\":1,\"vertexType\":\"COLUMN\"," +
      "\"vertexId\":\"default.dest1.value\"}," +
      "{\"id\":2,\"vertexType\":\"COLUMN\"," +
      "\"vertexId\":\"default.src2.key2\"}," +
      "{\"id\":3,\"vertexType\":\"COLUMN\"," +
      "\"vertexId\":\"default.src2.value2\"}]}")

    // lineage3.q.out — derived-subquery aliases (v1/v2) are NOT table
    // boundaries; the source stays default.src1.key through two
    // nesting levels and a LIMIT
    val cText = "create table t as\nselect * from\n" +
      "  (select * from\n     (select key from src1 limit 1) v1) v2"
    val c = ColumnLineage.toJson(ColumnLineage.of(
      spark.sql("select * from\n  (select * from\n" +
        "     (select key from src1 limit 1) v1) v2"),
      cText, destTable = Some("default.t")), engine = "mr")
    assert(c === "{\"version\":\"1.0\",\"engine\":\"mr\"," +
      "\"database\":\"default\"," +
      "\"hash\":\"761b3a1f405d8e719d3f0c9147b57a23\"," +
      "\"queryText\":\"create table t as\\nselect * from\\n" +
      "  (select * from\\n     (select key from src1 limit 1) v1) " +
      "v2\",\"edges\":[{\"sources\":[1],\"targets\":[0]," +
      "\"edgeType\":\"PROJECTION\"}],\"vertices\":[" +
      "{\"id\":0,\"vertexType\":\"COLUMN\"," +
      "\"vertexId\":\"default.t.key\"}," +
      "{\"id\":1,\"vertexType\":\"COLUMN\"," +
      "\"vertexId\":\"default.src1.key\"}]}")
  }

  test("filters and join conditions become PREDICATE edges targeting " +
      "every output column; aggregates carry substituted expressions") {
    seed()
    val df = spark.sql(
      "select key, count(value) as n from src1 " +
        "where key > '100' group by key")
    val l = ColumnLineage.of(df, "q")
    val proj = l.edges.filter(_.edgeType == "PROJECTION")
    assert(proj.exists(e => e.targets == Seq("key") &&
      e.sources == Seq("default.src1.key") && e.expression.isEmpty), l)
    assert(proj.exists(e => e.targets == Seq("n") &&
      e.sources == Seq("default.src1.value") &&
      e.expression.exists(_.contains("count(default.src1.value)"))), l)
    val pred = l.edges.filter(_.edgeType == "PREDICATE")
    assert(pred.length === 1, l)
    assert(pred.head.targets === Seq("key", "n"))
    assert(pred.head.sources === Seq("default.src1.key"))
    assert(pred.head.expression.exists(_.contains("default.src1.key")))
    // vertex numbering: targets first, then sources
    assert(l.vertices.take(2) === Seq("key", "n"))
  }

  test("aliases over base tables keep the TABLE as the source and " +
      "join edges record both sides") {
    seed()
    import spark.implicits._
    Seq(("128", 1), ("146", 2)).toDF("key", "n")
      .createOrReplaceTempView("src2l")
    val df = spark.sql(
      "select a.value, b.n from src1 a join src2l b on a.key = b.key")
    val l = ColumnLineage.of(df, "q")
    val proj = l.edges.filter(_.edgeType == "PROJECTION")
    assert(proj.exists(_.sources == Seq("default.src1.value")), l)
    assert(proj.exists(_.sources == Seq("default.src2l.n")), l)
    val pred = l.edges.filter(_.edgeType == "PREDICATE")
    assert(pred.exists(e =>
      e.sources.toSet == Set("default.src1.key", "default.src2l.key")),
      l)
  }

  test("EXPLAIN LINEAGE serves the hook JSON through the public " +
      "dialect entry (SELECT and CTAS forms)") {
    seed()
    val h = new graft.HiveStatements(spark)
    val sel = h.sql("EXPLAIN LINEAGE select key from src1 " +
      "where value = 'val_146'").get.collect().head.getString(0)
    assert(sel.contains("\"edges\":["), sel)
    assert(sel.contains("\"vertexId\":\"default.src1.key\""), sel)
    assert(sel.contains("\"edgeType\":\"PREDICATE\""), sel)
    assert(sel.contains(
      "\"hash\":\"" + ColumnLineage.queryHash(
        "select key from src1 where value = 'val_146'") + "\""), sel)
    val ctas = h.sql("EXPLAIN LINEAGE create table dst_l as " +
      "select key key2 from src1").get.collect().head.getString(0)
    assert(ctas.contains("\"vertexId\":\"default.dst_l.key2\""), ctas)
  }

  test("union output columns depend on every branch; duplicate " +
      "conditions record once (reference addEdge merge)") {
    seed()
    val df = spark.sql(
      "select key from src1 where key > '1' union all " +
        "select value from src1 where key > '1'")
    val l = ColumnLineage.of(df, "q")
    val proj = l.edges.filter(_.edgeType == "PROJECTION")
    assert(proj.exists(e => e.sources.toSet ==
      Set("default.src1.key", "default.src1.value")), l)
    assert(l.edges.count(_.edgeType == "PREDICATE") === 1, l)
  }
}
