package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format parity (SURVEY.md §1.3 serdes): the reference reads
  * delimited text (LazySimpleSerDe), CSV (OpenCSVSerde), JSON
  * (DelimitedJSONSerDe), regex text (RegexSerDe), ORC and Parquet; our
  * engine maps each to a Spark reader with explicit schema (schema-on-read,
  * never inferSchema — SURVEY.md §1.1). Avro: own connector, see
  * AvroSourceSpec. RCFile: no connector in this Spark distribution,
  * declared out of scope.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sample = spark.read.parquet(s"$sfDir/customer.parquet")
    .select("c_custkey", "c_name", "c_acctbal").orderBy("c_custkey").limit(50)

  private val schema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_acctbal", DoubleType)))

  private def roundTrip(fmt: String): Unit = {
    val p = s"${Files.createTempDirectory("graft_src")}/$fmt"
    sample.write.format(fmt).option("header", "true").save(p)
    val back = spark.read.format(fmt).option("header", "true")
      .schema(schema).load(p)
    assert(back.orderBy("c_custkey").collect().toSeq ===
      sample.collect().toSeq, s"$fmt round-trip")
  }

  test("csv round-trip with explicit schema")(roundTrip("csv"))
  test("json round-trip with explicit schema")(roundTrip("json"))
  test("orc round-trip with explicit schema")(roundTrip("orc"))

  test("regex-over-text source (RegexSerDe equivalent)") {
    val p = s"${Files.createTempDirectory("graft_src")}/rx"
    sample.select(concat(col("c_custkey"), lit(":"), col("c_name"))
      .as("value")).write.text(p)
    val parsed = spark.read.text(p).select(
      regexp_extract(col("value"), "^([0-9]+):(.*)$", 1).cast("long")
        .as("c_custkey"),
      regexp_extract(col("value"), "^([0-9]+):(.*)$", 2).as("c_name"))
    assert(parsed.orderBy("c_custkey").select("c_name").as[String]
      .collect().toSeq ===
      sample.select("c_name").as[String].collect().toSeq)
  }

  test("delimited text source (LazySimpleSerDe equivalent)") {
    val p = s"${Files.createTempDirectory("graft_src")}/delim"
    sample.select(concat_ws("", col("c_custkey"), col("c_name"),
      col("c_acctbal"))).write.text(p)
    val cols = split(col("value"), "")
    val parsed = spark.read.text(p).select(
      cols.getItem(0).cast("long").as("c_custkey"),
      cols.getItem(1).as("c_name"),
      cols.getItem(2).cast("double").as("c_acctbal"))
    assert(parsed.orderBy("c_custkey").collect().toSeq ===
      sample.collect().toSeq)
  }

  test("parquet schema evolution: added columns merge, old rows go null") {
    // Hive parquet tables evolve by ALTER TABLE ADD COLUMNS; readers
    // see the union schema with nulls for pre-evolution files
    val p = s"${Files.createTempDirectory("graft_src")}/evo"
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$p/part=1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "w").write.parquet(s"$p/part=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(p)
      .select("id", "v", "w").orderBy("id")
    assert(merged.columns.toSeq === Seq("id", "v", "w"))
    val rows = merged.collect()
    assert(rows(0).isNullAt(2)) // pre-evolution file: null w
    assert(rows(1).getDouble(2) === 9.5)
  }

  test("compression codecs round-trip (gzip, snappy, zstd)") {
    for ((codec, ext) <- Seq("gzip" -> "gz", "snappy" -> "snappy",
        "zstd" -> "zstd")) {
      val p = s"${Files.createTempDirectory("graft_src")}/$codec"
      sample.write.option("compression", codec).parquet(p)
      assert(spark.read.parquet(p).orderBy("c_custkey").collect().toSeq
        === sample.collect().toSeq, s"codec $codec")
      assert(new java.io.File(p).listFiles()
        .exists(_.getName.contains(s".$ext.parquet")), s"$codec file ext")
    }
  }

  test("Hive \\N null-string convention on delimited text") {
    // LazySimpleSerDe writes NULL as \N (serdeConstants: the default
    // serialization.null.format); the CSV reader's nullValue option
    // reproduces it both ways
    val p = s"${Files.createTempDirectory("graft_src")}/nulls"
    Seq((1L, Some("x")), (2L, None)).toDF("id", "v")
      .write.option("nullValue", "\\N").option("delimiter", "\t").csv(p)
    val txt = spark.read.text(p).as[String].collect().sorted
    assert(txt.exists(_.endsWith("\\N")), txt.mkString("|"))
    val back = spark.read.option("nullValue", "\\N").option("delimiter", "\t")
      .schema(StructType(Seq(StructField("id", LongType),
        StructField("v", StringType)))).csv(p)
      .orderBy("id").collect()
    assert(back(0).getString(1) === "x" && back(1).isNullAt(1))
  }

  test("jdbc source round-trips and pushes predicates (jdbc-handler " +
      "equivalent, ref jdbc-handler/src/.../JdbcStorageHandler.java)") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    sample.write.mode("overwrite").jdbc(url, "CUST", props)
    val back = spark.read.jdbc(url, "CUST", props)
    assert(back.orderBy("c_custkey").collect().toSeq ===
      sample.collect().toSeq)
    // predicate pushdown reaches the external store (Hive's handler
    // does the same via JdbcInputFormat split conditions)
    val q = back.filter(col("c_acctbal") > 0).select("c_custkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("c_acctbal"),
      plan.linesIterator.filter(_.contains("Pushed")).mkString)
  }

  test("parquet scan prunes columns and pushes filters") {
    val q = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      scan.linesIterator.filter(_.contains("PushedFilters")).mkString)
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      scan.linesIterator.filter(_.contains("ReadSchema")).mkString)
  }
}
