package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pinned against the reference's clientpositive/uniquejoin.q
  * committed goldens (T1/T2/T3 fixtures from data/files/T{1,2,3}.txt).
  */
class UniqueJoinSpec extends SparkSpec {
  import spark.implicits._
  import UniqueJoin.{Side, uniqueJoin}

  private lazy val t1 = Seq(("1", "11"), ("2", "12"), ("3", "13"),
    ("7", "17"), ("8", "18"), ("8", "28")).toDF("key", "val")
  private lazy val t2 = Seq(("2", "22"), ("3", "13"), ("4", "14"),
    ("5", "15"), ("8", "18"), ("8", "18")).toDF("key", "val")
  private lazy val t3 = Seq(("2", "12"), ("4", "14"), ("6", "16"),
    ("7", "17")).toDF("key", "val")

  private def keys(r: org.apache.spark.sql.Row): (String, String, String) =
    (0 to 2).map(i => if (r.isNullAt(i)) "NULL" else r.getString(i)) match {
      case Seq(a, b, c) => (a, b, c)
    }

  test("all PRESERVE: union of keys, cross product per key (golden)") {
    val got = uniqueJoin(Seq(
        Side(t1, Seq(col("key")), preserve = true),
        Side(t2, Seq(col("key")), preserve = true),
        Side(t3, Seq(col("key")), preserve = true)),
      Seq("a", "b", "c"))
      .select("a_key", "b_key", "c_key")
      .collect().map(keys).sortBy(t => t.toString)
    assert(got.toSeq === Seq(
      ("1", "NULL", "NULL"), ("2", "2", "2"), ("3", "3", "NULL"),
      ("7", "NULL", "7"),
      ("8", "8", "NULL"), ("8", "8", "NULL"),
      ("8", "8", "NULL"), ("8", "8", "NULL"),
      ("NULL", "4", "4"), ("NULL", "5", "NULL"),
      ("NULL", "NULL", "6")).sortBy(t => t.toString))
  }

  test("no PRESERVE degenerates to the inner key intersection (golden)") {
    val got = uniqueJoin(Seq(
        Side(t1, Seq(col("key")), preserve = false),
        Side(t2, Seq(col("key")), preserve = false),
        Side(t3, Seq(col("key")), preserve = false)),
      Seq("a", "b", "c"))
      .select("a_key", "b_key", "c_key").collect().map(keys).toSeq
    assert(got === Seq(("2", "2", "2")))
  }

  test("key EXPRESSIONS align sides (b.key - 1 golden)") {
    val got = uniqueJoin(Seq(
        Side(t1, Seq(col("key")), preserve = false),
        Side(t2, Seq((col("key").cast("int") - 1).cast("string")),
          preserve = false),
        Side(t3, Seq(col("key")), preserve = false)),
      Seq("a", "b", "c"))
      .select("a_key", "b_key", "c_key")
      .collect().map(keys).sortBy(_.toString)
    assert(got.toSeq === Seq(
      ("2", "3", "2"), ("7", "8", "7"), ("7", "8", "7")).sortBy(_.toString))
  }

  test("mixed PRESERVE keeps only keys in a preserved side or in all (golden)") {
    val got = uniqueJoin(Seq(
        Side(t1, Seq(col("key")), preserve = true),
        Side(t2, Seq(col("key")), preserve = false),
        Side(t3, Seq(col("key")), preserve = true)),
      Seq("a", "b", "c"))
      .select("a_key", "b_key", "c_key")
      .collect().map(keys).sortBy(_.toString)
    // key 5 (only in the non-preserved side) is dropped
    assert(got.toSeq === Seq(
      ("1", "NULL", "NULL"), ("2", "2", "2"), ("3", "3", "NULL"),
      ("7", "NULL", "7"),
      ("8", "8", "NULL"), ("8", "8", "NULL"),
      ("8", "8", "NULL"), ("8", "8", "NULL"),
      ("NULL", "4", "4"), ("NULL", "NULL", "6")).sortBy(_.toString))
  }

  test("multi-column keys join on the full tuple (golden subset)") {
    val got = uniqueJoin(Seq(
        Side(t1, Seq(col("key"), col("val")), preserve = true),
        Side(t2, Seq(col("key"), col("val")), preserve = true)),
      Seq("a", "b"))
      .select("a_key", "a_val", "b_key", "b_val").collect()
    // (3,13) and (8,18) are the only shared (key,val) tuples; T2 holds
    // (8,18) twice, so that key tuple cross-products to two rows
    val both = got.filter(r => !r.isNullAt(0) && !r.isNullAt(2))
      .map(r => (r.getString(0), r.getString(1))).sorted
    assert(both.toSeq === Seq(("3", "13"), ("8", "18"), ("8", "18")))
    // 3 matched + 4 T1-only + 3 T2-only
    assert(got.length === 10)
  }
}
