package graft.plans

import graft.SparkSpec

/** Hive's comparison-class coercion for IN: string-vs-numeric
  * compares as DOUBLE on both sides (ref ql/exec/FunctionRegistry
  * .java getCommonClassForComparison), where Spark's InConversion
  * widens to STRING. Covers both literal-list directions (HiveCasts)
  * and the subquery form (HiveInSubqueryCoercion).
  */
class HiveCoercionSpec extends SparkSpec {

  private def one(q: String): Boolean =
    spark.sql(s"select $q").head().getBoolean(0)

  test("string IN (numeric operands) compares as double — both " +
      "directions, decimals included") {
    assert(one("'146.0' in (146.0, 150)"))       // string vs decimal
    assert(one("'146' in (146.0)"))              // equal after coercion
    assert(one("'146.0' in (cast(146 as int), cast(9 as int))"))
    assert(!one("'147' in (146.0, 150)"))
    // numeric IN (string literals): the long-standing mirror
    assert(one("146.0 in ('146.0')"))
    // a USER-written cast keeps the STRING compare, as in Hive: the
    // cast renders the normalized "146" (HiveDecimal.toString), which
    // string-matches '146' but NOT '146.0' — a double compare would
    // wrongly match both
    assert(one("cast(146.0 as string) in ('146')"))
    assert(!one("cast(146.0 as string) in ('146.0')"))
  }

  test("string IN (numeric subquery) compares as double (lineage3's " +
      "key in (select key+18) shape)") {
    import spark.implicits._
    Seq("128", "146", "150").toDF("key")
      .createOrReplaceTempView("coerce_src")
    val got = spark.sql(
      "select key from coerce_src " +
        "where key in (select key + 18 from coerce_src) order by key")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("146")) // 128+18 = 146.0 matches string "146"
    // NOT IN keeps the same comparison class
    val anti = spark.sql(
      "select key from coerce_src " +
        "where key not in (select key + 18 from coerce_src) " +
        "order by key").collect().map(_.getString(0)).toSeq
    assert(anti === Seq("128", "150"))
  }
}
