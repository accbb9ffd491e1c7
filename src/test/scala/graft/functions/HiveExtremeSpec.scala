package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row

/** hive_min / hive_max (Hive MIN/MAX null ordering over complex
  * values — GenericUDAFMin.java:121 NullValueOption.MAXVALUE) and the
  * hive_var_* bit-exact variance family
  * (GenericUDAFVariance.java:206-266). */
class HiveExtremeSpec extends SparkSpec {

  test("hive_min treats nested nulls as MAXVALUE, hive_max as MINVALUE") {
    // min_structvalue.q golden semantics
    def one(sql: String): Row =
      spark.sql(sql).collect().head.getStruct(0)
    assert(one("select hive_min(a) from (select named_struct('f', 1) a " +
      "union all select named_struct('f', 2) " +
      "union all select named_struct('f', cast(null as int))) t")
      === Row(1))
    assert(one("select hive_max(a) from (select named_struct('f', 1) a " +
      "union all select named_struct('f', 2) " +
      "union all select named_struct('f', cast(null as int))) t")
      === Row(2))
    // first field decides even when the winner carries a null second
    assert(one("select hive_min(a) from (" +
      "select named_struct('f', 1, 'g', cast(null as int)) a " +
      "union all select named_struct('f', 2, 'g', 3) " +
      "union all select named_struct('f', 5, 'g', 4)) t")
      === Row(1, null))
    // a null FIRST field loses the min to any concrete value
    assert(one("select hive_min(a) from (" +
      "select named_struct('f', 1, 'g', 2) a " +
      "union all select named_struct('f', -2, 'g', 3) " +
      "union all select named_struct('f', cast(null as int), 'g', 1)) t")
      === Row(-2, 3))
  }

  test("hive_min/hive_max on arrays: element-wise then length") {
    val r = spark.sql("select hive_min(a), hive_max(a) from (" +
      "select array(1, 2) a union all select array(1) " +
      "union all select array(2)) t").collect().head
    assert(r.getSeq[Int](0) === Seq(1))
    assert(r.getSeq[Int](1) === Seq(2))
  }

  test("hive_var_pop replays Hive's stream arithmetic bit-for-bit") {
    // values chosen so Welford vs Hive's running-sum formula differ
    // in the last ulps; expected bits computed by replaying
    // GenericUDAFVariance.iterate in plain Scala
    val vals = Vector(238.0, 86.0, 311.0, 27.0, 165.0, 409.0, 255.0,
      278.0, 98.0, 484.0)
    var count = 0L; var sum = 0.0; var variance = 0.0
    vals.foreach { v =>
      count += 1; sum += v
      if (count > 1) {
        val t = count * v - sum
        variance += (t * t) / (count.toDouble * (count - 1))
      }
    }
    val expPop = variance / count
    val expSamp = variance / (count - 1)
    import spark.implicits._
    val df = spark.createDataset(vals)(org.apache.spark.sql.Encoders
      .scalaDouble).repartition(1).toDF("v")
    df.createOrReplaceTempView("hv_vals")
    val r = spark.sql("select hive_var_pop(v), hive_var_samp(v), " +
      "hive_stddev_pop(v), hive_stddev_samp(v) from hv_vals")
      .collect().head
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
      === java.lang.Double.doubleToLongBits(expPop))
    assert(java.lang.Double.doubleToLongBits(r.getDouble(1))
      === java.lang.Double.doubleToLongBits(expSamp))
    assert(r.getDouble(2) === math.sqrt(expPop))
    assert(r.getDouble(3) === math.sqrt(expSamp))
  }

  test("hive_var_* edge cases: empty, single row, string input") {
    val r = spark.sql("select hive_var_pop(v), hive_var_samp(v) from " +
      "(select cast(null as double) v) t where v is not null")
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    val one = spark.sql("select hive_var_pop(v), hive_var_samp(v) from " +
      "(select 5.0 v) t").collect().head
    assert(one.getDouble(0) === 0.0)
    // count==1 yields 0.0 for the sample variants too; only count==0
    // is null (GenericUDAFVarianceSample.java:78-88).
    assert(one.getDouble(1) === 0.0)
    // strings parse as doubles; unparseable rows are skipped
    val s = spark.sql("select hive_var_pop(v) from (select '2' v " +
      "union all select '4' union all select 'oops') t").collect().head
    assert(s.getDouble(0) === 1.0)
  }
}
