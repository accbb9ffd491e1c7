package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("weighted_avg matches hand computation, SQL-callable, partial-merge safe") {
    val df = Seq((1.0, 1.0), (3.0, 3.0)).toDF("v", "w")
    df.createOrReplaceTempView("wa_t")
    // (1*1 + 3*3) / (1+3) = 2.5
    val viaSql = spark.sql("SELECT weighted_avg(v, w) AS a FROM wa_t")
      .head().getDouble(0)
    assert(viaSql === 2.5)
    // many partitions -> exercises partial/final merge
    val big = spark.range(0, 10000, 1, 8)
      .select(col("id").cast("double").as("v"), lit(1.0).as("w"))
    big.createOrReplaceTempView("wa_big")
    val m = spark.sql("SELECT weighted_avg(v, w) FROM wa_big")
      .head().getDouble(0)
    assert(m === 4999.5)
  }

  test("TopKStrings aggregator: exact counts, deterministic order") {
    val agg = new Aggregators.TopKStrings(2).toColumn
    val ds = Seq("a", "b", "a", "c", "a", "b").toDS()
    val got = ds.select(agg).head()
    assert(got === Seq(("a", 3L), ("b", 2L)))
  }

  test("TopKStrings respects buffer cap while keeping heavy hitters") {
    val agg = new Aggregators.TopKStrings(3, cap = 5).toColumn
    val data = (1 to 200).flatMap(i => Seq.fill(5)("hot" + (i % 3))) ++
      (1 to 50).map(i => "cold" + i)
    val got = spark.createDataset(data).select(agg).head()
    assert(got.map(_._1).toSet === Set("hot0", "hot1", "hot2"))
  }
}
