package graft.queries

import graft.Present._

import graft.Engine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational-core query inventory (SURVEY.md §2.3–§2.8): every join
  * variant, multi-phase aggregation, grouping sets/cube/rollup, window
  * functions, set operations, sort/limit/top-k — each as an idiomatic
  * DataFrame/Dataset plan (Catalyst picks SMJ/BHJ/partial-agg physical
  * strategies; the Hive operators they re-express are cited per query).
  *
  * Oracle-parity discipline: double-typed money columns are rescaled to
  * exact integer cents (`round(x*100) -> bigint`) before aggregation so
  * every SUM is order-independent integer arithmetic — bit-identical
  * whatever the partitioning/shuffle order, at any scale, and in DuckDB.
  */
object Relational {

  private def t(spark: SparkSession, dir: String): Map[String, DataFrame] =
    Engine.tables(spark, dir)

  /** round(x*100) as exact integer cents. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  // --------------------------------------------------------------------
  // Aggregation (ref: ql/exec/GroupByOperator.java:732 — hash+sort agg,
  // PARTIAL1/FINAL two-phase; Spark HashAggregate partial/final is the
  // direct equivalent and is chosen automatically).
  // --------------------------------------------------------------------

  /** TPC-H Q1 shape: the canonical two-phase aggregation. */
  def q1_agg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir)("lineitem")
    li.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        cents(col("l_quantity")).as("qc"),
        cents(col("l_extendedprice")).as("epc"),
        cents(col("l_discount")).as("dc"),
        cents(col("l_tax")).as("tc"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(col("qc")).cast("double") / 100).as("sum_qty"),
        (sum(col("epc")).cast("double") / 100).as("sum_base_price"),
        (sum(col("epc") * (lit(100) - col("dc"))).cast("double") / 10000)
          .as("sum_disc_price"),
        (sum(col("epc") * (lit(100) - col("dc")) * (lit(100) + col("tc")))
          .cast("double") / 1000000).as("sum_charge"),
        (sum(col("qc")).cast("double") / 100 / count(lit(1))).as("avg_qty"),
        (sum(col("epc")).cast("double") / 100 / count(lit(1))).as("avg_price"),
        (sum(col("dc")).cast("double") / 100 / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .presentSorted("l_returnflag", "l_linestatus")
  }

  val q1_agg_sql: String = """
    WITH l AS (
      SELECT l_returnflag, l_linestatus,
             CAST(round(l_quantity*100) AS BIGINT) AS qc,
             CAST(round(l_extendedprice*100) AS BIGINT) AS epc,
             CAST(round(l_discount*100) AS BIGINT) AS dc,
             CAST(round(l_tax*100) AS BIGINT) AS tc
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00')
    SELECT l_returnflag, l_linestatus,
           CAST(sum(qc) AS DOUBLE)/100 AS sum_qty,
           CAST(sum(epc) AS DOUBLE)/100 AS sum_base_price,
           CAST(sum(epc*(100-dc)) AS DOUBLE)/10000 AS sum_disc_price,
           CAST(sum(epc*(100-dc)*(100+tc)) AS DOUBLE)/1000000 AS sum_charge,
           CAST(sum(qc) AS DOUBLE)/100/count(*) AS avg_qty,
           CAST(sum(epc) AS DOUBLE)/100/count(*) AS avg_price,
           CAST(sum(dc) AS DOUBLE)/100/count(*) AS avg_disc,
           count(*) AS count_order
    FROM l GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** TPC-H Q3 shape: 3-way join + agg + top-k — the flagship. The nation-
    * sized side of nothing here is broadcastable, but orders⋈lineitem is a
    * co-partitioned shuffle join on l_orderkey; at 100 TB both sides
    * shuffle once on the join key and AQE handles skew.
    */
  def q3_topk(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir)
    val cutoff = lit("1998-06-01").cast("timestamp")
    m("customer").filter(col("c_mktsegment") === "BUILDING")
      .join(m("orders"), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < cutoff)
      .join(m("lineitem"), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > cutoff)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          .as("rev"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg((sum(col("rev")).cast("double") / 10000).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3_topk_sql: String = """
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
             / 10000 AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10"""

  // --------------------------------------------------------------------
  // Joins (ref: ql/exec/CommonJoinOperator.java — shuffle join for all
  // INNER/LEFT/RIGHT/FULL/SEMI variants, ql/plan/JoinDesc.java:42-47;
  // ql/exec/MapJoinOperator.java:366 — broadcast hash join. Spark:
  // ds.join(...) -> SortMergeJoin / BroadcastHashJoin chosen by Catalyst,
  // re-chosen at runtime by AQE like Hive's CommonJoinResolver).
  // --------------------------------------------------------------------

  /** Inner equi-join chain, dimension side broadcastable. */
  def q_join_inner(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir)
    m("customer")
      .join(m("nation"), col("c_nationkey") === col("n_nationkey"))
      .join(m("orders"), col("c_custkey") === col("o_custkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"),
        (sum(cents(col("o_totalprice"))).cast("double") / 100).as("total_rev"))
      .presentSorted("n_name")
  }

  val q_join_inner_sql: String = """
    SELECT n_name, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100
             AS total_rev
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN orders ON c_custkey = o_custkey
    GROUP BY n_name ORDER BY n_name"""

  /** Left outer join preserving unmatched left rows. */
  def q_join_left(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir)
    m("customer")
      .join(m("orders").filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_f_orders"))
      .presentSorted("c_custkey")
  }

  val q_join_left_sql: String = """
    SELECT c_custkey, count(o_orderkey) AS n_f_orders
    FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
      ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey"""

  /** Right outer join (ref: JoinDesc.RIGHT_OUTER_JOIN). */
  def q_join_right(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir)
    m("lineitem").filter(col("l_quantity") >= 45)
      .join(m("orders"), col("l_orderkey") === col("o_orderkey"), "right")
      .groupBy("o_orderkey")
      .agg(count(col("l_linenumber")).as("n_big_items"))
      .presentSorted("o_orderkey")
  }

  val q_join_right_sql: String = """
    SELECT o_orderkey, count(l_linenumber) AS n_big_items
    FROM (SELECT * FROM lineitem WHERE l_quantity >= 45) l
      RIGHT JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderkey ORDER BY o_orderkey"""

  /** Full outer join of two pre-aggregated sides. */
  def q_join_full(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir)
    val c = m("customer").filter(col("c_acctbal") > 9000)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_rich_cust"))
    val s = m("supplier")
      .groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))
    c.join(s, col("c_nationkey") === col("s_nationkey"), "full")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_rich_cust"), lit(0L)).as("n_rich_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .presentSorted("nationkey")
  }

  val q_join_full_sql: String = """
    WITH c AS (SELECT c_nationkey, count(*) AS n_rich_cust FROM customer
               WHERE c_acctbal > 9000 GROUP BY c_nationkey),
         s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier
               GROUP BY s_nationkey)
    SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
           coalesce(n_rich_cust, 0) AS n_rich_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM c FULL JOIN s ON c_nationkey = s_nationkey
    ORDER BY nationkey"""

  /** Left-semi join = EXISTS (ref: JoinDesc.LEFT_SEMI_JOIN). */
  def q_join_semi(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir)
    m("customer")
      .join(m("orders").filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .presentSorted("c_custkey")
  }

  val q_join_semi_sql: String = """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    ORDER BY c_custkey"""

  /** Left-anti join = NOT EXISTS (Hive spells it LEFT OUTER + IS NULL,
    * ql/parse/SemanticAnalyzer.java; Spark has a first-class operator). */
  def q_join_anti(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir)
    m("customer")
      .join(m("orders").filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .presentSorted("c_custkey")
  }

  val q_join_anti_sql: String = """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    ORDER BY c_custkey"""

  /** Null-safe equality join `<=>` (ref: CommonJoinOperator nullsafes). */
  def q_join_nullsafe(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir)
    val c = m("customer").select(expr("nullif(c_nationkey, 0)").as("k"))
    val s = m("supplier").select(expr("nullif(s_nationkey, 0)").as("k2"))
    c.join(s, col("k") <=> col("k2"))
      .groupBy(coalesce(col("k"), lit(-1)).as("k"))
      .agg(count(lit(1)).as("n_pairs"))
      .presentSorted("k")
  }

  val q_join_nullsafe_sql: String = """
    SELECT coalesce(k, -1) AS k, count(*) AS n_pairs
    FROM (SELECT nullif(c_nationkey, 0) AS k FROM customer) c
    JOIN (SELECT nullif(s_nationkey, 0) AS k2 FROM supplier) s
      ON k IS NOT DISTINCT FROM k2
    GROUP BY coalesce(k, -1) ORDER BY k"""

  /** Cross join (ref: ql/optimizer/physical/CrossProductCheck.java). */
  def q_join_cross(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir)
    m("region").crossJoin(m("nation"))
      .select("r_name", "n_name")
      .presentSorted("r_name", "n_name")
  }

  val q_join_cross_sql: String = """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    ORDER BY r_name, n_name"""

  /** Explicit broadcast (map-join) star chain: fact table shuffles zero
    * times — every dimension ships to the fact's partitions, exactly
    * Hive's MapJoin conversion (ql/exec/MapJoinOperator.java:366) but
    * declared, and AQE would pick it anyway at 100 TB. */
  def q_join_broadcast(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir)
    m("lineitem")
      .join(broadcast(m("supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(m("nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(m("region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        (sum(cents(col("l_extendedprice"))).cast("double") / 100).as("revenue"),
        count(lit(1)).as("n_items"))
      .presentSorted("r_name")
  }

  val q_join_broadcast_sql: String = """
    SELECT r_name,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100
             AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name"""

  // --------------------------------------------------------------------
  // Aggregation tail (distinct / grouping sets / stats / collect /
  // percentile / having; ref: ql/exec/GroupByOperator.java grouping-sets
  // expansion via GroupByDesc.java:69-71, distinct via ReduceSinkDesc).
  // --------------------------------------------------------------------

  /** Multi-DISTINCT aggregation (Catalyst Expand, like Hive's
    * ReduceSink distinct columns). */
  def q_agg_distinct(spark: SparkSession, dir: String): DataFrame = {
    // conditional spread (no-op at cluster scan parallelism): the
    // multi-distinct Expand multiplies every row 5x BEFORE the first
    // exchange — on an unsplittable local file all of it on one core.
    // Keyed on l_partkey, which the query already reads.
    val li = graft.Engine.spread(t(spark, dir)("lineitem"), col("l_partkey"))
    li.groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        countDistinct(col("l_suppkey"), col("l_partkey")).as("n_sp"),
        (sum_distinct(cents(col("l_quantity"))).cast("double") / 100)
          .as("sum_dist_qty"),
        count(lit(1)).as("n"))
      .presentSorted("l_returnflag")
  }

  val q_agg_distinct_sql: String = """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(DISTINCT (l_suppkey, l_partkey)) AS n_sp,
           CAST(sum(DISTINCT CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)
             / 100 AS sum_dist_qty,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** CUBE with grouping() markers. */
  def q_agg_cube(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir)("lineitem")
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).as("g1"),
        grouping(col("l_linestatus")).as("g2"),
        count(lit(1)).as("n"),
        (sum(cents(col("l_quantity"))).cast("double") / 100).as("sum_qty"))
      .presentSorted(col("g1"), col("g2"),
        coalesce(col("l_returnflag"), lit("")),
        coalesce(col("l_linestatus"), lit("")))
  }

  val q_agg_cube_sql: String = """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS TINYINT) AS g1,
           CAST(GROUPING(l_linestatus) AS TINYINT) AS g2,
           count(*) AS n,
           CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100
             AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g1, g2, coalesce(l_returnflag, ''), coalesce(l_linestatus, '')"""

  /** ROLLUP. */
  def q_agg_rollup(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir)("orders")
    o.rollup(year(col("o_orderdate")).as("y"), col("o_orderstatus"))
      .agg(grouping(col("o_orderstatus")).as("g"),
        count(lit(1)).as("n"),
        (sum(cents(col("o_totalprice"))).cast("double") / 100).as("total"))
      .presentSorted(coalesce(col("y"), lit(-1)),
        coalesce(col("o_orderstatus"), lit("")))
  }

  val q_agg_rollup_sql: String = """
    SELECT year(o_orderdate) AS y, o_orderstatus,
           CAST(GROUPING(o_orderstatus) AS TINYINT) AS g,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100
             AS total
    FROM orders GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
    ORDER BY coalesce(y, -1), coalesce(o_orderstatus, '')"""

  /** Explicit GROUPING SETS via SQL (parsed by Spark's dialect like
    * Hive's; ref: ql/parse/HiveParser.g groupingSetExpression). */
  def q_agg_groupingsets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT l_returnflag, l_linestatus,
             grouping(l_returnflag) AS g1, grouping(l_linestatus) AS g2,
             count(*) AS n
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
        GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY g1, g2, coalesce(l_returnflag, ''), coalesce(l_linestatus, '')""")
  }

  val q_agg_groupingsets_sql: String = """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS TINYINT) AS g1,
           CAST(GROUPING(l_linestatus) AS TINYINT) AS g2,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY g1, g2, coalesce(l_returnflag, ''), coalesce(l_linestatus, '')"""

  /** Statistical aggregates (ref: FunctionRegistry.java:414-427 std/var/
    * corr/covar family). Rounded — the merge formulas differ across
    * engines in the last float bits. */
  def q_agg_stats(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir)("lineitem")
    li.groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 6).as("sd_samp"),
        round(stddev_pop(col("l_quantity")), 6).as("sd_pop"),
        round(var_samp(col("l_quantity")), 6).as("v_samp"),
        round(var_pop(col("l_quantity")), 6).as("v_pop"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_pop(col("l_quantity"), col("l_discount")), 6).as("cov_qd"))
      .presentSorted("l_returnflag")
  }

  val q_agg_stats_sql: String = """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_samp,
           round(stddev_pop(l_quantity), 6) AS sd_pop,
           round(var_samp(l_quantity), 6) AS v_samp,
           round(var_pop(l_quantity), 6) AS v_pop,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(covar_pop(l_quantity, l_discount), 6) AS cov_qd
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** min/max over numeric, timestamp and string + null counting. */
  def q_agg_minmax(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir)("lineitem")
    li.groupBy("l_linestatus")
      .agg(
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"),
        min(col("l_returnflag")).as("min_flag"),
        max(col("l_returnflag")).as("max_flag"),
        count(lit(1)).as("n"))
      .presentSorted("l_linestatus")
  }

  val q_agg_minmax_sql: String = """
    SELECT l_linestatus,
           min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
           min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
           min(l_returnflag) AS min_flag, max(l_returnflag) AS max_flag,
           count(*) AS n
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""

  /** collect_set/collect_list (ref: FunctionRegistry.java:441-442) made
    * deterministic by sorting + joining to a string. */
  def q_agg_collect(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir)("orders")
    o.filter(col("o_custkey") < 50)
      .groupBy("o_custkey")
      .agg(
        array_join(sort_array(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"),
        array_join(sort_array(collect_list(col("o_orderpriority"))), ",")
          .as("priorities"))
      .presentSorted("o_custkey")
  }

  val q_agg_collect_sql: String = """
    SELECT o_custkey,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
             AS statuses,
           array_to_string(list_sort(list(o_orderpriority)), ',')
             AS priorities
    FROM orders WHERE o_custkey < 50
    GROUP BY o_custkey ORDER BY o_custkey"""

  /** Exact percentiles with linear interpolation (ref:
    * ql/udf/UDAFPercentile.java). */
  def q_agg_percentile(spark: SparkSession, dir: String): DataFrame = {
    // conditional spread: exact percentile buffers all 600k values in
    // ObjectHashAggregate buffers — parallelize the partial phase past
    // the unsplittable local file. Keyed on a column already read.
    val li = graft.Engine.spread(t(spark, dir)("lineitem"),
      col("l_extendedprice"))
    li.groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
      .presentSorted("l_returnflag")
  }

  val q_agg_percentile_sql: String = """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS p25,
           round(quantile_cont(l_quantity, 0.5), 6) AS p50,
           round(quantile_cont(l_quantity, 0.75), 6) AS p75,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** HAVING = post-aggregation filter. */
  def q_agg_having(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir)("lineitem")
    li.groupBy("l_suppkey")
      .agg((sum(cents(col("l_extendedprice"))).cast("double") / 100).as("rev"),
        count(lit(1)).as("n_items"))
      .filter(col("rev") > 20000000)
      .presentSorted("l_suppkey")
  }

  val q_agg_having_sql: String = """
    SELECT l_suppkey,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100
             AS rev,
           count(*) AS n_items
    FROM lineitem GROUP BY l_suppkey
    HAVING CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100
           > 20000000
    ORDER BY l_suppkey"""

  // --------------------------------------------------------------------
  // Sort / limit / top-k (ref: ReduceSinkOperator sort keys +
  // TopNHash.java:45 bounded-heap pushdown -> Catalyst
  // TakeOrderedAndProject; LimitOperator.java:61 offset support).
  // --------------------------------------------------------------------

  /** ORDER BY ... LIMIT with full tiebreak -> TakeOrderedAndProject:
    * per-partition heaps, no global sort — Hive's TopNHash, free. */
  def q_orderby_limit(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir)("lineitem")
    li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
      .limit(100)
  }

  val q_orderby_limit_sql: String = """
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100"""

  /** LIMIT with OFFSET (ref: LimitOperator offset). */
  def q_limit_offset(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir)("orders")
    o.select("o_orderkey", "o_totalprice")
      .presentSorted("o_orderkey")
      .offset(100).limit(10)
  }

  val q_limit_offset_sql: String = """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 10 OFFSET 100"""

  /** Deterministic bucket sampling (ref: ql/optimizer/SamplePruner.java,
    * TABLESAMPLE(BUCKET 1 OUT OF 97 ON key)) — expressed as a pushed-down
    * modulo predicate so both engines agree exactly. */
  def q_tablesample(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir)("lineitem")
    li.filter(pmod(col("l_orderkey"), lit(97)) === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .presentSorted("l_orderkey", "l_linenumber")
  }

  val q_tablesample_sql: String = """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_orderkey % 97 = 0
    ORDER BY l_orderkey, l_linenumber"""

  // --------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1_agg _),
    "q3_topk" -> (q3_topk _),
    "q_join_inner" -> (q_join_inner _),
    "q_join_left" -> (q_join_left _),
    "q_join_right" -> (q_join_right _),
    "q_join_full" -> (q_join_full _),
    "q_join_semi" -> (q_join_semi _),
    "q_join_anti" -> (q_join_anti _),
    "q_join_nullsafe" -> (q_join_nullsafe _),
    "q_join_cross" -> (q_join_cross _),
    "q_join_broadcast" -> (q_join_broadcast _),
    "q_agg_distinct" -> (q_agg_distinct _),
    "q_agg_cube" -> (q_agg_cube _),
    "q_agg_rollup" -> (q_agg_rollup _),
    "q_agg_groupingsets" -> (q_agg_groupingsets _),
    "q_agg_stats" -> (q_agg_stats _),
    "q_agg_minmax" -> (q_agg_minmax _),
    "q_agg_collect" -> (q_agg_collect _),
    "q_agg_percentile" -> (q_agg_percentile _),
    "q_agg_having" -> (q_agg_having _),
    "q_orderby_limit" -> (q_orderby_limit _),
    "q_limit_offset" -> (q_limit_offset _),
    "q_tablesample" -> (q_tablesample _))

  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> q1_agg_sql,
    "q3_topk" -> q3_topk_sql,
    "q_join_inner" -> q_join_inner_sql,
    "q_join_left" -> q_join_left_sql,
    "q_join_right" -> q_join_right_sql,
    "q_join_full" -> q_join_full_sql,
    "q_join_semi" -> q_join_semi_sql,
    "q_join_anti" -> q_join_anti_sql,
    "q_join_nullsafe" -> q_join_nullsafe_sql,
    "q_join_cross" -> q_join_cross_sql,
    "q_join_broadcast" -> q_join_broadcast_sql,
    "q_agg_distinct" -> q_agg_distinct_sql,
    "q_agg_cube" -> q_agg_cube_sql,
    "q_agg_rollup" -> q_agg_rollup_sql,
    "q_agg_groupingsets" -> q_agg_groupingsets_sql,
    "q_agg_stats" -> q_agg_stats_sql,
    "q_agg_minmax" -> q_agg_minmax_sql,
    "q_agg_collect" -> q_agg_collect_sql,
    "q_agg_percentile" -> q_agg_percentile_sql,
    "q_agg_having" -> q_agg_having_sql,
    "q_orderby_limit" -> q_orderby_limit_sql,
    "q_limit_offset" -> q_limit_offset_sql,
    "q_tablesample" -> q_tablesample_sql)
}
