package graft.queries

import graft.Present._

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row generators / lateral structures (SURVEY.md §2.9; ref:
  * ql/exec/UDTFOperator.java:107, LateralViewJoinOperator.java:132,
  * builtin UDTFs at FunctionRegistry.java:493-500). Spark's Generate
  * operator + explode family covers all of it natively; LATERAL VIEW
  * syntax parses as-is.
  */
object Generators {

  private def t(spark: SparkSession, dir: String): Map[String, DataFrame] =
    Engine.tables(spark, dir)

  /** explode(split(...)) — token frequency over the corpus. At 100 TB the
    * explode happens partition-local and the count is a partial-agg
    * shuffle of (token, n) pairs, not rows. */
  def q_lateral_explode(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir)("documents")
    d.select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .presentSorted("token")
  }

  val q_lateral_explode_sql: String = """
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token ORDER BY token"""

  /** posexplode — position-aware expansion. */
  def q_lateral_posexplode(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir)("documents")
    d.filter(col("doc_id") < 20)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .presentSorted("doc_id", "pos")
  }

  val q_lateral_posexplode_sql: String = """
    SELECT doc_id,
           CAST(generate_subscripts(toks, 1) - 1 AS INT) AS pos,
           unnest(toks) AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 20)
    ORDER BY doc_id, pos"""

  /** LATERAL VIEW OUTER semantics: rows whose generated array is empty
    * survive with a NULL (ref: LateralViewForwardOperator + outer flag). */
  def q_lateral_outer(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir)("documents")
    d.select(col("doc_id"),
        explode_outer(filter(split(col("text"), " "), x => length(x) >= 8))
          .as("token"))
      .groupBy("doc_id").agg(count(col("token")).as("n_long"))
      .presentSorted("doc_id")
  }

  val q_lateral_outer_sql: String = """
    SELECT doc_id, count(token) AS n_long FROM (
      SELECT doc_id,
             unnest(CASE WHEN len(l) = 0 THEN [NULL::VARCHAR] ELSE l END)
               AS token
      FROM (SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> len(x) >= 8) AS l
            FROM documents))
    GROUP BY doc_id ORDER BY doc_id"""

  /** json_tuple UDTF + get_json_object over the events.props JSON column
    * (ref: ql/udf/generic/GenericUDTFJSONTuple.java, GenericUDFJson). */
  def q_json_tuple(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    // presentation order via presentSorted, not ORDER BY: a global sort
    // directly over a scan pipeline has no materialized stage below it,
    // so the range-partitioner's sampling pass would RE-RUN the whole
    // json parse (bench: 1.22 s -> ~0.6 s). event_id is unique — the
    // total order is identical.
    spark.sql("""
      SELECT event_id, jt.k AS k_str,
             CAST(get_json_object(props, '$.k') AS INT) AS k_int
      FROM events LATERAL VIEW json_tuple(props, 'k') jt AS k""")
      .presentSorted("event_id")
  }

  val q_json_tuple_sql: String = """
    SELECT event_id,
           regexp_extract(props, '"k": (-?\d+)', 1) AS k_str,
           CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INT) AS k_int
    FROM events ORDER BY event_id"""

  /** stack + inline constant generators (ref: GenericUDTFStack,
    * GenericUDTFInline). */
  def q_stack_inline(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT k, v, 'stack' AS src
      FROM (SELECT stack(3, 'a', 1, 'b', 2, 'c', 3) AS (k, v))
      UNION ALL
      SELECT k, v, 'inline' AS src
      FROM (SELECT inline(array(named_struct('k', 'x', 'v', 9),
                                named_struct('k', 'y', 'v', 8))) AS (k, v))
      ORDER BY src, k""")
  }

  val q_stack_inline_sql: String = """
    SELECT * FROM (VALUES ('a', 1, 'stack'), ('b', 2, 'stack'),
                          ('c', 3, 'stack'), ('x', 9, 'inline'),
                          ('y', 8, 'inline')) t(k, v, src)
    ORDER BY src, k"""

  /** str_to_map (ref: GenericUDFStringToMap) + map element access. */
  def q_str_to_map(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    // same presentation-sort rationale as q_json_tuple above
    spark.sql("""
      SELECT event_id,
             element_at(str_to_map(translate(props, '{}" ', ''), ',', ':'),
                        'k') AS k_str
      FROM events""")
      .presentSorted("event_id")
  }

  val q_str_to_map_sql: String = """
    SELECT event_id, regexp_extract(props, '"k": (-?\d+)', 1) AS k_str
    FROM events ORDER BY event_id"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lateral_explode" -> (q_lateral_explode _),
    "q_lateral_posexplode" -> (q_lateral_posexplode _),
    "q_lateral_outer" -> (q_lateral_outer _),
    "q_json_tuple" -> (q_json_tuple _),
    "q_stack_inline" -> (q_stack_inline _),
    "q_str_to_map" -> (q_str_to_map _))

  def oracleSql: Map[String, String] = Map(
    "q_lateral_explode" -> q_lateral_explode_sql,
    "q_lateral_posexplode" -> q_lateral_posexplode_sql,
    "q_lateral_outer" -> q_lateral_outer_sql,
    "q_json_tuple" -> q_json_tuple_sql,
    "q_stack_inline" -> q_stack_inline_sql,
    "q_str_to_map" -> q_str_to_map_sql)
}
