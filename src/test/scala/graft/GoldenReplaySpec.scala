package graft

/** Golden REPLAY suite: instead of hand-porting result blocks (see
  * GoldenSemanticsSpec), parse the reference's committed `.q.out`
  * goldens at test time (the same way FunctionCompletenessSpec parses
  * FunctionRegistry.java), execute every statement of the `.q` script
  * in order through this engine, and compare result blocks as sorted
  * multisets. The machinery lives in [[GoldenHarness]]; the swept
  * pass-list batch is in [[GoldenCorpusSpec]].
  */
class GoldenReplaySpec extends SparkSpec {
  // Isolated child session: qtest fixture views (`lineitem`, `part`,
  // `srcpart`, ...) share names with other suites' testdata views, and
  // suites run in parallel over one underlying session — newSession()
  // gives this suite its own temp-view catalog on the same context.
  override lazy val spark: org.apache.spark.sql.SparkSession =
    Engine.prepare(Engine.session(appName = "graft-test",
      master = "local[4]", shufflePartitions = 4).newSession())

  private lazy val h = new GoldenHarness(spark)

  test("having.q golden replay (HAVING on alias, on non-grouped agg, " +
      "with WHERE)") {
    h.src
    assert(h.replay("having.q.out") === 6)
  }

  test("semijoin.q golden replay (left semi across CTAS chain, " +
      "filters on build side, outer-join mixes)") {
    h.src
    assert(h.replay("semijoin.q.out") >= 20)
  }

  test("join_nulls.q golden replay (null-key matrix across all join " +
      "types, 49 goldens)") {
    assert(h.replay("join_nulls.q.out") === 49)
  }

  test("join_filters.q golden replay (ON-clause filter placement matrix " +
      "on outer joins, 112 goldens)") {
    assert(h.replay("join_filters.q.out") === 112)
  }

  test("ppd_join.q golden replay (predicate pushdown through join chains)") {
    h.src
    assert(h.replay("ppd_join.q.out") === 2)
  }

  test("subquery_exists.q golden replay (correlated EXISTS decorrelation)") {
    h.src
    assert(h.replay("subquery_exists.q.out") >= 4)
  }

  test("innerjoin.q golden replay (INSERT OVERWRITE then read back)") {
    h.src
    assert(h.replay("innerjoin.q.out") >= 3)
  }

  test("groupby2.q golden replay (FROM-first insert, multi-DISTINCT agg, " +
      "double-to-string concat)") {
    h.src
    assert(h.replay("groupby2.q.out") === 1)
  }

  test("groupby1.q golden replay (FROM-first group-by insert, " +
      "sum over substr cast)") {
    h.src
    assert(h.replay("groupby1.q.out") === 1)
  }

  test("union3.q golden replay (4-way UNION ALL with LIMIT subqueries " +
      "and CLUSTER BY)") {
    h.src
    assert(h.replay("union3.q.out") === 1)
  }

  test("join29.q golden replay (join of two grouped subqueries into " +
      "typed table)") {
    h.src; h.src1
    assert(h.replay("join29.q.out") === 1)
  }

  test("notable_alias1.q golden replay (FROM-first WHERE + GROUP BY " +
      "with constant projection)") {
    h.src
    assert(h.replay("notable_alias1.q.out") === 1)
  }

  private def batch(files: Seq[String], stripDecZeros: Boolean = true)
      : Unit = {
    val failures = files.flatMap { f =>
      try {
        if (h.replay(f, stripDecZeros = stripDecZeros) < 1)
          Some(f -> "no select blocks asserted")
        else None
      } catch {
        case e: Throwable =>
          Some(f -> Option(e.getMessage).getOrElse("?").take(300))
      }
    }
    assert(failures.isEmpty,
      failures.map { case (f, m) => s"$f: $m" }.mkString("\n\n"))
  }

  test("batch golden replay: auto_join corpus + cbo + casts (hive_hash " +
      "checksums are bit-compatibility assertions)") {
    h.src; h.src1
    batch(Seq(
      "auto_join0.q.out", "auto_join1.q.out", "auto_join2.q.out",
      "auto_join3.q.out", "auto_join4.q.out", "auto_join5.q.out",
      "auto_join6.q.out", "auto_join7.q.out", "auto_join8.q.out",
      "auto_join11.q.out", "auto_join12.q.out", "auto_join13.q.out",
      "auto_join15.q.out", "auto_join16.q.out", "auto_join17.q.out",
      "auto_join18.q.out", "auto_join18_multi_distinct.q.out",
      "auto_join20.q.out", "auto_join21.q.out", "auto_join22.q.out",
      "auto_join23.q.out", "auto_join24.q.out", "auto_join26.q.out",
      "auto_join27.q.out", "auto_join29.q.out", "auto_join33.q.out"))
    // not replayed, with reasons: auto_join_without_localtask.q (bare
    // LIMIT over a join asserts an engine-defined row subset),
    // cast1.q / ansi_sql_arithmetic.q (Hive
    // casts boolean→string as "TRUE" and int/int division to decimal;
    // Spark says "true" and double — dialect divergences),
    // ambiguous_col.q (Hive tolerates ambiguous column refs Spark
    // rejects at analysis)
  }

  test("batch golden replay: cbo corpus over the cbo_t fixture family") {
    h.cbo; h.tpchFixtures; h.srcpart
    batch(Seq(
      "cbo_simple_select.q.out", "cbo_union.q.out",
      "cbo_subq_exists.q.out", "cbo_subq_in.q.out",
      "cbo_subq_not_in.q.out",
      "cbo_gby.q.out", "cbo_gby_empty.q.out", "cbo_join.q.out",
      "cbo_semijoin.q.out", "cbo_const.q.out", "subquery_in.q.out",
      "subquery_views.q.out"))
    // not replayed, with reasons: cbo_limit.q (ORDER BY c_int LIMIT with
    // ties asserts an engine-defined subset), cbo_windowing.q (RANGE
    // frame over a string order key — Hive permits, Spark type-checks),
    // cbo_udf_max.q (struct cell rendering: Hive prints JSON with its
    // expr$N field names)
  }

  test("batch golden replay: srcpart corpus (partition pruning, dynamic " +
      "partitions, ppd, map-joins)") {
    h.src; h.src1; h.srcpart
    batch(Seq(
      "auto_join9.q.out", "auto_join14.q.out", "auto_join19.q.out",
      "auto_join19_inclause.q.out", "auto_join25.q.out",
      "join9.q.out", "join14.q.out", "join26.q.out", "join28.q.out",
      "join32.q.out", "join33.q.out", "join_empty.q.out",
      "join_merge_multi_expressions.q.out",
      "groupby_ppr.q.out", "groupby_map_ppr.q.out",
      "groupby_ppr_multi_distinct.q.out",
      "groupby_map_ppr_multi_distinct.q.out",
      "input_part0.q.out", "input_part1.q.out",
      "input_part2.q.out", "input_part3.q.out", "input_part5.q.out",
      "input_part7.q.out", "input_part9.q.out",
      "ppd2.q.out", "ppd_constant_where.q.out", "ppd_udf_case.q.out",
      "ppr_allchildsarenull.q.out", "ppr_pushdown3.q.out",
      "mapjoin_mapjoin.q.out", "mapjoin_subquery.q.out",
      "mapjoin_distinct.q.out", "partition_boolexpr.q.out",
      "constant_prop_2.q.out", "filter_numeric.q.out",
      "load_dyn_part1.q.out", "load_dyn_part2.q.out",
      "load_dyn_part3.q.out", "load_dyn_part8.q.out",
      "load_dyn_part13.q.out", "mi.q.out"))
    // input42.q left out: its selects sample with rand(100)
  }

  test("batch golden replay: windowing corpus (files whose asserts are " +
      "deterministic — no bare LIMIT subsets)") {
    h.over10k; h.tpchFixtures; h.src; h.cbo; h.alltypesorc
    batch(Seq(
      "windowing_decimal.q.out", "windowing_columnPruning.q.out",
      "windowing_gby2.q.out",
      "windowing_adjust_rowcontainer_sz.q.out"), stripDecZeros = false)
    // most windowing_*.q files end every select with a bare LIMIT 100
    // over 10k rows — an engine-defined subset, not replayable; ptf.q
    // drives Hive's noop()/noopwithmap() PTFs; windowing_distinct.q
    // needs COUNT(DISTINCT) OVER, which Spark rejects at analysis
  }

  test("udf_case.q golden replay (CASE WHEN matrices incl. NULL arms)") {
    h.src
    // the short-circuit block calls reflect('java.lang.String','bogus',1)
    // in a dead ELSE arm: Hive defers resolution to runtime (never
    // reached), Spark type-checks every branch at analysis — documented
    // divergence, block skipped
    assert(h.replay("udf_case.q.out", skip = _.contains("bogus")) >= 2)
  }
}
