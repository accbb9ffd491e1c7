package graft.queries

import graft.Present._

import graft.Engine
import graft.operators.{Curation => Cur}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation query inventory (training-data pipeline extras):
  * PII redaction, repetition quality metrics, deterministic stratified
  * sampling, and sequence packing — each with a DuckDB oracle that
  * recomputes the full pipeline (including the FNV-1a fingerprint fold)
  * from first principles.
  */
object Curation {

  private def t(spark: SparkSession, dir: String): Map[String, DataFrame] =
    Engine.tables(spark, dir)

  /** PII text derived deterministically from customer columns (the
    * testdata carries no real PII, so the pipeline manufactures
    * realistic contact strings both engines can reproduce). */
  def q_pii_redact(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir)("customer")
    val txt = concat(lit("Contact "), col("c_name"), lit(" <"),
      lower(regexp_replace(col("c_name"), "#", "")),
      lit("@example.com> call +1-555-"),
      lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0"),
      lit(" from 10."), col("c_nationkey").cast("string"), lit(".0."),
      pmod(col("c_custkey"), lit(256)).cast("string"))
    Cur.piiRedact(
        c.select(col("c_custkey").as("doc_id"), txt.as("text")))
      .presentSorted("doc_id")
  }

  val q_pii_redact_sql: String = """
    WITH d AS (SELECT c_custkey AS doc_id,
        'Contact ' || c_name || ' <' || lower(replace(c_name, '#', '')) ||
        '@example.com> call +1-555-' ||
        lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
        ' from 10.' || CAST(c_nationkey AS VARCHAR) || '.0.' ||
        CAST(c_custkey % 256 AS VARCHAR) AS text
      FROM customer)
    SELECT doc_id,
      len(regexp_extract_all(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      len(regexp_extract_all(text, '\+\d{1,2}-\d{3}-\d{4}')) AS n_phones,
      len(regexp_extract_all(text,
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
      regexp_replace(
        regexp_replace(
          regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]',
            'g'),
          '\+\d{1,2}-\d{3}-\d{4}', '[PHONE]', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS redacted
    FROM d ORDER BY doc_id"""

  /** Dominant-bigram repetition profile per document. */
  def q_quality_repetition(spark: SparkSession, dir: String): DataFrame =
    Cur.repetitionStats(t(spark, dir)("documents"), n = 2)
      .presentSorted("doc_id")

  val q_quality_repetition_sql: String = """
    WITH toks AS (SELECT doc_id,
                         string_split_regex(trim(text), '\s+') AS l
                  FROM documents),
    g AS (SELECT doc_id, unnest(list_transform(
            generate_series(1, len(l) - 1), i -> l[i] || ' ' || l[i+1]))
            AS gram
          FROM toks WHERE len(l) >= 2),
    c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
    r AS (SELECT *, CAST(sum(cnt) OVER (PARTITION BY doc_id) AS BIGINT)
                      AS n_grams,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY cnt DESC, gram) AS rk
          FROM c)
    SELECT doc_id, n_grams, gram AS top_gram, cnt AS top_cnt,
           CAST(cnt AS DOUBLE) / n_grams AS top_frac
    FROM r WHERE rk = 1 ORDER BY doc_id"""

  /** Deterministic per-language downsampling: keep 20% of English, 60%
    * of everything else — hash-bucketed, so both engines keep exactly
    * the same rows. */
  def q_sample_stratified(spark: SparkSession, dir: String): DataFrame =
    Cur.stratifiedSample(t(spark, dir)("documents"), "lang",
        Map("en" -> 20), defaultPct = 60)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .presentSorted("doc_id")

  val q_sample_stratified_sql: String = """
    WITH k AS (SELECT doc_id, lang,
                      lang || ':' || CAST(doc_id AS VARCHAR) AS s
               FROM documents),
    f AS (SELECT doc_id, lang,
      list_reduce(
        list_prepend(CAST(14695981039346656037 AS HUGEINT),
          list_transform(range(1, length(s) + 1),
            i -> CAST(unicode(s[i]) AS HUGEINT))),
        (acc, b) -> ((acc - acc % 256 +
                      xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
                     * 1099511628211) % 18446744073709551616) AS hu
      FROM k),
    b AS (SELECT doc_id, lang,
      ((CAST(CASE WHEN hu >= 9223372036854775808
             THEN hu - 18446744073709551616 ELSE hu END AS BIGINT)
        % 100) + 100) % 100 AS bucket
      FROM f)
    SELECT doc_id, lang, bucket FROM b
    WHERE bucket < CASE WHEN lang = 'en' THEN 20 ELSE 60 END
    ORDER BY doc_id"""

  /** Next-fit packing of each language's documents into 512-token
    * training sequences. */
  def q_pack_sequences(spark: SparkSession, dir: String): DataFrame =
    Cur.packSequences(t(spark, dir)("documents"), seqLen = 512)
      .presentSorted("doc_id")

  val q_pack_sequences_sql: String = """
    WITH t AS (SELECT doc_id, lang,
        CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
          AS n_tokens
      FROM documents),
    w AS (SELECT doc_id, lang, n_tokens,
        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS start_off
      FROM t)
    SELECT doc_id, lang, n_tokens,
           start_off // 512 AS seq_id,
           start_off % 512 AS seq_off
    FROM w ORDER BY doc_id"""

  /** The whole training-data pipeline as one hash-checked query:
    * repetition gate -> exact dedup -> transitive near-dedup ->
    * decontamination vs the doc_id < 20 "eval" slice -> stratified
    * sample -> 512-token packing. The oracle replays all six stages in
    * one SQL chain. */
  def q_curate_pipeline(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir)("documents")
    // maxShingleFreq = None: the oracle SQL replays an UNCAPPED Jaccard
    // join, so the checked query must compute the identical function —
    // capped-vs-uncapped parity on low-df test data would be accidental
    Cur.curateCorpus(d.filter(col("doc_id") >= 20),
        d.filter(col("doc_id") < 20), maxShingleFreq = None)
      .presentSorted("doc_id")
  }

  val q_curate_pipeline_sql: String = """
    WITH RECURSIVE
    corpus AS (SELECT doc_id, lang, text FROM documents WHERE doc_id >= 20),
    tq AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
           FROM corpus),
    g2 AS (SELECT doc_id, unnest(list_transform(
             generate_series(1, len(l) - 1), i -> l[i] || ' ' || l[i+1]))
             AS gram
           FROM tq WHERE len(l) >= 2),
    c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
    rep AS (SELECT doc_id, CAST(max(cnt) AS DOUBLE) / sum(cnt) AS top_frac
            FROM c2 GROUP BY doc_id),
    quality AS (SELECT c.doc_id, c.lang, c.text FROM corpus c
                LEFT JOIN rep r USING (doc_id)
                WHERE r.top_frac IS NULL OR r.top_frac <= 0.2),
    keepx AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
    exact AS (SELECT q.doc_id, q.lang, q.text FROM quality q
              JOIN keepx USING (doc_id)),
    t3 AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
           FROM exact),
    sh3 AS (SELECT doc_id, unnest(list_distinct(list_transform(
              generate_series(1, len(l) - 2),
              i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS s
            FROM t3 WHERE len(l) >= 3),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh3 GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
              FROM sh3 a JOIN sh3 b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    prs AS (SELECT da, db FROM inter
            JOIN sizes sa ON sa.doc_id = da
            JOIN sizes sb ON sb.doc_id = db
            WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.5),
    edges AS (SELECT da AS u, db AS w FROM prs
              UNION SELECT db, da FROM prs),
    reach(node, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.w, r.label FROM reach r JOIN edges e ON e.u = r.node),
    labels AS (SELECT node, min(label) AS label FROM reach GROUP BY node),
    near AS (SELECT * FROM exact WHERE doc_id NOT IN
               (SELECT node FROM labels WHERE node <> label)),
    ev AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
    te AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
           FROM ev),
    she AS (SELECT doc_id, unnest(list_distinct(list_transform(
              generate_series(1, len(l) - 4),
              i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
                   l[i+3] || ' ' || l[i+4]))) AS s
            FROM te WHERE len(l) >= 5),
    tn AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
           FROM near),
    shn AS (SELECT doc_id, unnest(list_distinct(list_transform(
              generate_series(1, len(l) - 4),
              i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
                   l[i+3] || ' ' || l[i+4]))) AS s
            FROM tn WHERE len(l) >= 5),
    dirty AS (SELECT DISTINCT doc_id FROM (
                SELECT n.doc_id, e.doc_id AS eid, count(*) AS c
                FROM shn n JOIN she e ON n.s = e.s
                GROUP BY 1, 2 HAVING count(*) >= 2)),
    clean AS (SELECT * FROM near
              WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
    fk AS (SELECT doc_id, lang, text,
                  lang || ':' || CAST(doc_id AS VARCHAR) AS s
           FROM clean),
    fh AS (SELECT doc_id, lang, text,
      list_reduce(
        list_prepend(CAST(14695981039346656037 AS HUGEINT),
          list_transform(range(1, length(s) + 1),
            i -> CAST(unicode(s[i]) AS HUGEINT))),
        (acc, b) -> ((acc - acc % 256 +
                      xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
                     * 1099511628211) % 18446744073709551616) AS hu
      FROM fk),
    sampled AS (SELECT doc_id, lang, text FROM fh
      WHERE ((CAST(CASE WHEN hu >= 9223372036854775808
              THEN hu - 18446744073709551616 ELSE hu END AS BIGINT)
              % 100) + 100) % 100 <
            CASE WHEN lang = 'en' THEN 50 ELSE 80 END),
    pt AS (SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
           FROM sampled),
    pw AS (SELECT doc_id, lang, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang
                    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS start_off
           FROM pt)
    SELECT doc_id, lang, n_tokens,
           start_off // 512 AS seq_id, start_off % 512 AS seq_off
    FROM pw ORDER BY doc_id"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curate_pipeline" -> (q_curate_pipeline _),
    "q_pii_redact" -> (q_pii_redact _),
    "q_quality_repetition" -> (q_quality_repetition _),
    "q_sample_stratified" -> (q_sample_stratified _),
    "q_pack_sequences" -> (q_pack_sequences _))

  def oracleSql: Map[String, String] = Map(
    "q_curate_pipeline" -> q_curate_pipeline_sql,
    "q_pii_redact" -> q_pii_redact_sql,
    "q_quality_repetition" -> q_quality_repetition_sql,
    "q_sample_stratified" -> q_sample_stratified_sql,
    "q_pack_sequences" -> q_pack_sequences_sql)
}
