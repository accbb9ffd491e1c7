package graft.operators

import graft.functions.GapFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus pipelines: token
  * counting, quality scoring, language ID, document fingerprinting.
  *
  * All operators are pure column expressions (whole-stage codegen, no
  * UDFs) so a 100 TB corpus pass is a single scan with no shuffle; the
  * only shuffling operator here is `topNgrams` (partial-agg on gram).
  *
  * Reference analogs: Hive ships `sentences`, `ngrams`, `context_ngrams`
  * (ql/udf/generic/GenericUDAFnGrams.java, GenericUDFSentences.java) but
  * no quality/langid/fingerprint operators — those are the north-star
  * extras (BASELINE.json).
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  private val stopwords = Seq("the", "a", "and", "of", "to")

  /** Codegen'd count of tokens in a literal word set (one hashed probe
    * per token; see graft.functions.TokenSetCount — interpreted
    * size(filter(..)) HOFs were the corpus-scan hot spot). */
  private def setHits(toks: Column, ws: Seq[String]): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(graft.functions.TokenSetCount(
      GraftSqlShim.expression(toks), ws))
  }

  /** Per-document token/char/quality statistics. Exact integer counts
    * with double ratios — deterministic under any partitioning. */
  def textStats(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks)
    val nChars = length(col(textCol))
    val nAlpha = length(regexp_replace(col(textCol), "\\s+", ""))
    val nUniq = size(array_distinct(toks))
    val nStop = setHits(toks, stopwords)
    docs.select(col(idCol),
      n.as("n_tokens"),
      nChars.as("n_chars"),
      (nAlpha.cast("double") / n).as("avg_token_len"),
      (nStop.cast("double") / n).as("stop_ratio"),
      (nUniq.cast("double") / n).as("uniq_ratio"),
      ((nUniq.cast("double") / n) * least(n.cast("double") / 50, lit(1d)))
        .as("quality_score"))
  }

  /** GPT-2-style pre-tokenizer segments: a leading-space word, number,
    * or punctuation run. RE2-compatible (no lookahead) so the DuckDB
    * oracle replays it verbatim. */
  private[graft] val preTokenRe =
    " ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  /** Token counting at the three granularities a training pipeline
    * budgets with: whitespace tokens, BPE pre-tokenizer segments, and a
    * BPE-ish subword estimate (ceil(len/4) per segment — the classic
    * ~4-chars-per-token heuristic, integer math for cross-engine
    * parity). Pure column expressions: one scan, no shuffle. */
  def tokenCounts(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val pre = regexp_extract_all(col(textCol), lit(preTokenRe), lit(0))
    docs.select(col(idCol), col(textCol), pre.as("pre"))
      .select(col(idCol),
        size(tokens(col(textCol))).as("n_ws_tokens"),
        size(col("pre")).as("n_pretokens"),
        aggregate(col("pre"), lit(0), (acc, t) =>
          acc + ((length(t) + lit(3)) / lit(4)).cast("int"))
          .as("n_bpeish_tokens"))
  }

  /** Stopword-profile language ID (n-gram heuristic simplified to
    * function-word hits; deterministic argmax with fixed tie order). */
  def langId(docs: DataFrame, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    def hits(ws: Seq[String]) = setHits(toks, ws)
    val en = hits(Seq("the", "a", "and", "of", "to"))
    val de = hits(Seq("der", "die", "das", "und"))
    val es = hits(Seq("el", "los", "las", "y"))
    val fr = hits(Seq("le", "les", "et", "ou"))
    docs.select(col(idCol),
      en.as("en_hits"), de.as("de_hits"), es.as("es_hits"), fr.as("fr_hits"),
      when(greatest(en, de, es, fr) === 0, "und")
        .when(en >= greatest(de, es, fr), "en")
        .when(de >= greatest(es, fr), "de")
        .when(es >= fr, "es")
        .otherwise("fr").as("pred_lang"))
  }

  /** 64-bit content fingerprint over whitespace-normalized lowercase text
    * (native codegen'd expression — see graft.functions.Fingerprint64). */
  def fingerprints(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      GapFunctions.fingerprint64(
        regexp_replace(lower(trim(col(textCol))), "\\s+", " ")).as("fp"))

  /** Hive `context_ngrams(sentences, array("the", null), k)` — top-k
    * fillers for the holes (nulls) in a context pattern (ref:
    * ql/udf/generic/GenericUDAFContextNGrams.java). Re-expressed as
    * gram-explode -> fixed-position filter -> hole projection -> top-k;
    * same shuffle shape as topNgrams. */
  def contextNgrams(docs: DataFrame, pattern: Seq[Option[String]], k: Int,
                    textCol: String = "text"): DataFrame = {
    val n = pattern.length
    require(n >= 2 && pattern.exists(_.isEmpty) && pattern.exists(_.nonEmpty))
    val gramArr = expr(
      s"transform(sequence(0, size(tks) - $n), i -> slice(tks, i + 1, $n))")
    val fixed = pattern.zipWithIndex
      .collect { case (Some(w), i) => col("g").getItem(i) === w }
      .reduce(_ && _)
    val holes = pattern.zipWithIndex
      .collect { case (None, i) => col("g").getItem(i) }
    docs.select(tokens(col(textCol)).as("tks"))
      .filter(size(col("tks")) >= n)
      .select(explode(gramArr).as("g"))
      .filter(fixed)
      .select(concat_ws(" ", holes: _*).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
  }

  /** Top-k characteristic terms per document by tf-idf. The idf is the
    * rational N/df (log-free: ln is monotone, so per-term ordering is
    * the classic one, and staying inside IEEE +,*,/ keeps the scores
    * bit-identical across engines — the oracle hash-matches). Shape:
    * explode -> (doc, term) partial agg -> shuffle join with the
    * document-frequency table -> one per-doc window. The df table is
    * one row per DISTINCT TERM — at corpus scale that's a
    * billions-of-rows vocabulary, so it must NOT be broadcast; AQE
    * still picks a broadcast join when the vocabulary is genuinely
    * small. Only the corpus total (one row) rides in broadcast. */
  def tfidfTopTerms(docs: DataFrame, k: Int, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col(idCol)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"),
        (col("tf").cast("double") *
          (col("n").cast("double") / col("df"))).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .withColumnRenamed("id", idCol)
  }

  /** Top-k n-grams with counts (re-expression of Hive's `ngrams` UDAF as
    * explode -> partial-agg -> TakeOrderedAndProject; the shuffle carries
    * (gram, partial count) pairs, never documents). */
  def topNgrams(docs: DataFrame, n: Int, k: Int,
                textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val grams = expr(
      s"""transform(sequence(0, size(tks) - $n),
            i -> array_join(slice(tks, i + 1, $n), ' '))""")
    docs.select(toks.as("tks"))
      .filter(size(col("tks")) >= n)
      .select(explode(grams).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
  }
}
