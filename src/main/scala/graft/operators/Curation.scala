package graft.operators

import graft.functions.GapFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines (north-star
  * extras, BASELINE.json): PII detection/redaction, intra-document
  * repetition metrics, deterministic stratified sampling, and sequence
  * packing.
  *
  * Scale design: PII and sampling are pure column expressions (one scan,
  * no shuffle, whole-stage codegen — regexps and the codegen'd FNV
  * fingerprint). Repetition is explode -> two-level partial agg keyed by
  * (doc, gram) — the shuffle carries gram counts, never documents.
  * Packing is one window pass per stratum: at 100 TB each language
  * partitions independently and the running sum never leaves its
  * executor except at stratum boundaries.
  */
object Curation {

  /** Conservative pattern set, identical semantics under Java regex and
    * RE2 (no lookaround/backrefs — both engines must agree for the
    * oracle to hash-match). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{4}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-document PII hit counts + the redacted text (emails first so
    * their digit runs can't be re-matched as phone/IP fragments). One
    * scan, zero shuffle. */
  def piiRedact(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val txt = col(textCol)
    def hits(re: String): Column =
      size(regexp_extract_all(txt, lit(re), lit(0)))
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(txt, EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]"),
        Ipv4Re, "[IP]")
    docs.select(col(idCol),
      hits(EmailRe).as("n_emails"),
      hits(PhoneRe).as("n_phones"),
      hits(Ipv4Re).as("n_ips"),
      redacted.as("redacted"))
  }

  /** Per-document n-gram repetition profile (the Gopher-style "fraction
    * of the doc that is its most repeated n-gram" quality signal): total
    * n-grams, the dominant n-gram (count ties broken by smallest gram —
    * deterministic under any partitioning), and its mass fraction.
    * Explode -> partial agg on (doc, gram) -> one window pass per doc.
    */
  def repetitionStats(docs: DataFrame, n: Int = 2,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // codegen'd gram build (graft.functions.WordGrams): identical output
    // to the interpreted transform/slice/array_join chain it replaced
    def grams: Column = {
      import org.apache.spark.sql.GraftSqlShim
      GraftSqlShim.column(graft.functions.WordGrams(
        GraftSqlShim.expression(col("tks")), n))
    }
    // conditional spread before the tokenize+explode hot loop (no-op
    // when the scan is already parallel — see Engine.spread)
    val counts = graft.Engine.spread(docs, col(idCol))
      .select(col(idCol).as("id"), toks.as("tks"))
      .filter(size(col("tks")) >= n)
      .select(col("id"), explode(grams).as("gram"))
      .groupBy("id", "gram").agg(count(lit(1)).as("cnt"))
    // dominant gram via one partial-aggregable groupBy, no window sort:
    // min of (-cnt, gram) is max count with ties to the smallest gram —
    // the same deterministic tie-break as ORDER BY cnt DESC, gram
    counts
      .groupBy(col("id").as(idCol))
      .agg(sum(col("cnt")).as("n_grams"),
        min(struct((-col("cnt")).as("nc"), col("gram").as("g"))).as("top"))
      .select(col(idCol), col("n_grams"),
        col("top.g").as("top_gram"), (-col("top.nc")).as("top_cnt"),
        ((-col("top.nc")).cast("double") / col("n_grams")).as("top_frac"))
  }

  /** Deterministic stratified sampling: a document is kept iff
    * pmod(fingerprint64(stratum ':' id), 100) < its stratum's keep
    * percentage. No randomness, no sort — the same rows survive on any
    * cluster, any partitioning, any engine (the oracle replays the FNV
    * fold in SQL). This is how a 100 TB pipeline downsamples
    * overrepresented strata (e.g. English) in one scan. */
  def stratifiedSample(docs: DataFrame, strataCol: String,
                       pctByStratum: Map[String, Int], defaultPct: Int,
                       idCol: String = "doc_id"): DataFrame = {
    val bucket = pmod(GapFunctions.fingerprint64(
      concat(col(strataCol), lit(":"), col(idCol).cast("string"))), lit(100))
    val pct = pctByStratum.foldLeft(lit(defaultPct)) {
      case (els, (s, p)) => when(col(strataCol) === s, lit(p)).otherwise(els)
    }
    docs.withColumn("bucket", bucket).filter(col("bucket") < pct)
  }

  /** End-to-end corpus curation — the full training-data pipeline as
    * one composable operator: repetition-quality filter -> exact dedup
    * -> transitive near-dedup -> benchmark decontamination ->
    * stratified downsampling -> sequence packing. Every stage is one of
    * this engine's primitives, so the whole chain keeps their scale
    * contracts (single scans, broadcast/inverted-index joins, bounded
    * shuffles) and the composite output is hash-checked end to end
    * against an oracle that replays the chain in SQL. */
  def curateCorpus(docs: DataFrame, evalSet: DataFrame,
                   maxTopGramFrac: Double = 0.2,
                   jaccardThreshold: Double = 0.5,
                   maxShingleFreq: Option[Int] = Some(1000),
                   decontamNgram: Int = 5, decontamMinShared: Int = 2,
                   pctByStratum: Map[String, Int] = Map("en" -> 50),
                   defaultPct: Int = 80, seqLen: Int = 512,
                   strataCol: String = "lang",
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    // Each stage's survivor set feeds 2+ downstream consumers; the lazy
    // checkpoints materialize every stage exactly once instead of
    // re-deriving the whole upstream chain per consumer. (A production
    // 100 TB run would write intermediate tables at the same
    // boundaries.)
    // conditional spread at the pipeline head: every checkpointed stage
    // inherits this partitioning, so one spread parallelizes the whole
    // chain past an unsplittable local input (no-op at cluster scale)
    val docsSpread = graft.Engine.spread(docs, col(idCol))
    // 1. repetition-quality gate (docs too short for a bigram pass)
    val rep = repetitionStats(docsSpread, n = 2, textCol, idCol)
      .select(col(idCol), col("top_frac"))
    val quality = docsSpread.join(rep, Seq(idCol), "left")
      .filter(col("top_frac").isNull || col("top_frac") <= maxTopGramFrac)
      .drop("top_frac")
      .localCheckpoint(eager = false)
    // 2. exact dedup: smallest id per content hash survives
    val keepExact = quality
      .groupBy(md5(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as("__keep"))
      .select(col("__keep").as(idCol))
    val exact = quality.join(keepExact, Seq(idCol), "left_semi")
      .localCheckpoint(eager = false)
    // 3. transitive near-dedup (inverted-index Jaccard + connected
    //    components). The stop-shingle cap defaults on for production
    //    corpora; the oracle-checked query passes None so engine and
    //    oracle compute the same function by construction.
    val near = Dedup.dedupCorpus(exact, jaccardThreshold,
        maxShingleFreq = maxShingleFreq, textCol = textCol, idCol = idCol)
      .localCheckpoint(eager = false)
    // 4. benchmark decontamination: drop docs quoting the eval set
    val dirty = Dedup.contamination(near, evalSet, decontamNgram,
        decontamMinShared, textCol, idCol)
      .select(col("doc_id").as(idCol)).distinct()
    val clean = near.join(dirty, Seq(idCol), "left_anti")
    // 5. deterministic stratified downsampling
    val sampled = stratifiedSample(clean, strataCol, pctByStratum,
      defaultPct, idCol).drop("bucket")
    // 6. pack the survivors into training sequences
    packSequences(sampled, seqLen, strataCol, textCol, idCol)
  }

  /** Next-fit sequence packing: within each stratum, documents in id
    * order are laid end-to-end and cut into fixed-size token windows;
    * each doc reports its window (`seq_id`) and offset in it.
    *
    * Distributed prefix sum, NOT one window partition per stratum — a
    * single-language 100 TB corpus would otherwise funnel through one
    * task. Docs bucket by id range; each bucket cumsums locally, bucket
    * totals (one row per bucket) take a tiny second-level scan, and the
    * bucket base offsets join back. Identical output to the
    * single-window formulation at any `idBucket` size. */
  def packSequences(docs: DataFrame, seqLen: Int,
                    strataCol: String = "lang",
                    textCol: String = "text",
                    idCol: String = "doc_id",
                    idBucket: Long = 1000L): DataFrame = {
    val nToks = size(TextAnalysis.tokens(col(textCol)))
    val base = docs
      .select(col(idCol), col(strataCol), nToks.cast("long").as("n_tokens"))
      .withColumn("__b", expr(s"$idCol div $idBucket"))
    val wLocal = Window.partitionBy(col(strataCol), col("__b")).orderBy(idCol)
    val local = base.withColumn("local_off", coalesce(
      sum(col("n_tokens")).over(
        wLocal.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // per-(stratum, bucket) totals: one row each — the second-level
    // prefix runs over bucket counts, not documents
    val wBuckets = Window.partitionBy(strataCol).orderBy("__b")
    val bases = base.groupBy(col(strataCol), col("__b"))
      .agg(sum(col("n_tokens")).as("__t"))
      .withColumn("bucket_base", coalesce(
        sum(col("__t")).over(
          wBuckets.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(strataCol), col("__b"), col("bucket_base"))
    local.join(bases, Seq(strataCol, "__b"))
      .withColumn("start_off", col("bucket_base") + col("local_off"))
      .select(col(idCol), col(strataCol), col("n_tokens"),
        expr(s"start_off div $seqLen").as("seq_id"),
        pmod(col("start_off"), lit(seqLen.toLong)).as("seq_off"))
  }
}
