package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.11): the reference's
  * GenericUDAFEvaluator contract — modes PARTIAL1/PARTIAL2/FINAL/COMPLETE
  * with iterate/terminatePartial/merge/terminate
  * (ql/udf/generic/GenericUDAFEvaluator.java:70-88,192-210) — maps 1:1
  * onto Spark's `Aggregator[IN, BUF, OUT]`: `reduce` = iterate,
  * buffer encoder = terminatePartial, `merge` = merge, `finish` =
  * terminate; Catalyst inserts the partial/final split automatically.
  */
object Aggregators {

  /** Exact weighted average — the canonical partial-aggregatable UDAF
    * (numerator/denominator buffer merges associatively). */
  case class WSum(sum: Double, weight: Double)

  class WeightedAvg extends Aggregator[(Double, Double), WSum, Double] {
    override def zero: WSum = WSum(0d, 0d)
    override def reduce(b: WSum, in: (Double, Double)): WSum =
      WSum(b.sum + in._1 * in._2, b.weight + in._2)
    override def merge(a: WSum, b: WSum): WSum =
      WSum(a.sum + b.sum, a.weight + b.weight)
    override def finish(r: WSum): Double =
      if (r.weight == 0) Double.NaN else r.sum / r.weight
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k strings by count — a buffer-bounded sketch aggregator
    * in the spirit of Hive's `ngrams` estimation cap
    * (GenericUDAFnGrams precision factor). Buffer holds at most
    * `cap` entries; merge keeps the heaviest. */
  case class TopKBuf(counts: Map[String, Long])

  class TopKStrings(k: Int, cap: Int = 1024)
      extends Aggregator[String, TopKBuf, Seq[(String, Long)]] {
    override def zero: TopKBuf = TopKBuf(Map.empty)
    // amortized trim: let the buffer grow to 2x cap, then one O(cap log
    // cap) sort halves it — O(log cap) per insert instead of a full
    // re-sort on EVERY over-cap insert
    private def trim(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= cap * 2) m
      else m.toSeq.sortBy { case (s, n) => (-n, s) }.take(cap).toMap
    override def reduce(b: TopKBuf, in: String): TopKBuf =
      TopKBuf(trim(b.counts.updated(in, b.counts.getOrElse(in, 0L) + 1L)))
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      val m = b.counts.foldLeft(a.counts) { case (acc, (s, n)) =>
        acc.updated(s, acc.getOrElse(s, 0L) + n)
      }
      TopKBuf(trim(m))
    }
    override def finish(r: TopKBuf): Seq[(String, Long)] =
      r.counts.toSeq.sortBy { case (s, n) => (-n, s) }.take(k)
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Output row of the Hive ngrams family: the gram as a token array +
    * estimated frequency (ql/udf/generic/GenericUDAFnGrams.java output
    * inspector). */
  case class NgramFreq(ngram: Seq[String], estfrequency: Double)

  private val Sep = "\u0001"

  private def topK(m: Map[String, Long], k: Int): Seq[NgramFreq] =
    m.toSeq.sortBy { case (g, c) => (-c, g) }.take(k)
      .map { case (g, c) => NgramFreq(g.split(Sep).toSeq, c.toDouble) }

  private def bounded(m: Map[String, Long], cap: Int): Map[String, Long] =
    if (m.size <= cap * 2) m
    else m.toSeq.sortBy { case (g, c) => (-c, g) }.take(cap).toMap

  /** Hive `ngrams(array<array<string>>, n, k)` UDAF
    * (GenericUDAFnGrams.java): top-k n-grams per sentence list; the
    * buffer is frequency-bounded like Hive's precision factor. */
  class NgramsAgg(n: Int, k: Int, cap: Int = 4096)
      extends Aggregator[Seq[Seq[String]], TopKBuf, Seq[NgramFreq]] {
    override def zero: TopKBuf = TopKBuf(Map.empty)
    override def reduce(b: TopKBuf, sentences: Seq[Seq[String]]): TopKBuf = {
      var m = b.counts
      if (sentences != null) sentences.foreach { s =>
        if (s != null && s.length >= n) {
          var i = 0
          while (i <= s.length - n) {
            val g = s.slice(i, i + n).mkString(Sep)
            m = m.updated(g, m.getOrElse(g, 0L) + 1L)
            i += 1
          }
        }
      }
      TopKBuf(bounded(m, cap))
    }
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf(bounded(b.counts.foldLeft(a.counts) { case (acc, (g, c)) =>
        acc.updated(g, acc.getOrElse(g, 0L) + c)
      }, cap))
    override def finish(r: TopKBuf): Seq[NgramFreq] = topK(r.counts, k)
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[NgramFreq]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Hive `context_ngrams(array<array<string>>, array(pattern...), k)`
    * (GenericUDAFContextNGrams.java): nulls in the pattern are holes;
    * top-k hole fillers where the fixed words match. */
  class ContextNgramsAgg(pattern: Seq[Option[String]], k: Int,
                         cap: Int = 4096)
      extends Aggregator[Seq[Seq[String]], TopKBuf, Seq[NgramFreq]] {
    private val len = pattern.length
    override def zero: TopKBuf = TopKBuf(Map.empty)
    override def reduce(b: TopKBuf, sentences: Seq[Seq[String]]): TopKBuf = {
      var m = b.counts
      if (sentences != null) sentences.foreach { s =>
        if (s != null && s.length >= len) {
          var i = 0
          while (i <= s.length - len) {
            var ok = true
            var j = 0
            while (ok && j < len) {
              pattern(j) match {
                case Some(w) => ok = s(i + j) == w
                case None =>
              }
              j += 1
            }
            if (ok) {
              val g = pattern.zipWithIndex
                .collect { case (None, j2) => s(i + j2) }.mkString(Sep)
              m = m.updated(g, m.getOrElse(g, 0L) + 1L)
            }
            i += 1
          }
        }
      }
      TopKBuf(bounded(m, cap))
    }
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf(bounded(b.counts.foldLeft(a.counts) { case (acc, (g, c)) =>
        acc.updated(g, acc.getOrElse(g, 0L) + c)
      }, cap))
    override def finish(r: TopKBuf): Seq[NgramFreq] = topK(r.counts, k)
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[NgramFreq]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Register SQL-callable forms (Hive: CREATE TEMPORARY FUNCTION;
    * ref ql/parse/FunctionSemanticAnalyzer.java). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("weighted_avg",
      org.apache.spark.sql.functions.udaf(new WeightedAvg))
  }
}
