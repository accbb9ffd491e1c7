package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Clean-room port of the reference's streaming histogram
  * (ql/udf/generic/NumericHistogram.java — the Ben-Haim & Tom-Tov
  * "Streaming Parallel Decision Tree" sketch, JMLR 2010) plus the two
  * aggregates built on it: `histogram_numeric`
  * (GenericUDAFHistogramNumeric) and `percentile_approx`
  * (GenericUDAFPercentileApprox).
  *
  * The reference's result depends on ARRIVAL ORDER and on a
  * fixed-seed PRNG for tie-breaks (NumericHistogram.java:70
  * `new Random(31183)`); the qtest goldens pin the single-mapper
  * file-order run. To reproduce it bit-for-bit, the aggregate buffers
  * values in encounter order (partials concatenate in merge order)
  * and runs the add()/trim() stream once at finish — identical to the
  * one-mapper execution the goldens recorded. The buffer is bounded:
  * past [[HiveHistogram.MaxBuffered]] values the stream collapses
  * through trim() early (still the reference algorithm, but the
  * result can then differ from a one-pass run — at 100 TB scale use
  * Spark's native histogram_numeric / percentile_approx, which
  * sketch with constant memory).
  */
object HiveHistogram {

  val MaxBuffered = 1 << 20

  final case class Bin(var x: Double, var y: Double)

  /** trim() (NumericHistogram.java:244-262): merge the two closest
    * bins until `nbins` remain; equal-diff ties break through the
    * histogram's PRNG stream. */
  private def trimBins(bins: java.util.ArrayList[Bin], nbins: Int,
      prng: java.util.Random): Unit = {
    while (bins.size > nbins) {
      var smallestdiff = bins.get(1).x - bins.get(0).x
      var smallestdiffloc = 0
      var smallestdiffcount = 1
      var i = 1
      while (i < bins.size - 1) {
        val diff = bins.get(i + 1).x - bins.get(i).x
        if (diff < smallestdiff) {
          smallestdiff = diff
          smallestdiffloc = i
          smallestdiffcount = 1
        } else if (diff == smallestdiff) {
          smallestdiffcount += 1
          if (prng.nextDouble() <= 1.0 / smallestdiffcount)
            smallestdiffloc = i
        }
        i += 1
      }
      val a = bins.get(smallestdiffloc)
      val b = bins.get(smallestdiffloc + 1)
      val d = a.y + b.y
      a.x *= a.y / d
      a.x += b.x / d * b.y
      a.y = d
      bins.remove(smallestdiffloc + 1)
    }
  }

  /** The add()/trim() stream (NumericHistogram.java:173-262) over
    * `values` in order. Returns the used bins, x-ascending. */
  def build(values: Seq[Double], nbins: Int): Array[Bin] = {
    val prng = new java.util.Random(31183)
    val bins = new java.util.ArrayList[Bin]()
    def trim(): Unit = trimBins(bins, nbins, prng)

    values.foreach { v =>
      // binary search for the insertion point, matching the
      // reference's loop exactly (add(), NumericHistogram.java:180)
      var bin = 0
      var l = 0
      var r = bins.size
      var exact = false
      while (l < r && !exact) {
        bin = (l + r) / 2
        if (bins.get(bin).x > v) r = bin
        else if (bins.get(bin).x < v) { bin += 1; l = bin }
        else exact = true
      }
      if (bin < bins.size && bins.get(bin).x == v) bins.get(bin).y += 1
      else {
        bins.add(bin, Bin(v, 1))
        if (bins.size > nbins) trim()
      }
    }
    bins.toArray(new Array[Bin](bins.size))
  }

  /** NumericHistogram.quantile (line 264): cumulative-count walk with
    * linear interpolation from the previous bin center. */
  def quantile(bins: Array[Bin], q: Double): Double = {
    val sum = bins.map(_.y).sum
    var csum = 0.0
    var b = 0
    while (b < bins.length) {
      csum += bins(b).y
      if (csum / sum >= q) {
        if (b == 0) return bins(b).x
        csum -= bins(b).y
        return bins(b - 1).x +
          (q * sum - csum) * (bins(b).x - bins(b - 1).x) / bins(b).y
      }
      b += 1
    }
    -1
  }

  /** NumericHistogram.merge replay (lines 134-171): fold each
    * incoming partial's bins into the reducer histogram — concatenate
    * (existing bins first), stable-sort by x, trim. ONE PRNG (the
    * reducer histogram's own `Random(31183)`) serves every merge the
    * reducer performs. */
  def mergePartials(parts: Seq[Seq[Bin]], nbins: Int): Array[Bin] = {
    val prng = new java.util.Random(31183)
    val bins = new java.util.ArrayList[Bin]()
    parts.foreach { p =>
      val wasEmpty = bins.isEmpty
      p.foreach(b => bins.add(Bin(b.x, b.y)))
      if (!wasEmpty) {
        bins.sort((a: Bin, b: Bin) => java.lang.Double.compare(a.x, b.x))
        trimBins(bins, nbins, prng)
      }
    }
    bins.toArray(new Array[Bin](bins.size))
  }

  private def push(b: Vector[Double], v: java.lang.Double): Vector[Double] =
    if (v == null || b.length >= MaxBuffered) b else b :+ v.doubleValue()

  /** histogram_numeric(col, nbins) -> array<struct<x,y>>. */
  class HistogramNumericAgg(nbins: Int)
      extends Aggregator[java.lang.Double, Vector[Double], Seq[Bin]] {
    override def zero: Vector[Double] = Vector.empty
    override def reduce(b: Vector[Double], v: java.lang.Double) = push(b, v)
    override def merge(a: Vector[Double], b: Vector[Double]) = a ++ b
    override def finish(r: Vector[Double]): Seq[Bin] =
      if (r.isEmpty) null else build(r, nbins).toSeq
    override def bufferEncoder: Encoder[Vector[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Bin]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** percentile_approx(col, ps, nbins) -> array<double> (the builder
    * unwraps element 1 for the scalar form). */
  class PercentileApproxAgg(qs: Seq[Double], nbins: Int)
      extends Aggregator[java.lang.Double, Vector[Double], Seq[Double]] {
    override def zero: Vector[Double] = Vector.empty
    override def reduce(b: Vector[Double], v: java.lang.Double) = push(b, v)
    override def merge(a: Vector[Double], b: Vector[Double]) = a ++ b
    override def finish(r: Vector[Double]): Seq[Double] =
      if (r.isEmpty) null
      else {
        val bins = build(r, nbins)
        qs.map(q => quantile(bins, q))
      }
    override def bufferEncoder: Encoder[Vector[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** percentile_approx over EXPLICIT map-task partials: each value is
    * tagged with a part label; one NumericHistogram partial builds per
    * part (values in encounter order), and finish merges the partials
    * in ascending label order through [[mergePartials]] — the
    * reference's reducer-side merge (GenericUDAFPercentileApprox
    * merge). Golden replay labels parts by the recorded hadoop
    * shuffle-fetch order, which the udaf_percentile_approx_20/23
    * goldens pin (the .q files note "0.23 changed input order of data
    * in reducer task, which affects result of percentile_approx");
    * the production aggregate is [[PercentileApproxAgg]]. */
  class PercentileApproxPartsAgg(qs: Seq[Double], nbins: Int)
      extends Aggregator[(Int, java.lang.Double),
        Vector[(Int, Double)], Seq[Double]] {
    override def zero: Vector[(Int, Double)] = Vector.empty
    override def reduce(b: Vector[(Int, Double)],
        v: (Int, java.lang.Double)): Vector[(Int, Double)] =
      if (v._2 == null || b.length >= MaxBuffered) b
      else b :+ (v._1 -> v._2.doubleValue())
    override def merge(a: Vector[(Int, Double)],
        b: Vector[(Int, Double)]): Vector[(Int, Double)] = a ++ b
    override def finish(r: Vector[(Int, Double)]): Seq[Double] =
      if (r.isEmpty) null
      else {
        val byPart = r.groupBy(_._1) // values keep encounter order
        val partials = byPart.keys.toSeq.sorted.map(p =>
          build(byPart(p).map(_._2), nbins).toSeq)
        val bins = mergePartials(partials, nbins)
        qs.map(q => quantile(bins, q))
      }
    override def bufferEncoder: Encoder[Vector[(Int, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
