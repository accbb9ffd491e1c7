package graft.functions

import scala.collection.mutable.ArrayBuffer

/** EWAH64 compressed-bitmap codec — the wire format of the reference's
  * `ewah_bitmap` family (ql/udf/generic/GenericUDAFEWAHBitmap.java uses
  * the javaewah EWAHCompressedBitmap; format per the published EWAH
  * spec: a stream of 64-bit words where each Running Length Word packs
  * `runbit` in bit 0, a 32-bit run length of clean all-`runbit` words in
  * bits 1-32, and a 31-bit count of literal (dirty) words in bits
  * 33-63, followed by those literal words).
  *
  * Encoding is canonical-greedy: all-zero gaps compress into the RLW
  * run field of the following literal batch, maximal all-ones stretches
  * become their own 1-runs, everything else is literal. The byte
  * framing mirrors javaewah's `serialize()`: big-endian `sizeInBits`
  * (int), `wordCount` (int), the words, and the word index of the last
  * RLW (int).
  *
  * The engine's compute format stays the sparse `[chunk, word, ...]`
  * array (BitmapAgg) — `ewah_encode`/`ewah_decode` convert at the
  * boundary, exactly like Hive only materializes EWAH bytes at
  * serialization time.
  */
object Ewah {

  private val MaxRun = 0xFFFFFFFFL // 32-bit run-length field
  private val MaxLit = 0x7FFFFFFFL // 31-bit literal-count field

  private def rlw(runbit: Boolean, runlen: Long, lits: Long): Long =
    (if (runbit) 1L else 0L) | ((runlen & MaxRun) << 1) |
      ((lits & MaxLit) << 33)

  /** Sparse `[chunk, word, ...]` pairs -> (EWAH64 words, index of the
    * last RLW, sizeInBits). */
  private[graft] def encodeWords(pairs: Seq[Long]): (Array[Long], Int, Long) = {
    val entries = pairs.grouped(2)
      .collect { case Seq(c, w) if w != 0L => (c, w) }.toArray.sortBy(_._1)
    val out = ArrayBuffer[Long]()
    var lastRlw = 0
    def emit(runbit: Boolean, runlen: Long, lits: Seq[Long]): Unit = {
      var r = runlen
      while (r > MaxRun) { // split over-long runs across RLWs
        lastRlw = out.length
        out += rlw(runbit, MaxRun, 0)
        r -= MaxRun
      }
      var ls = lits
      lastRlw = out.length
      out += rlw(runbit, r, math.min(ls.length, MaxLit))
      out ++= ls.take(MaxLit.toInt)
      ls = ls.drop(MaxLit.toInt)
      while (ls.nonEmpty) { // split over-long literal batches
        lastRlw = out.length
        out += rlw(runbit = false, 0, math.min(ls.length, MaxLit))
        out ++= ls.take(MaxLit.toInt)
        ls = ls.drop(MaxLit.toInt)
      }
    }
    var pos = 0L // next chunk index to encode
    var i = 0
    while (i < entries.length) {
      val zeroRun = entries(i)._1 - pos
      if (entries(i)._2 == -1L) { // maximal all-ones stretch: a 1-run
        var j = i
        while (j + 1 < entries.length &&
          entries(j + 1)._1 == entries(j)._1 + 1 &&
          entries(j + 1)._2 == -1L) j += 1
        if (zeroRun > 0) emit(runbit = false, zeroRun, Nil)
        emit(runbit = true, j - i + 1, Nil)
        pos = entries(j)._1 + 1
        i = j + 1
      } else { // zero gap + literal batch share one RLW
        var j = i
        while (j + 1 < entries.length &&
          entries(j + 1)._1 == entries(j)._1 + 1 &&
          entries(j + 1)._2 != -1L) j += 1
        emit(runbit = false, zeroRun,
          entries.slice(i, j + 1).map(_._2).toSeq)
        pos = entries(j)._1 + 1
        i = j + 1
      }
    }
    if (out.isEmpty) { lastRlw = 0; out += rlw(runbit = false, 0, 0) }
    val sizeInBits = if (entries.isEmpty) 0L else (entries.last._1 + 1) * 64L
    (out.toArray, lastRlw, sizeInBits)
  }

  /** EWAH64 words -> sparse `[chunk, word, ...]` pairs. */
  private[graft] def decodeWords(words: Seq[Long]): Array[Long] = {
    val out = ArrayBuffer[Long]()
    var chunk = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      val runbit = (w & 1L) == 1L
      val runlen = (w >>> 1) & MaxRun
      val lits = ((w >>> 33) & MaxLit).toInt
      if (runbit) (0L until runlen).foreach { k =>
        out += chunk + k; out += -1L
      }
      chunk += runlen
      (0 until lits).foreach { k =>
        val lw = words(i + 1 + k)
        if (lw != 0L) { out += chunk + k; out += lw }
      }
      chunk += lits
      i += 1 + lits
    }
    out.toArray
  }

  /** Serialize a sparse bitmap to EWAH bytes (javaewah-style framing). */
  def encode(pairs: Seq[Long]): Array[Byte] = {
    val (words, lastRlw, sizeInBits) = encodeWords(pairs)
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + words.length * 8 + 4)
    bb.putInt(sizeInBits.min(Int.MaxValue.toLong).toInt)
    bb.putInt(words.length)
    words.foreach(bb.putLong)
    bb.putInt(lastRlw)
    bb.array()
  }

  /** Parse EWAH bytes back to the sparse `[chunk, word, ...]` format. */
  def decode(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.getInt // sizeInBits (not needed to reconstruct set bits)
    val n = bb.getInt
    require(bytes.length >= 12 + n * 8, "truncated EWAH stream")
    decodeWords(Array.fill(n)(bb.getLong))
  }
}
