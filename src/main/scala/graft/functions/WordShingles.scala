package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, first-occurrence
  * order, space-joined — with whole-stage codegen.
  *
  * The dedup family's per-document hot loop: every Jaccard / MinHash /
  * corpus-dedup pass builds this array for every document. The
  * equivalent Catalyst HOF chain
  * (array_distinct(transform(sequence(...), i -> array_join(slice(...)))))
  * evaluates interpreted — per-position lambda dispatch, a sliced copy
  * and a joined string per shingle, then a distinct pass. This primitive
  * does one hashed-set probe and one rope concat per position inside
  * codegen. Output set and order are identical to the HOF chain
  * (array_distinct also keeps first occurrence), so swapping the
  * implementation cannot change any query result.
  *
  * Reference analog: Hive builds shingles row-at-a-time inside its
  * ngram estimator (ql/udf/generic/NGramEstimator.java:63) — same
  * contract, interpreted; this is the codegen re-expression.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string> and n >= 1, got " +
        s"${child.dataType}, n=$n")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  protected override def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** ALL sequential word n-grams (duplicates kept, positional order),
  * space-joined — the repetition-profile variant of [[WordShingles]].
  * Replaces the interpreted `transform(sequence(...), i ->
  * array_join(slice(...)))` chain, which pays a lambda dispatch, a
  * sliced array copy, and a join per position outside codegen. */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_grams requires array<string> and n >= 1, got " +
        s"${child.dataType}, n=$n")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  protected override def nullSafeEval(input: Any): Any =
    WordShingles.grams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  /** All space-joined n-grams in positional order, duplicates kept. */
  def grams(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val out = len - n + 1
    if (out <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = tokens.getUTF8String(i); i += 1 }
    val arr = new Array[Any](out)
    i = 0
    while (i < out) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks(i + j); j += 1 }
      arr(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(arr)
  }

  /** Distinct space-joined n-grams, first-occurrence order. */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val out = len - n + 1
    if (out <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = tokens.getUTF8String(i); i += 1 }
    val seen = new java.util.LinkedHashSet[UTF8String](out * 2)
    i = 0
    while (i < out) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val arr = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }
}
