package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a small literal word set, with
  * whole-stage codegen.
  *
  * The text-analysis hot loop: language-ID and quality scoring count
  * stopword hits per document over the token array. Catalyst's
  * `size(filter(toks, x -> x IN (...)))` evaluates the lambda
  * interpreted (HOFs don't codegen) — one closure dispatch plus boxed
  * comparisons per token per language. This primitive does one hashed
  * set probe per token inside WholeStageCodegen; counts are identical
  * (exact integer membership), so swapping the implementation cannot
  * change any query result.
  *
  * Reference analog: Hive evaluates the same shape via interpreted
  * GenericUDFIn per row (ql/udf/generic/GenericUDFIn.java); this is the
  * codegen-native re-expression.
  */
case class TokenSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_set_count requires array<string>, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_set_count"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  protected override def nullSafeEval(input: Any): Any =
    TokenSetCount.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", set,
      classOf[java.util.HashSet[_]].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenSetCount.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
    copy(child = newChild)
}

object TokenSetCount {
  def count(a: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val len = a.numElements()
    var i = 0
    var n = 0
    while (i < len) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}
