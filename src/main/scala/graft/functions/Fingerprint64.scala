package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a document fingerprint over a string's UTF-8 bytes.
  *
  * Backs the text-analysis `fingerprint` operator (document identity for
  * dedup bookkeeping at 100 TB — a fingerprint per doc is 8 bytes vs
  * hundreds for the text). Native Catalyst expression WITH codegen so a
  * full-corpus fingerprint pass stays inside WholeStageCodegen (one virtual
  * call per row, no UDF serialization).
  *
  * The reference's closest analog is its family of hash UDFs
  * (ql/udf/generic/GenericUDFHash.java, ql/udf/UDFCrc32.java) — row-at-a-time
  * interpreted; this is the Spark-first re-expression.
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  protected override def nullSafeEval(input: Any): Any =
    Fingerprint64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  private final val Offset = 0xcbf29ce484222325L
  private final val Prime = 0x100000001b3L

  /** FNV-1a over the UTF-8 bytes. Stable across JVMs/partitionings. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  def hash(s: String): Long = hash(UTF8String.fromString(s))
}
