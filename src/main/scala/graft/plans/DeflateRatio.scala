package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio text-quality signal: deflate(text).length /
  * text.length over UTF-8 bytes — boilerplate and templated spam
  * compress far better than natural prose, making a LOW ratio a
  * machine-generated/repetitive-content flag (the compression filter
  * of the CCNet/Gopher family, complementing the token-level
  * repetition signals in TextStats).
  *
  * Compression requires a real library call per row, so this is a
  * codegen'd Expression (one invokestatic inside WholeStageCodegen)
  * rather than a UDF. The Deflater is configured identically
  * everywhere (level 6, default strategy, raw deflate) so the score
  * is deterministic for a given JDK; there is no SQL-expressible
  * oracle for zlib, so verification is property-based
  * (TextStatsSpec): bounds, determinism, and the repetitive <
  * natural < random ordering the signal exists to detect.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    DeflateRatio.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DeflateRatio.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {

  /** compressed/raw byte ratio; empty text -> 1.0 (nothing to judge). */
  def compute(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, true) // raw deflate, no header
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](1024)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / raw.length.toDouble
    } finally d.end()
  }

  /** Column-DSL handle (registered in GraftExtensions). */
  def apply(text: Column): Column =
    org.apache.spark.sql.functions.call_function("deflate_ratio", text)
}
