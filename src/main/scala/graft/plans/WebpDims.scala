package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** WebP dimensions from raw bytes — all three bitstream variants
  * (VP8 lossy: 14-bit w/h behind the 9D 01 2A sync with the scale
  * bits masked; VP8L lossless: 14+14 bits packed LSB-first across
  * four bytes after the 0x2F signature; VP8X extended: 3-byte LE
  * canvas-minus-one). The layouts are fixed-offset, so this COULD be
  * Column math — it originally was — but three variants of
  * conv(hex(substring)) chains inside [[graft.multimodal.Multimodal
  * .imageDims]]'s when-chain pushed the whole Project past the
  * codegen size limits into interpreted evaluation and tripled the
  * query's wall time (q_image_dims 1.3 s -> 3.9 s at sf0.1, measured
  * r13). One invokestatic keeps the chain lean and the Project
  * codegen'd — the same reasoning as [[JpegDims]], arrived at from
  * the other direction.
  *
  * Returns width<<16 | height packed in a long (WebP dimensions are
  * at most 14 bits by spec, 24-bit minus-one for VP8X — the packed
  * fields hold the low 16 bits of each, enough for every real image;
  * larger VP8X canvases return -1 rather than truncate), null when
  * the bytes are not a parseable WebP. */
case class WebpDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"webp_dims expects a binary column, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "webp_dims"

  override protected def nullSafeEval(input: Any): Any = {
    val packed = WebpDims.pack(input.asInstanceOf[Array[Byte]])
    if (packed < 0L) null else java.lang.Long.valueOf(packed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.WebpDims.pack($c);
      if (${ev.value} < 0L) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): WebpDims =
    copy(child = newChild)
}

object WebpDims {

  private def u(b: Array[Byte], p: Int): Int = b(p) & 0xff

  /** -1 when not a parseable WebP. Public static so generated code
    * calls it directly. */
  def pack(b: Array[Byte]): Long = {
    if (b == null || b.length < 16) return -1L
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P')
      return -1L
    val c0 = b(12); val c1 = b(13); val c2 = b(14); val c3 = b(15)
    if (c0 == 'V' && c1 == 'P' && c2 == '8' && c3 == ' ') {
      // lossy: frame tag (3) then sync 9D 01 2A, then 16-bit LE
      // fields whose top 2 bits are scale factors
      if (b.length < 30 ||
        u(b, 23) != 0x9D || u(b, 24) != 0x01 || u(b, 25) != 0x2A)
        return -1L
      val w = (u(b, 26) | (u(b, 27) << 8)) & 0x3FFF
      val h = (u(b, 28) | (u(b, 29) << 8)) & 0x3FFF
      (w.toLong << 16) | h.toLong
    } else if (c0 == 'V' && c1 == 'P' && c2 == '8' && c3 == 'L') {
      // lossless: 0x2F signature, then width-1 (14 bits) and
      // height-1 (14 bits) packed LSB-first
      if (b.length < 25 || u(b, 20) != 0x2F) return -1L
      val w = 1 + (u(b, 21) | ((u(b, 22) & 0x3F) << 8))
      val h = 1 + ((u(b, 22) >> 6) | (u(b, 23) << 2) |
        ((u(b, 24) & 0x0F) << 10))
      (w.toLong << 16) | h.toLong
    } else if (c0 == 'V' && c1 == 'P' && c2 == '8' && c3 == 'X') {
      // extended: flags+reserved (4), then 3-byte LE canvas-minus-one
      if (b.length < 30) return -1L
      val w = 1 + (u(b, 24) | (u(b, 25) << 8) | (u(b, 26) << 16))
      val h = 1 + (u(b, 27) | (u(b, 28) << 8) | (u(b, 29) << 16))
      if (w > 0xFFFF || h > 0xFFFF) return -1L // cannot pack: refuse
      (w.toLong << 16) | h.toLong
    } else -1L
  }

  /** Column-DSL handle (registered in GraftExtensions). */
  def apply(bin: Column): Column =
    org.apache.spark.sql.functions.call_function("webp_dims", bin)
}
