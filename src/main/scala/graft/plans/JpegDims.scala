package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** JPEG frame dimensions from raw bytes — the one image-header format
  * that genuinely cannot be a fixed-offset Column expression: JFIF
  * files interleave variable-length segments (APPn, COM, quant/huffman
  * tables) before the SOF frame header, so finding width/height
  * requires WALKING the segment chain (read marker, read 2-byte
  * length, skip, repeat). That loop is exactly the case for a custom
  * codegen'd Expression ((b) in the build brief's preference order):
  * one invokestatic per row inside WholeStageCodegen, against the
  * alternatives of a Scala UDF (serialization wall) or mapPartitions
  * (leaves codegen entirely).
  *
  * Returns width<<16 | height packed in a long (both fit 16 bits by
  * the JPEG spec), null when the bytes are not a parseable JPEG with
  * an SOF segment. Unpack with shiftright/bitwiseAND —
  * [[graft.multimodal.Multimodal.imageDims]] does, presenting JPEG
  * uniformly beside the fixed-offset PNG/GIF/BMP parses.
  */
case class JpegDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jpeg_dims expects a binary column, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_dims"

  override protected def nullSafeEval(input: Any): Any = {
    val packed = JpegDims.pack(input.asInstanceOf[Array[Byte]])
    if (packed < 0L) null else java.lang.Long.valueOf(packed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.JpegDims.pack($c);
      if (${ev.value} < 0L) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): JpegDims =
    copy(child = newChild)
}

object JpegDims {

  /** Walk the segment chain from SOI to the first SOF0/1/2 frame
    * header; -1 when not a JPEG or no SOF before SOS/EOI/EOF. Public
    * static so generated code calls it directly. */
  def pack(b: Array[Byte]): Long = {
    if (b == null || b.length < 4) return -1L
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return -1L // SOI
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return -1L
      // fill bytes: any number of 0xFF may pad before the marker id
      var m = i + 1
      while (m < b.length && (b(m) & 0xFF) == 0xFF) m += 1
      if (m >= b.length) return -1L
      val marker = b(m) & 0xFF
      // EOI, or SOS (entropy-coded data follows — no SOF was seen)
      if (marker == 0xD9 || marker == 0xDA) return -1L
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
        // standalone markers carry no length field
        i = m + 1
      } else {
        if (m + 2 >= b.length) return -1L
        val len = ((b(m + 1) & 0xFF) << 8) | (b(m + 2) & 0xFF)
        if (len < 2) return -1L
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          // len(2) precision(1) height(2 BE) width(2 BE) ...
          if (m + 7 >= b.length || len < 7) return -1L
          val h = ((b(m + 4) & 0xFF) << 8) | (b(m + 5) & 0xFF)
          val w = ((b(m + 6) & 0xFF) << 8) | (b(m + 7) & 0xFF)
          return (w.toLong << 16) | h.toLong
        }
        i = m + 1 + len
      }
    }
    -1L
  }

  /** Column-DSL handle (registered in GraftExtensions). */
  def apply(bin: Column): Column =
    org.apache.spark.sql.functions.call_function("jpeg_dims", bin)
}
