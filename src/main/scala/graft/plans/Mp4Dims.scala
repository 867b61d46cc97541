package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** MP4/ISO-BMFF video dimensions from raw bytes — the video-container
  * twin of [[JpegDims]], and like it a genuine WALK no fixed-offset
  * Column expression can fake: an MP4 is a tree of length-prefixed
  * boxes (size may be 32-bit, 64-bit "largesize", or
  * 0 = to-end-of-file), and the presentation size lives at
  * `moov > trak > tkhd` — with any number of sibling boxes before
  * each level, any number of non-video tracks (audio tkhd carries
  * width = height = 0) before the video one, and a version bit that
  * moves the field offsets (v0 at +76/+80 of the tkhd payload, v1 at
  * +88/+92; 16.16 fixed point, integer part returned). One
  * invokestatic per row inside WholeStageCodegen.
  *
  * Returns width<<16 | height packed in a long, null when the bytes
  * are not an ISO-BMFF stream with a nonzero-size video track. The
  * parse reads ONLY box headers and the tkhd payload — a multi-GB
  * declared box size fails the bounds check, it never allocates.
  * Unpack with shiftright/bitwiseAND —
  * [[graft.multimodal.Multimodal.videoDims]] does. */
case class Mp4Dims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mp4_dims expects a binary column, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "mp4_dims"

  override protected def nullSafeEval(input: Any): Any = {
    val packed = Mp4Dims.pack(input.asInstanceOf[Array[Byte]])
    if (packed < 0L) null else java.lang.Long.valueOf(packed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.Mp4Dims.pack($c);
      if (${ev.value} < 0L) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Mp4Dims =
    copy(child = newChild)
}

object Mp4Dims {

  private final val MOOV = cc("moov")
  private final val TRAK = cc("trak")
  private final val TKHD = cc("tkhd")

  private def cc(s: String): Int =
    (s.charAt(0) << 24) | (s.charAt(1) << 16) | (s.charAt(2) << 8) |
      s.charAt(3)

  private def be4(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  /** First box of fourCC `t` in [from, to): (payloadStart << 32) |
    * boxEnd, or -1 when absent/malformed. Skips siblings by their
    * declared size; a size that under-runs its header or over-runs
    * the range is malformed (this is also what keeps a hostile
    * multi-GB size from walking out of bounds — sizes are compared,
    * never allocated). */
  private def findBox(b: Array[Byte], from: Int, to: Int, t: Int): Long = {
    var p = from
    while (p + 8 <= to) {
      var size: Long = be4(b, p)
      val typ = ((b(p + 4) & 0xff) << 24) | ((b(p + 5) & 0xff) << 16) |
        ((b(p + 6) & 0xff) << 8) | (b(p + 7) & 0xff)
      var hdr = 8
      if (size == 1L) { // 64-bit largesize follows the type
        if (p + 16 > to) return -1L
        val hi = be4(b, p + 8)
        val lo = be4(b, p + 12)
        if (hi != 0L) return -1L // > 4 GB cannot fit this array anyway
        size = lo
        hdr = 16
      } else if (size == 0L) size = (to - p).toLong // to end of range
      if (size < hdr || p + size > to) return -1L
      if (typ == t) return ((p + hdr).toLong << 32) | (p + size)
      p += size.toInt
    }
    -1L
  }

  /** Walk moov > trak* > tkhd to the first track with nonzero
    * presentation size; -1 when none. Public static so generated code
    * calls it directly. */
  def pack(b: Array[Byte]): Long = {
    if (b == null || b.length < 16) return -1L
    val moov = findBox(b, 0, b.length, MOOV)
    if (moov < 0L) return -1L
    var p = (moov >>> 32).toInt
    val moovEnd = (moov & 0xffffffffL).toInt
    while (p < moovEnd) {
      val trak = findBox(b, p, moovEnd, TRAK)
      if (trak < 0L) return -1L // no further tracks
      val ts = (trak >>> 32).toInt
      val te = (trak & 0xffffffffL).toInt
      val tkhd = findBox(b, ts, te, TKHD)
      if (tkhd >= 0L) {
        val hs = (tkhd >>> 32).toInt
        val he = (tkhd & 0xffffffffL).toInt
        if (he - hs >= 4) {
          val off = if ((b(hs) & 0xff) == 1) 88 else 76
          if (hs + off + 8 <= he) {
            // 16.16 fixed point; the integer part is the leading
            // 2 bytes of each 4-byte field
            val w = ((b(hs + off) & 0xff) << 8) | (b(hs + off + 1) & 0xff)
            val h = ((b(hs + off + 4) & 0xff) << 8) | (b(hs + off + 5) & 0xff)
            if (w > 0 && h > 0) return (w.toLong << 16) | h.toLong
          }
        }
      }
      p = te // next sibling after this (audio/zero-size) track
    }
    -1L
  }

  /** Column-DSL handle (registered in GraftExtensions). */
  def apply(bin: Column): Column =
    org.apache.spark.sql.functions.call_function("mp4_dims", bin)
}
