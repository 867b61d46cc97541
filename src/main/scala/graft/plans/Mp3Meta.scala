package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** MP3 stream metadata from raw bytes — the audio entry in the
  * walk-requiring family ([[JpegDims]], [[Mp4Dims]]): an MP3's first
  * frame header sits after an OPTIONAL ID3v2 tag whose length is
  * variable (stored SYNCHSAFE — 4x7 bits — plus an optional footer),
  * so finding it requires skipping a data-dependent prefix no
  * fixed-offset Column can express. The frame header then packs
  * MPEG version, layer, bitrate index, sample-rate index, and
  * channel mode into 4 bytes; sample rate resolves through the
  * per-version table.
  *
  * Returns sample_rate<<8 | channels packed in a long (mono = 1,
  * everything else = 2 — stereo/joint/dual all carry two channels),
  * null when the bytes are not an MP3 frame (bad sync, reserved
  * version/layer, bad bitrate or sample-rate index, truncation).
  * MP3 carries no PCM bit depth — callers surface bits as null.
  * Unpack with shiftright/bitwiseAND —
  * [[graft.multimodal.Multimodal.audioMeta]] does, presenting MP3
  * uniformly beside the fixed-offset WAV/FLAC parses. */
case class Mp3Meta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mp3_meta expects a binary column, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "mp3_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val packed = Mp3Meta.pack(input.asInstanceOf[Array[Byte]])
    if (packed < 0L) null else java.lang.Long.valueOf(packed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.Mp3Meta.pack($c);
      if (${ev.value} < 0L) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Mp3Meta =
    copy(child = newChild)
}

object Mp3Meta {

  // sample-rate tables by MPEG version bits (11 = MPEG1, 10 = MPEG2,
  // 00 = MPEG2.5; 01 reserved)
  private val Sr1 = Array(44100, 48000, 32000)
  private val Sr2 = Array(22050, 24000, 16000)
  private val Sr25 = Array(11025, 12000, 8000)

  /** -1 when not an MP3 frame header (after any ID3v2 tag). Public
    * static so generated code calls it directly. */
  def pack(b: Array[Byte]): Long = {
    if (b == null || b.length < 4) return -1L
    var p = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // ID3v2: 10-byte header, SYNCHSAFE length (high bit of every
      // size byte MUST be 0 by spec), optional 10-byte footer (flag
      // bit 4). A tag violating the synchsafe invariant (a real
      // corpus hazard — v2.3-era writers emitting plain 32-bit
      // sizes) would compute a WRONG skip offset, and 0xFF bytes are
      // common inside embedded cover art — a mis-skip could land on
      // one and report bogus metadata; refuse malformed tags instead
      // of trusting their arithmetic (the spec also pins version
      // bytes != 0xFF)
      if (b(3) == 0xFF.toByte || b(4) == 0xFF.toByte ||
        ((b(6) | b(7) | b(8) | b(9)) & 0x80) != 0) return -1L
      val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      p = 10 + sz + (if ((b(5) & 0x10) != 0) 10 else 0)
    }
    if (p + 4 > b.length) return -1L // incl. a tag overshooting EOF
    val h1 = b(p + 1) & 0xff
    if ((b(p) & 0xff) != 0xFF || (h1 & 0xE0) != 0xE0) return -1L
    val ver = (h1 >> 3) & 3
    val layer = (h1 >> 1) & 3
    if (ver == 1 || layer == 0) return -1L // reserved
    val h2 = b(p + 2) & 0xff
    val brIdx = (h2 >> 4) & 0xF
    val srIdx = (h2 >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return -1L
    val sr = (if (ver == 3) Sr1 else if (ver == 2) Sr2 else Sr25)(srIdx)
    val ch = if ((((b(p + 3) & 0xff) >> 6) & 3) == 3) 1 else 2
    (sr.toLong << 8) | ch.toLong
  }

  /** Column-DSL handle (registered in GraftExtensions). */
  def apply(bin: Column): Column =
    org.apache.spark.sql.functions.call_function("mp3_meta", bin)
}
