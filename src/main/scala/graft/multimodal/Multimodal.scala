package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata, and per-item decode /
  * feature-extraction runs as a partition-mapped batch operator.
  *
  * The actual codec work is STUBBED (this container ships no image or
  * audio libraries): `decodeStub` derives deterministic fake features
  * from the payload bytes. Everything Spark-side — the schema, the
  * Dataset encoders, the mapPartitions batch shape (one decoder
  * context per partition, NOT per row), and the partitioning contract
  * — is real and tested, so a real decoder drops in by replacing one
  * function.
  */
object Multimodal {

  /** A media row: opaque payload + typed envelope metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      fmt: String, // png | jpg | wav | ...
      payload: Array[Byte])

  /** Extracted features (what a real decode would yield). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      fmt: String,
      byte_len: Int,
      width: Int, // stub: derived from payload bytes
      height: Int,
      checksum: String)

  /** Attach payloads from a string column (testdata has no binary
    * table; text bytes stand in for media bytes). */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      element_at(array(lit("png"), lit("jpg"), lit("webp")),
        (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
      col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** The decode stub: deterministic pseudo-features from the bytes.
    * A real implementation opens one decoder context per PARTITION
    * (the expensive part) and streams rows through it — which is why
    * this is mapPartitions and not a per-row UDF. */
  def decodeStub(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // one "decoder" per partition — a real codec would init here
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val digest = md.digest(r.payload)
        val hex = digest.map("%02x".format(_)).mkString
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          fmt = r.fmt,
          byte_len = r.payload.length,
          width = 64 + (digest(0) & 0x0f),
          height = 64 + ((digest(0) >> 4) & 0x0f),
          checksum = hex)
      }
    }
  }

  /** REAL image-header metadata decode — no image library needed:
    * PNG / GIF / BMP store their dimensions at fixed header offsets,
    * so format sniffing and width/height extraction are pure byte
    * math over the binary column (`substring` on binary + hex + conv
    * — all codegen'd built-ins, no UDF, no shuffle). This is the
    * piece of "decode" that IS implementable without codecs; pixel
    * decode stays behind [[decodeStub]]'s mapPartitions seam.
    *
    * Returns struct(fmt, width, height); fmt null when the payload
    * matches no known signature (then width/height are null too).
    * BMP heights are stored signed (negative = top-down rows); the
    * magnitude is returned.
    */
  def imageDims(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def byteAt(pos: Int) = conv(hex(substring(bin, pos, 1)), 16, 10).cast("int")
    def be4(pos: Int) = conv(hex(substring(bin, pos, 4)), 16, 10).cast("int")
    def le2(pos: Int) = byteAt(pos) + byteAt(pos + 1) * 256
    def le4(pos: Int) =
      byteAt(pos) + byteAt(pos + 1) * 256 +
        byteAt(pos + 2) * 65536 + byteAt(pos + 3) * 16777216
    val isPng = hex(substring(bin, 1, 8)) === "89504E470D0A1A0A"
    val isGif = substring(bin, 1, 6).cast("string").isin("GIF87a", "GIF89a")
    val isBmp = substring(bin, 1, 2).cast("string") === "BM"
    val isJpg = hex(substring(bin, 1, 2)) === "FFD8"
    // PNG: 8-byte signature, 4-byte length, "IHDR", then width/height
    // as 4-byte big-endian at offsets 17/21 (1-based). GIF: logical
    // screen width/height, 2-byte little-endian at 7/9. BMP
    // (BITMAPINFOHEADER): 4-byte little-endian at 19/23, height
    // signed. JPEG needs a segment WALK to its SOF header — the
    // codegen'd graft.plans.JpegDims expression (packed w<<16|h).
    val jp = graft.plans.JpegDims(bin)
    when(isPng, struct(lit("png").as("fmt"),
        be4(17).as("width"), be4(21).as("height")))
      .when(isGif, struct(lit("gif").as("fmt"),
        le2(7).as("width"), le2(9).as("height")))
      .when(isBmp, struct(lit("bmp").as("fmt"),
        le4(19).as("width"), abs(le4(23)).as("height")))
      .when(isJpg && jp.isNotNull, struct(lit("jpg").as("fmt"),
        shiftright(jp, 16).bitwiseAND(lit(65535L)).cast("int").as("width"),
        jp.bitwiseAND(lit(65535L)).cast("int").as("height")))
      .otherwise(struct(lit(null).cast("string").as("fmt"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height")))
  }

  /** Audio twin of [[imageDims]]: WAV (RIFF) header metadata at fixed
    * offsets — "RIFF" at 1, "WAVE" at 9, the fmt chunk's channel
    * count (LE2 at 23), sample rate (LE4 at 25), and bits per sample
    * (LE2 at 35). Pure byte math, codegen'd, no audio libs. Returns
    * struct(fmt, channels, sample_rate, bits); nulls when the payload
    * is not a canonical RIFF/WAVE header. */
  def audioMeta(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def byteAt(pos: Int) = conv(hex(substring(bin, pos, 1)), 16, 10).cast("int")
    def le2(pos: Int) = byteAt(pos) + byteAt(pos + 1) * 256
    def le4(pos: Int) =
      byteAt(pos) + byteAt(pos + 1) * 256 +
        byteAt(pos + 2) * 65536 + byteAt(pos + 3) * 16777216
    val isWav = substring(bin, 1, 4).cast("string") === "RIFF" &&
      substring(bin, 9, 4).cast("string") === "WAVE" &&
      substring(bin, 13, 4).cast("string") === "fmt "
    when(isWav, struct(lit("wav").as("fmt"),
        le2(23).as("channels"), le4(25).as("sample_rate"),
        le2(35).as("bits")))
      .otherwise(struct(lit(null).cast("string").as("fmt"),
        lit(null).cast("int").as("channels"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("int").as("bits")))
  }

  /** Frame-sample stub for video-kind rows: emit every `stride`-th
    * byte offset as a "frame" — demonstrates the 1->N flatMap shape a
    * real frame sampler uses. */
  def frameSampleStub(rows: Dataset[MediaRow], stride: Int): DataFrame = {
    import rows.sparkSession.implicits._
    rows.flatMap { r =>
      (0 until r.payload.length by stride).map(off =>
        (r.media_id, off, r.payload(off).toInt & 0xff))
    }.toDF("media_id", "frame_offset", "frame_byte")
  }

  /** Grayscale-thumbnail decode for perceptual hashing, behind the
    * same honest mapPartitions seam as [[decodeStub]]: a REAL
    * implementation opens one decoder context per partition, decodes
    * each payload, grayscales, and box-resizes to a tiny w x h grid —
    * the canonical dHash preprocessing. This container ships no image
    * codec, so the stub derives DETERMINISTIC pseudo-pixels from the
    * payload bytes (byte `i % 16` of md5(payload ++ ":" ++ i/16),
    * unsigned) — the exact formula the q_phash oracle recomputes in
    * SQL, so the DOWNSTREAM math ([[dHash]] + banding) is verified
    * end-to-end even though the pixels are fake. Output:
    * (media_id, px: array<int> of w*h gray values, row-major). */
  def grayPixelsStub(rows: Dataset[MediaRow], w: Int = 9,
      h: Int = 7): DataFrame = {
    import rows.sparkSession.implicits._
    val n = w * h
    rows.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val px = new Array[Int](n)
        var i = 0
        while (i < n) {
          if (i % 16 == 0) {
            md.reset()
            md.update(r.payload)
            md.update(s":${i / 16}".getBytes("UTF-8"))
            val d = md.digest()
            var j = 0
            while (j < 16 && i + j < n) {
              px(i + j) = d(j) & 0xff
              j += 1
            }
          }
          i += 16
        }
        (r.media_id, px.toSeq)
      }
    }.toDF("media_id", "px")
  }

  /** Difference hash (dHash) of a row-major w x h grayscale pixel
    * array — THE standard perceptual image fingerprint (public
    * recipe: hackerfactor.com "Kind of Like That"; each bit compares
    * a pixel to its right neighbor, so the code captures the
    * horizontal gradient structure and is stable under rescaling,
    * recompression, and small edits): bit `r*(w-1)+c` is set iff
    * `px[r*w+c] < px[r*w+c+1]`. (w-1)*h bits; the 9x7 default gives
    * 56 — inside a signed Long's positive range, so the code
    * round-trips bit-exactly through parquet, DuckDB, and
    * [[graft.dedup.Dedup.hamming]] with no sign traps (the classic
    * 9x8/64 grid works too, but its bit 63 makes sign-sensitive
    * cross-engine comparison fragile for zero information gain at
    * dedup thresholds). Pure built-in column math over the pixel
    * array — codegen'd, row-local, no UDF.
    *
    * Near-dup pairs over the codes: [[graft.dedup.Dedup
    * .hammingBandedPairs]] — the same pigeonhole banding kernel the
    * text simhash uses (banding is hash-agnostic: guaranteed recall
    * within maxHamming, equi-join buckets only, never all-pairs). */
  def dHash(px: org.apache.spark.sql.Column, w: Int = 9,
      h: Int = 7): org.apache.spark.sql.Column = {
    require((w - 1) * h <= 63,
      s"dHash needs (w-1)*h <= 63 bits to stay in a Long's positive " +
        s"range, got ${(w - 1) * h}")
    (0 until h).flatMap { r =>
      (0 until w - 1).map { c =>
        val k = r * (w - 1) + c
        when(element_at(px, r * w + c + 1) < element_at(px, r * w + c + 2),
          lit(1L << k)).otherwise(lit(0L))
      }
    }.reduce(_ + _)
  }
}
