package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata, and per-item decode /
  * feature-extraction runs as a partition-mapped batch operator.
  *
  * IMAGE pixel decode is REAL: [[grayPixels]] runs JDK
  * `javax.imageio.ImageIO` (headless — PNG/JPEG/GIF/BMP/TIFF readers
  * ship with the JDK, no external codec) behind the mapPartitions
  * seam, so the dHash near-dup pipeline hashes actual pixels.
  * [[grayPixelsStub]] remains alongside as the ORACLE face: its
  * pseudo-pixels are recomputable in SQL, so the downstream math
  * (dHash + banding) is DuckDB-verified end-to-end every round —
  * something no real codec allows. Audio/video feature extraction
  * stays stubbed (`decodeStub`/`frameSampleStub` derive deterministic
  * fake features; the JDK ships no audio/video decoder): the schema,
  * Dataset encoders, mapPartitions batch shape (one decoder context
  * per partition, NOT per row), and partitioning contract are real
  * and tested, so a real codec drops in by replacing one function.
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

  /** ORACLE twin of [[grayPixels]], same seam and output schema:
    * derives DETERMINISTIC pseudo-pixels from the payload bytes (byte
    * `i % 16` of md5(payload ++ ":" ++ i/16), unsigned) — the exact
    * formula the q_phash oracle recomputes in SQL, so the DOWNSTREAM
    * math ([[dHash]] + banding) is DuckDB-verified end-to-end, which
    * no real codec's output allows. Real pixel decode is
    * [[grayPixels]]; this face exists for cross-engine verification
    * and for payloads that are not real encoded images (testdata text
    * bytes). Output: (media_id, px: array<int> of w*h gray values,
    * row-major). */
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

  /** REAL grayscale-thumbnail decode for perceptual hashing: JDK
    * `javax.imageio.ImageIO` (headless — PNG/JPEG/GIF/BMP/TIFF/WBMP
    * readers ship with the JDK, zero new dependencies) decodes each
    * payload, BT.601 luminance grayscales it, and a box-average
    * resample reduces it to the tiny w x h grid dHash consumes — the
    * canonical dHash preprocessing (hackerfactor "Kind of Like That":
    * shrink, grayscale, compare neighbors). Behind the same
    * mapPartitions seam as [[grayPixelsStub]] with the same output
    * schema, so the two faces are drop-in interchangeable: one
    * decoder context per PARTITION (ImageIO's disk cache is disabled
    * once per partition — per-row temp files would dominate decode
    * cost on an executor, and container tmp may not be writable), rows
    * stream through it. All grid math is deterministic integer
    * arithmetic ([[boxGray]]), so codes are reproducible across runs
    * and JVMs.
    *
    * Payloads ImageIO cannot decode (corrupt bytes, unsupported
    * format, zero-size image) yield px = NULL rather than dropping the
    * row — the caller sees exactly which media failed and routes them
    * (dHash of null is null; a null code joins nothing downstream).
    * Output: (media_id, px: array<int> of w*h gray values in [0,255],
    * row-major). */
  def grayPixels(rows: Dataset[MediaRow], w: Int = 9,
      h: Int = 7): DataFrame = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition decoder context: headless + no disk cache, set
      // once before the first row streams through
      System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          catch { case _: Exception => null }
        if (img == null || img.getWidth < 1 || img.getHeight < 1)
          (r.media_id, null: Seq[Int])
        else (r.media_id, boxGray(img, w, h).toSeq)
      }
    }.toDF("media_id", "px")
  }

  /** BT.601 luminance + box-average resample of a decoded image to a
    * row-major w x h grid — deterministic INTEGER math so a golden
    * test can hand-compute the grid: luminance is
    * floor((299R + 587G + 114B + 500) / 1000) (for gray pixels R=G=B=v
    * this is exactly v), cell (cx, cy) averages the source rectangle
    * [floor(cx*W/w), max(floor((cx+1)*W/w), x0+1)) x (same for y) —
    * floor bounds tile the source exactly, every cell sees >= 1 pixel
    * even when the source is SMALLER than the grid — and the cell
    * value is floor(sum / count). A w x h source round-trips
    * identically (each cell is one pixel).
    *
    * Alpha is composited over WHITE before the luminance read (the
    * standard pHash flattening): a fully-transparent pixel's stored
    * RGB is encoder-dependent garbage, so hashing it raw would land
    * visually identical transparent-background images far apart in
    * hamming space whenever their encoders disagreed on the invisible
    * bytes. lum' = (a*lum + (255-a)*255 + 127) / 255 — for opaque
    * pixels (a=255) this is exactly lum. */
  private[multimodal] def boxGray(img: java.awt.image.BufferedImage,
      w: Int, h: Int): Array[Int] = {
    val iw = img.getWidth
    val ih = img.getHeight
    val out = new Array[Int](w * h)
    var cy = 0
    while (cy < h) {
      val y0 = cy * ih / h
      val y1 = math.min(math.max((cy + 1) * ih / h, y0 + 1), ih)
      var cx = 0
      while (cx < w) {
        val x0 = cx * iw / w
        val x1 = math.min(math.max((cx + 1) * iw / w, x0 + 1), iw)
        var sum = 0L
        var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val argb = img.getRGB(x, y)
            val a = (argb >>> 24) & 0xff
            val lum = (299 * ((argb >> 16) & 0xff) +
              587 * ((argb >> 8) & 0xff) + 114 * (argb & 0xff) + 500) / 1000
            sum += (a * lum + (255 - a) * 255 + 127) / 255
            n += 1
            x += 1
          }
          y += 1
        }
        out(cy * w + cx) = (sum / n).toInt
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** Encode a row-major w x h grayscale pixel array as a real PNG via
    * ImageIO — the bench/test-side INVERSE of [[grayPixels]]: lets a
    * measurement job synthesize REAL encoded payloads (and a spec
    * plant a known grid) so the decode seam is priced and verified on
    * actual codec work, not pseudo-pixels. PNG is lossless, so
    * grayPixels(pngOfGray(px, w, h), w, h) == px exactly. */
  def pngOfGray(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(px.length == w * h, s"need $w*$h=${w * h} pixels, got ${px.length}")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < px.length) {
      val v = px(i) & 0xff
      img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
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
    // NULL px (an undecodable image from [[grayPixels]]) must yield a
    // NULL code, not 0: each bit's when() falls to otherwise(0) on a
    // null comparison, so without this guard every undecodable image
    // would silently share code 0 — verbatim hamming-0 "duplicates"
    // of each other (and of genuinely flat images), inverting the
    // documented null-routing contract everywhere downstream
    when(px.isNull, lit(null).cast("long")).otherwise(
      (0 until h).flatMap { r =>
        (0 until w - 1).map { c =>
          val k = r * (w - 1) + c
          when(element_at(px, r * w + c + 1) < element_at(px, r * w + c + 2),
            lit(1L << k)).otherwise(lit(0L))
        }
      }.reduce(_ + _))
  }
}
