package graft.multimodal

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("binary payload plumbing: schema, byte lengths, deterministic stub features") {
    val media = Multimodal.fromDocuments(Tables.documents(spark, sf))
    val feats = Multimodal.decodeStub(media)
    assert(feats.schema.fieldNames.toSeq == Seq(
      "media_id", "kind", "fmt", "byte_len", "width", "height", "checksum"))
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { f =>
      assert(f.byte_len > 0)
      assert(f.width >= 64 && f.width < 80 && f.height >= 64 && f.height < 80)
      assert(f.checksum.length == 32)
    }
    // deterministic: re-running yields identical features
    val again = Multimodal.decodeStub(media).collect()
    assert(rows.sortBy(_.media_id).map(_.checksum).toSeq ==
      again.sortBy(_.media_id).map(_.checksum).toSeq)
  }

  test("frame sampling emits bounded 1->N rows per media item") {
    val media = Multimodal.fromDocuments(
      Tables.documents(spark, sf).limit(5))
    val frames = Multimodal.frameSampleStub(media, stride = 50)
    val counts = frames.groupBy("media_id").count().collect()
    assert(counts.length == 5)
    counts.foreach(r => assert(r.getAs[Long]("count") >= 1))
  }

  test("imageDims parses real PNG/GIF/BMP header bytes (incl. a " +
      "top-down negative-height BMP) and nulls unknown formats") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def hx(s: String): Array[Byte] = s.grouped(2)
      .map(b => Integer.parseInt(b, 16).toByte).toArray
    // real headers: 1x1 PNG IHDR; 3x2 GIF89a; 4x5 BMP; -5 height BMP
    // (top-down, magnitude expected); then junk
    val rows = Seq(
      ("png11", hx("89504E470D0A1A0A0000000D49484452" +
        "00000001" + "00000001" + "0806000000")),
      ("gif32", hx("474946383961" + "0300" + "0200" + "F70000")),
      ("bmp45", hx("424D" + "0000000000000000" + "00000000" + "28000000" +
        "04000000" + "05000000" + "0100")),
      ("bmpneg", hx("424D" + "0000000000000000" + "00000000" + "28000000" +
        "04000000" + "FBFFFFFF" + "0100")), // height -5 LE
      ("junk", "not an image at all".getBytes("UTF-8")))
      .toDF("name", "payload")
    val out = rows.select(col("name"),
        Multimodal.imageDims(col("payload")).as("d"))
      .select(col("name"), col("d.fmt"), col("d.width"), col("d.height"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out("png11") == ((Some("png"), Some(1), Some(1))))
    assert(out("gif32") == ((Some("gif"), Some(3), Some(2))))
    assert(out("bmp45") == ((Some("bmp"), Some(4), Some(5))))
    assert(out("bmpneg") == ((Some("bmp"), Some(4), Some(5))))
    assert(out("junk") == ((None, None, None)))
  }

  test("imageDims walks JPEG segment chains to the SOF header: " +
      "variable-length segments, fill bytes, progressive SOF2, " +
      "restart markers; nulls truncated or SOF-less streams") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def hx(s: String): Array[Byte] = s.grouped(2)
      .map(b => Integer.parseInt(b, 16).toByte).toArray
    val app0 = "FFE0" + "0010" + "4A46494600" + "0101" + "00" +
      "0048" + "0048" + "0000"
    def sof(marker: String, w: Int, h: Int) =
      marker + "0011" + "08" + f"$h%04X" + f"$w%04X" +
        "03" + "012200" + "021101" + "031101"
    val rows = Seq(
      // baseline: APP0 + 3-byte COM + SOF0, 640x480
      ("base", hx("FFD8" + app0 + "FFFE" + "0005" + "414243" +
        sof("FFC0", 640, 480))),
      // progressive SOF2, fill bytes (extra FFs) before markers, 31x17
      ("prog", hx("FFD8" + "FF" + app0 + "FFFF" + sof("FFC2", 31, 17))),
      // restart marker (standalone, no length) before the SOF, 8x9
      ("rst", hx("FFD8" + "FFD0" + sof("FFC1", 8, 9))),
      // DHT (C4) must be SKIPPED, not read as SOF: 5 payload bytes
      ("dht", hx("FFD8" + "FFC4" + "0007" + "0102030405" +
        sof("FFC0", 12, 34))),
      // SOS before any SOF -> no dimensions
      ("nosof", hx("FFD8" + app0 + "FFDA" + "0002")),
      // truncated mid-segment -> null, not a crash or garbage read
      ("trunc", hx("FFD8" + "FFE0" + "0010" + "4A46")),
      ("soi_only", hx("FFD8")))
      .toDF("name", "payload")
    val out = rows.select(col("name"),
        Multimodal.imageDims(col("payload")).as("d"))
      .select(col("name"), col("d.fmt"), col("d.width"), col("d.height"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out("base") == ((Some("jpg"), Some(640), Some(480))))
    assert(out("prog") == ((Some("jpg"), Some(31), Some(17))))
    assert(out("rst") == ((Some("jpg"), Some(8), Some(9))))
    assert(out("dht") == ((Some("jpg"), Some(12), Some(34))))
    assert(out("nosof") == ((None, None, None)))
    assert(out("trunc") == ((None, None, None)))
    assert(out("soi_only") == ((None, None, None)))
    // SQL surface: the expression is registered as jpeg_dims
    val viaSql = rows.filter(col("name") === "base")
      .selectExpr("jpeg_dims(payload) AS p")
      .select((col("p") / 65536).cast("int").as("w"),
        (col("p") % 65536).cast("int").as("h")).collect().head
    assert(viaSql.getInt(0) == 640 && viaSql.getInt(1) == 480)
  }

  test("audioMeta parses a canonical RIFF/WAVE fmt header and nulls " +
      "everything else") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def hx(s: String): Array[Byte] = s.grouped(2)
      .map(b => Integer.parseInt(b, 16).toByte).toArray
    // 2ch, 44100 Hz, 16-bit PCM: 44100 = 0xAC44 -> LE 44AC0000
    val wav = hx("52494646" + "24000000" + "57415645" + "666D7420" +
      "10000000" + "0100" + "0200" + "44AC0000" + "10B10200" + "0400" + "1000")
    val rows = Seq(("wav", wav), ("junk", "RIFFnope".getBytes("UTF-8")))
      .toDF("name", "payload")
    val out = rows.select(col("name"),
        Multimodal.audioMeta(col("payload")).as("a"))
      .select(col("name"), col("a.fmt"), col("a.channels"),
        col("a.sample_rate"), col("a.bits"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
      .toMap
    assert(out("wav") == ((Some("wav"), Some(2), Some(44100), Some(16))))
    assert(out("junk") == ((None, None, None, None)))
  }

  test("dHash sets exactly the rising-gradient bits of a known pixel " +
      "grid, and near-identical grids land within small hamming " +
      "distance — the perceptual-hash contract") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 3x2 grid (w=3, h=2): 2 bits per row, 4 bits total.
    // row 0: 10 < 20 (bit 0 set), 20 > 5 (bit 1 clear)
    // row 1: 7 > 3 (bit 2 clear), 3 < 9 (bit 3 set)
    val grid = Seq((1L, Seq(10, 20, 5, 7, 3, 9))).toDF("id", "px")
    val code = grid.select(Multimodal.dHash(col("px"), w = 3, h = 2))
      .collect().head.getLong(0)
    assert(code == ((1L << 0) | (1L << 3)), s"got $code")
    // one flipped comparison = hamming 1; ties (==) read as 0-bit
    val near = Seq(
      (1L, Seq(10, 20, 5, 7, 3, 9)),
      (2L, Seq(10, 20, 5, 7, 3, 2)), // only the last comparison flips
      (3L, Seq(10, 10, 5, 7, 3, 9))) // first tied -> bit 0 clears
      .toDF("id", "px")
      .select(col("id"), Multimodal.dHash(col("px"), w = 3, h = 2).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(near(1L) ^ near(2L)) == 1)
    assert(java.lang.Long.bitCount(near(1L) ^ near(3L)) == 1)
    // the 9x7 default refuses nothing and stays in 56 bits
    val e = intercept[IllegalArgumentException] {
      Multimodal.dHash(col("px"), w = 9, h = 8) // 64 bits: sign trap
    }
    assert(e.getMessage.contains("63"))
  }

  test("grayPixels golden-pixel: a real 9x7 gray PNG round-trips to " +
      "the exact planted pixel array and the exact hand-computed " +
      "dHash code — the REAL decoder face, verified bit-level") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // planted grid: deterministic, full 0-255 range, no ties between
    // horizontal neighbors (so the expected code is unambiguous)
    val px = Array.tabulate(9 * 7) { i =>
      val (x, y) = (i % 9, i / 9)
      (x * 37 + y * 11 + (if ((x + y) % 2 == 0) 3 else 0)) % 256
    }
    val payload = Multimodal.pngOfGray(px, 9, 7)
    val rows = Seq(Multimodal.MediaRow(1L, "image", "png", payload)).toDS()
    val got = Multimodal.grayPixels(rows).collect().head
    assert(got.getLong(0) == 1L)
    assert(got.getSeq[Int](1).toList == px.toList,
      "lossless PNG decode must reproduce the planted grid exactly")
    // the dHash over the REAL decode equals the rule computed by hand
    val expected = (0 until 7).flatMap { r =>
      (0 until 8).collect {
        case c if px(r * 9 + c) < px(r * 9 + c + 1) => 1L << (r * 8 + c)
      }
    }.sum
    val code = Multimodal.grayPixels(rows)
      .select(Multimodal.dHash(col("px"))).collect().head.getLong(0)
    assert(code == expected, s"dHash $code != hand-computed $expected")
  }

  test("grayPixels box-resample: floor-bound cells average exactly " +
      "(2x2 blocks collapse to their value; a hand-computed non-" +
      "divisible case matches), and undecodable payloads yield NULL " +
      "px, never a dropped row or a crash") {
    import spark.implicits._
    // 18x14 image of constant 2x2 blocks -> 9x7 grid == block values
    val blocks = Array.tabulate(9 * 7)(i => (i * 53) % 256)
    val big = Array.tabulate(18 * 14) { i =>
      val (x, y) = (i % 18, i / 18)
      blocks((y / 2) * 9 + (x / 2))
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", "png", Multimodal.pngOfGray(big, 18, 14)),
      Multimodal.MediaRow(2L, "image", "png", "not an image".getBytes("UTF-8")),
      Multimodal.MediaRow(3L, "image", "png",
        Multimodal.pngOfGray(Array(10, 20, 30, 40, 50, 60, 70, 80, 90), 3, 3)))
      .toDS()
    val out = Multimodal.grayPixels(rows, 9, 7).collect()
      .map(r => r.getLong(0) ->
        Option(r.get(1)).map(_ => r.getSeq[Int](1).toList)).toMap
    assert(out(1L).contains(blocks.toList))
    assert(out(2L).isEmpty, "undecodable payload must yield NULL px")
    // ...and the NULL must PROPAGATE through dHash: without the
    // explicit null guard each bit's when() falls to otherwise(0) and
    // every undecodable image would share code 0 — verbatim fake
    // duplicates of each other and of genuinely flat images
    import org.apache.spark.sql.functions.col
    val codeRows = Multimodal.grayPixels(rows, 9, 7)
      .select(col("media_id"), Multimodal.dHash(col("px")).as("code"))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(r.fieldIndex("code")))).toMap
    assert(codeRows(2L).isEmpty, "dHash of NULL px must be NULL, not 0")
    assert(codeRows(1L).nonEmpty)
    // 3x3 -> 2x2 by hand: cells tile [0,1)/[1,3) per axis ->
    // {10}, {20,30}, {40,70}, {50,60,80,90} -> 10, 25, 55, 70
    val small = Multimodal.grayPixels(
      rows.filter(_.media_id == 3L), w = 2, h = 2).collect().head
    assert(small.getSeq[Int](1).toList == List(10, 25, 55, 70))
  }

  test("grayPixels near-dup contract: a JPEG re-encode of a real " +
      "image lands within hamming 6 of its PNG original's dHash — " +
      "the operating point the production maxHamming targets — while " +
      "a different image stays far") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // smooth 90x70 gradient: structured content, the case perceptual
    // hashing exists for (JPEG's DCT loss barely moves box averages)
    def gradient(flip: Boolean): Array[Int] = Array.tabulate(90 * 70) { i =>
      val (x, y) = (i % 90, i / 90)
      val v = (x * 2 + y) % 256
      if (flip) 255 - v else v
    }
    val png = Multimodal.pngOfGray(gradient(false), 90, 70)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val jout = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", jout),
      "headless JPEG encode must be available")
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", "png", png),
      Multimodal.MediaRow(2L, "image", "jpg", jout.toByteArray),
      Multimodal.MediaRow(3L, "image", "png",
        Multimodal.pngOfGray(gradient(true), 90, 70)))
      .toDS()
    val codes = Multimodal.grayPixels(rows)
      .select(col("media_id"), Multimodal.dHash(col("px")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val near = java.lang.Long.bitCount(codes(1L) ^ codes(2L))
    val far = java.lang.Long.bitCount(codes(1L) ^ codes(3L))
    assert(near <= 6, s"JPEG re-encode drifted hamming $near > 6")
    assert(far > 20, s"inverted image unexpectedly close: hamming $far")
  }

  test("grayPixels composites alpha over white: a transparent-" +
      "background PNG hashes identically regardless of the RGB bytes " +
      "its encoder buried under alpha=0") {
    import spark.implicits._
    // two ARGB images, both visually: left half dark-gray 64, right
    // half fully transparent — but one encoder stored BLACK under the
    // transparent pixels, the other stored noise
    def argbPng(underAlpha: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(18, 14,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      for (y <- 0 until 14; x <- 0 until 18) {
        val p =
          if (x < 9) 0xff000000 | (64 << 16) | (64 << 8) | 64
          else underAlpha(x, y) & 0x00ffffff // alpha 0: invisible
        img.setRGB(x, y, p)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", "png", argbPng((_, _) => 0)),
      Multimodal.MediaRow(2L, "image", "png",
        argbPng((x, y) => x * 7919 + y * 104729)))
      .toDS()
    val px = Multimodal.grayPixels(rows, 9, 7).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(px(1L) == px(2L),
      "under-alpha RGB must never reach the hash")
    // the transparent half reads as WHITE (255), the opaque half 64
    assert(px(1L).take(4).forall(_ == 64) && px(1L).slice(5, 9).forall(_ == 255),
      s"got ${px(1L)}")
  }

  test("grayPixelsStub is deterministic, shaped w*h, and identical " +
      "payloads get identical pixels (hamming-0 dHash codes) — the " +
      "decode seam the pHash pipeline rides") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "wholly different text")).toDF("doc_id", "text")
    val px = Multimodal.grayPixelsStub(Multimodal.fromDocuments(docs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(px(1L).length == 63)
    assert(px.values.flatten.forall(v => v >= 0 && v <= 255))
    assert(px(1L) == px(2L), "identical payloads must decode identically")
    assert(px(1L) != px(3L))
    // and twice over the same input: bit-identical (md5 is pure)
    val again = Multimodal.grayPixelsStub(Multimodal.fromDocuments(docs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(again == px)
    val codes = Multimodal.grayPixelsStub(Multimodal.fromDocuments(docs))
      .select(col("media_id"), Multimodal.dHash(col("px")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(codes(1L) == codes(2L) && codes(1L) != codes(3L))
  }
}
