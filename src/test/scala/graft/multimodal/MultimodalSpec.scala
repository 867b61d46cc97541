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
}
