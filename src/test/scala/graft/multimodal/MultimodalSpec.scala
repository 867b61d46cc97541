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
}
