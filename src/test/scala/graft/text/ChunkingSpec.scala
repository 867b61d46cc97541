package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int) =
    Seq((1L, (0 until n).map(i => s"w$i").mkString(" "))).toDF("id", "text")

  test("overlapping windows cover every token with the declared overlap") {
    val out = Chunking.chunk(doc(150), "id", "text", winLen = 64, stride = 48)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getAs[Int]("chunk_idx"), r.getAs[Int]("n_tokens"),
        r.getAs[String]("chunk_text")))
    // ceil((150-64)/48)+1 = 3 windows at offsets 0, 48, 96
    assert(out.map(_._1).toSeq == Seq(0, 1, 2))
    assert(out.map(_._2).toSeq == Seq(64, 64, 54))
    val chunks = out.map(_._3.split(" ").toSeq)
    assert(chunks(0).head == "w0" && chunks(0).last == "w63")
    assert(chunks(1).head == "w48" && chunks(2).last == "w149")
    // consecutive windows overlap by winLen - stride = 16 tokens
    assert(chunks(0).toSet.intersect(chunks(1).toSet).size == 16)
    // full coverage
    assert(chunks.flatten.toSet == (0 until 150).map(i => s"w$i").toSet)
  }

  test("stride == winLen partitions exactly and reconstructs the text") {
    val original = (0 until 130).map(i => s"w$i").mkString(" ")
    val out = Chunking.chunk(doc(130), "id", "text", winLen = 32, stride = 32)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getAs[Int]("n_tokens")).sum == 130)
    assert(out.map(_.getAs[String]("chunk_text")).mkString(" ") == original)
  }

  test("documents shorter than one window yield exactly one chunk") {
    val out = Chunking.chunk(doc(10), "id", "text", winLen = 64, stride = 48)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Int]("chunk_idx") == 0)
    assert(out.head.getAs[Int]("n_tokens") == 10)
    assert(out.head.getAs[String]("chunk_text") ==
      (0 until 10).map(i => s"w$i").mkString(" "))
  }

  test("chunking is a Generate over row-local math — no shuffle in the plan") {
    val plan = Chunking.chunk(doc(150), "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
