package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packShards equals the single-window exclusive-prefix-sum " +
      "definition, for any partition count") {
    val docs = (1 to 500)
      .map(i => (i.toLong, Seq.fill(1 + i % 37)("w").mkString(" ")))
      .toDF("doc_id", "text")
    // driver-side truth: exclusive prefix sum of token counts in id
    // order, divided by the budget
    val counts = docs.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").length.toLong)
    val truth = counts.scanLeft((0L, 0L)) { case ((_, acc), (_, n)) =>
      (0L, acc + n) }.init.map(_._2)
      .zip(counts).map { case (prefix, (id, _)) => id -> (prefix / 100).toInt }
      .toMap
    for (nPart <- Seq(1, 3, 32)) {
      val got = Packing.packShards(docs, "doc_id",
          TextStats.tokenCount(col("text")), budget = 100,
          partitions = nPart)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == truth, s"nPart=$nPart")
    }
  }

  test("packShards never runs a single-partition global window: the " +
      "plan has no Exchange SinglePartition") {
    val docs = (1 to 100).map(i => (i.toLong, "a b c")).toDF("doc_id", "text")
    val plan = Packing.packShards(docs, "doc_id",
        TextStats.tokenCount(col("text")), budget = 10, partitions = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.take(2000))
  }
}
