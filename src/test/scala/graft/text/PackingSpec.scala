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

  test("packShardsSplit slices every straddling document exactly at " +
      "the budget: per-document slices are contiguous from 0 and sum " +
      "to its token count, every shard but the last holds exactly " +
      "`budget` tokens, and the first slice lands in packShards' shard") {
    val docs = (1 to 300)
      .map(i => (i.toLong, Seq.fill(1 + i % 53)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val budget = 64L
    for (nPart <- Seq(1, 3, 32)) {
      val rows = Packing.packShardsSplit(docs, "doc_id",
          TextStats.tokenCount(col("text")), budget, partitions = nPart)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .sortBy(r => (r._1, r._2))
      // per document: contiguous [0, n) coverage across increasing shards
      val n = docs.collect()
        .map(r => r.getLong(0) -> r.getString(1).split(" ").length.toLong)
        .toMap
      rows.groupBy(_._1).foreach { case (id, slices) =>
        val s = slices.sortBy(_._2)
        assert(s.head._3 == 0L, s"doc $id first slice must start at 0")
        assert(s.last._4 == n(id), s"doc $id slices must cover to n")
        s.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._4 == b._3 && b._2 == a._2 + 1,
              s"doc $id slices must be contiguous across adjacent shards")
          case _ => ()
        }
      }
      // per shard: exactly `budget` tokens except the last
      val perShard = rows.groupBy(_._2).view
        .mapValues(_.map(s => s._4 - s._3).sum).toMap
      val lastShard = perShard.keys.max
      perShard.foreach { case (sh, tot) =>
        if (sh != lastShard)
          assert(tot == budget, s"shard $sh holds $tot != $budget")
        else assert(tot <= budget)
      }
      // whole-document assignment agreement: the first slice's shard
      // is the shard packShards assigns (same prefix, same floor)
      val whole = Packing.packShards(docs, "doc_id",
          TextStats.tokenCount(col("text")), budget, partitions = nPart)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      rows.groupBy(_._1).foreach { case (id, slices) =>
        assert(slices.minBy(_._2)._2 == whole(id), s"doc $id")
      }
    }
  }

  test("packShardsSplit emits one empty [0, 0) slice for a zero-token " +
      "document, in the shard the prefix sum places it") {
    // tokenCount of the empty string is 1 under the split discipline,
    // so build a zero via a literal 0 token column instead
    val docs = Seq((1L, 5L), (2L, 0L), (3L, 5L)).toDF("doc_id", "n")
    val rows = Packing.packShardsSplit(docs, "doc_id", col("n"),
        budget = 4, partitions = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2))
    // doc 1: p=0 n=5 -> shards 0 [0,4) and 1 [4,5)
    // doc 2: p=5 n=0 -> shard 1, [0,0)
    // doc 3: p=5 n=5 -> shards 1 [0,3) and 2 [3,5)
    assert(rows.toList == List(
      (1L, 0, 0L, 4L), (1L, 1, 4L, 5L),
      (2L, 1, 0L, 0L),
      (3L, 1, 0L, 3L), (3L, 2, 3L, 5L)))
  }

  test("packShards never runs a single-partition global window: the " +
      "plan has no Exchange SinglePartition") {
    val docs = (1 to 100).map(i => (i.toLong, "a b c")).toDF("doc_id", "text")
    val plan = Packing.packShards(docs, "doc_id",
        TextStats.tokenCount(col("text")), budget = 10, partitions = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.take(2000))
    val splitPlan = Packing.packShardsSplit(docs, "doc_id",
        TextStats.tokenCount(col("text")), budget = 10, partitions = 8)
      .queryExecution.executedPlan.toString
    assert(!splitPlan.contains("SinglePartition"), splitPlan.take(2000))
  }
}
