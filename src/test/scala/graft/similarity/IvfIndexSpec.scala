package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.jobs.AdmissionIndexes

/** The persisted-IVF contract: build once, probe cold with results
  * equal to the inline fit at fixed centroids, grow by appending
  * batches assigned against the STORED centroids, and read only the
  * probed cells' buckets. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic vectors, loosely clustered so IVF cells
  // carry structure (same recipe family as SimilaritySpec)
  private def vec(i: Int, dim: Int = 16): Array[Float] = {
    val c = i % 4
    Array.tabulate(dim)(j =>
      (math.sin(c * 31 + j).toFloat * 2f) +
        math.cos(i * 7 + j * 3).toFloat * 0.3f)
  }

  private def frame(ids: Range) =
    ids.map(i => (i.toLong, vec(i))).toDF("id", "vec")

  test("ivfTopKFromIndex probing the persisted tables equals ivfTopK " +
      "at the same centroids, cold — no refit, no re-assignment") {
    val base = frame(100 until 400)
    val queries = frame(0 until 8)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val (cents, assigned) = Similarity.ivfIndex(base, nLists = 8)
    AdmissionIndexes.saveIvfIndex(assigned, "ivf_idx", buckets = 8)
    AdmissionIndexes.saveIvfCentroids(cents, "ivf_idx_cents")

    val probed = Similarity.ivfTopKFromIndex(queries,
        AdmissionIndexes.load(spark, "ivf_idx"),
        AdmissionIndexes.load(spark, "ivf_idx_cents"),
        k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    // inline fit is deterministic on the same base + seed, so its
    // centroids equal the stored ones and results must match
    val inline = Similarity.ivfTopK(queries, base, k = 3,
        nLists = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(probed == inline && probed.nonEmpty)

    // exhaustive probe == brute force, through the persisted tables
    val exhaustive = Similarity.ivfTopKFromIndex(queries,
        AdmissionIndexes.load(spark, "ivf_idx"),
        AdmissionIndexes.load(spark, "ivf_idx_cents"),
        k = 3, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    val brute = Similarity.bruteForceTopK(queries, base, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(exhaustive == brute)
    spark.sql("DROP TABLE IF EXISTS ivf_idx")
    spark.sql("DROP TABLE IF EXISTS ivf_idx_cents")
  }

  test("the probe scan bucket-prunes to the probed cells " +
      "(SelectedBucketsCount) and never reshuffles the index side") {
    val base = frame(100 until 400)
    val queries = frame(0 until 2)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val (cents, assigned) = Similarity.ivfIndex(base, nLists = 8)
    AdmissionIndexes.saveIvfIndex(assigned, "ivf_prune", buckets = 8)
    AdmissionIndexes.saveIvfCentroids(cents, "ivf_prune_cents")
    val probe = Similarity.ivfTopKFromIndex(queries,
      AdmissionIndexes.load(spark, "ivf_prune"),
      AdmissionIndexes.load(spark, "ivf_prune_cents"),
      k = 3, nProbe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.nonEmpty, s"expected a bucket-pruned scan in:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"expected fewer than all ${m.get.group(2)} buckets read")
    assert(probe.collect().nonEmpty)
    spark.sql("DROP TABLE IF EXISTS ivf_prune")
    spark.sql("DROP TABLE IF EXISTS ivf_prune_cents")
  }

  test("persisted IVF-PQ: cold probe of the codes-only index equals " +
      "the inline fit; exhaustive probe equals brute force; the " +
      "index carries NO vectors and the scan bucket-prunes") {
    val base = frame(100 until 400)
    val queries = frame(0 until 8)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val (cents, cbDf, assigned) = Pq.ivfPqIndex(base, nLists = 8,
      m = 8, kCodes = 16)
    AdmissionIndexes.saveIvfIndex(assigned, "ivfpq_idx", buckets = 8)
    AdmissionIndexes.saveIvfCentroids(cents, "ivfpq_idx_cents")
    AdmissionIndexes.savePqCodebooks(cbDf, "ivfpq_idx_cb")
    val idx = AdmissionIndexes.load(spark, "ivfpq_idx")
    // the stored index is codes, never vectors — the PQ memory win
    assert(idx.columns.toSet == Set("cell", "id", "codes"),
      s"index must be codes-only, got ${idx.columns.mkString(",")}")

    def shaped(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val probe = Pq.ivfPqTopKFromIndex(queries, idx,
      AdmissionIndexes.load(spark, "ivfpq_idx_cents"),
      AdmissionIndexes.load(spark, "ivfpq_idx_cb"),
      base, k = 3, nProbe = 4, refine = 4)
    val plan = probe.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.nonEmpty && m.get.group(1).toInt < m.get.group(2).toInt,
      s"expected a bucket-pruned codes scan in:\n${plan.take(3000)}")
    val inline = shaped(Pq.ivfPqTopK(queries, base, k = 3, nLists = 8,
      nProbe = 4, m = 8, kCodes = 16, refine = 4).collect())
    assert(shaped(probe.collect()) == inline && inline.nonEmpty,
      "cold probe diverged from the inline fit")

    val exhaustive = shaped(Pq.ivfPqTopKFromIndex(queries, idx,
      AdmissionIndexes.load(spark, "ivfpq_idx_cents"),
      AdmissionIndexes.load(spark, "ivfpq_idx_cb"),
      base, k = 3, nProbe = 8, refine = Int.MaxValue).collect())
    val brute = shaped(Similarity.bruteForceTopK(queries, base, 3)
      .collect())
    assert(exhaustive == brute)

    // append face: a batch coded against the STORED quantizers is
    // visible to the next probe at rank 1 (exact twin of the query)
    val batch = Seq((9000L, vec(5))).toDF("id", "vec")
    AdmissionIndexes.saveIvfIndex(
      Pq.ivfPqAssign(batch,
        Similarity.loadedCentroids(
          AdmissionIndexes.load(spark, "ivfpq_idx_cents")),
        Pq.loadedCodebooks(
          AdmissionIndexes.load(spark, "ivfpq_idx_cb"))),
      "ivfpq_idx", buckets = 8, append = true)
    val q5 = Seq((5L, vec(5))).toDF("qid", "qvec")
    val after = Pq.ivfPqTopKFromIndex(q5,
        AdmissionIndexes.load(spark, "ivfpq_idx"),
        AdmissionIndexes.load(spark, "ivfpq_idx_cents"),
        AdmissionIndexes.load(spark, "ivfpq_idx_cb"),
        base.union(batch), k = 3, nProbe = 4, refine = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toList
    assert(after.headOption.map(_._2).contains(9000L),
      s"appended exact twin must probe at rank 1, got $after")
    Seq("ivfpq_idx", "ivfpq_idx_cents", "ivfpq_idx_cb").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("append face: a batch assigned against the STORED centroids " +
      "appends under the same bucket spec and the next probe finds " +
      "its vectors; compact preserves probe results exactly") {
    val base = frame(100 until 300)
    val (cents, assigned) = Similarity.ivfIndex(base, nLists = 4)
    AdmissionIndexes.saveIvfIndex(assigned, "ivf_grow", buckets = 4)
    AdmissionIndexes.saveIvfCentroids(cents, "ivf_grow_cents")

    // the batch contains an exact twin of a later query vector, so
    // the probe MUST surface it at rank 1 if the append is visible
    val batch = Seq((9000L, vec(7))).toDF("id", "vec")
    val stored = Similarity.loadedCentroids(
      AdmissionIndexes.load(spark, "ivf_grow_cents"))
    AdmissionIndexes.saveIvfIndex(
      Similarity.ivfAssign(batch, stored),
      "ivf_grow", buckets = 4, append = true)

    val queries = Seq((7L, vec(7))).toDF("qid", "qvec")
    def topIds() = Similarity.ivfTopKFromIndex(queries,
        AdmissionIndexes.load(spark, "ivf_grow"),
        AdmissionIndexes.load(spark, "ivf_grow_cents"),
        k = 3, nProbe = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toList
    val before = topIds()
    assert(before.headOption.map(_._2).contains(9000L),
      s"appended exact twin must probe at rank 1, got $before")

    // compaction (write-then-swap) leaves probe results identical
    AdmissionIndexes.compact(spark, "ivf_grow",
      AdmissionIndexes.ivfKeys, buckets = 4)
    assert(topIds() == before, "probe must be identical after compact")
    spark.sql("DROP TABLE IF EXISTS ivf_grow")
    spark.sql("DROP TABLE IF EXISTS ivf_grow_cents")
  }
}
