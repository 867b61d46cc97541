package graft.loadmerge

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The repeated-load scale story (Merge scaladoc): bucketing the
  * canonical table and the load table by the merge key makes the
  * upsert join shuffle-free — both sides are already co-partitioned,
  * so at 100 TB each daily load joins without moving the big table.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key tables join without a shuffle exchange") {
    val n = 10000
    val target = (1 to n).map(i => (s"p${i % 3}", s"fid$i", i.toDouble))
      .toDF("provider", "fid", "v")
    val source = (1 to n by 7).map(i => (s"p${i % 3}", s"fid$i", i * 2.0))
      .toDF("provider", "fid", "v2")

    spark.sql("DROP TABLE IF EXISTS canonical_bucketed")
    spark.sql("DROP TABLE IF EXISTS load_bucketed")
    target.write.bucketBy(8, "provider", "fid")
      .sortBy("provider", "fid").saveAsTable("canonical_bucketed")
    source.write.bucketBy(8, "provider", "fid")
      .sortBy("provider", "fid").saveAsTable("load_bucketed")

    val joined = spark.table("canonical_bucketed")
      .join(spark.table("load_bucketed"), Seq("provider", "fid"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == source.count())

    // and the un-bucketed control DOES shuffle
    val control = target.join(source, Seq("provider", "fid"))
    val controlPlan = control.queryExecution.executedPlan.toString
    assert(controlPlan.contains("Exchange"),
      "un-bucketed join was expected to shuffle")

    spark.sql("DROP TABLE IF EXISTS canonical_bucketed")
    spark.sql("DROP TABLE IF EXISTS load_bucketed")
  }

  test("merge-epoch appends fragment the canonical table; compact " +
      "(write-then-swap) collapses the files, preserves every row, " +
      "and the upsert join stays exchange-free afterwards") {
    import graft.jobs.AdmissionIndexes
    val keys = Seq("provider", "fid")
    spark.sql("DROP TABLE IF EXISTS canonical_compact")
    (1 to 200).map(i => (s"p${i % 3}", s"fid$i", i.toDouble))
      .toDF("provider", "fid", "v")
      .write.bucketBy(8, "provider", "fid")
      .sortBy("provider", "fid").saveAsTable("canonical_compact")
    // five merge epochs, each appending its delta under the same
    // bucket spec — one new file per (epoch x task x bucket)
    (1 to 5).foreach { e =>
      (1 to 20).map(i => (s"p${i % 3}", s"fid${1000 * e + i}", i.toDouble))
        .toDF("provider", "fid", "v")
        .write.mode("append").bucketBy(8, "provider", "fid")
        .sortBy("provider", "fid").saveAsTable("canonical_compact")
    }
    def dataFiles(): Int = {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      new java.io.File(wh, "canonical_compact").listFiles()
        .count(_.getName.startsWith("part-"))
    }
    val before = spark.table("canonical_compact")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet
    val filesBefore = dataFiles()
    assert(filesBefore > 8, s"epoch appends should fragment, got $filesBefore")

    AdmissionIndexes.compact(spark, "canonical_compact", keys, buckets = 8)
    assert(dataFiles() <= 8 && dataFiles() < filesBefore,
      s"expected <= 8 files after compaction, got ${dataFiles()}")
    val after = spark.table("canonical_compact")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(after == before, "compaction must preserve the canonical rows")

    // the repeated-load upgrade survives compaction: the next epoch's
    // bucketed load joins with no exchange
    spark.sql("DROP TABLE IF EXISTS load_compact")
    (1 to 50).map(i => (s"p${i % 3}", s"fid$i", i * 2.0))
      .toDF("provider", "fid", "v2")
      .write.bucketBy(8, "provider", "fid")
      .sortBy("provider", "fid").saveAsTable("load_compact")
    val joined = spark.table("canonical_compact")
      .join(spark.table("load_compact"), keys)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"compacted canonical table must still join shuffle-free:\n$plan")
    assert(joined.count() == 50)
    spark.sql("DROP TABLE IF EXISTS canonical_compact")
    spark.sql("DROP TABLE IF EXISTS load_compact")
  }
}
