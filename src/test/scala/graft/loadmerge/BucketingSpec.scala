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
}
