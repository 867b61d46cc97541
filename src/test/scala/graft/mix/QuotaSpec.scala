package graft.mix

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuotaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0 until 3000)
    .map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")

  test("two-phase salted top-N equals the naive single-window rank " +
      "exactly (same rows, same ranks)") {
    val ord = Quota.orderKey(col("id"))
    val fast = Quota.topNPerGroup(docs, "grp", ord, n = 25)
      .select(col("id"), col("grp"), col("rnk"))
    val naive = docs.withColumn("__o", ord)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("__o"))))
      .filter(col("rnk") <= 25)
      .select(col("id"), col("grp"), col("rnk"))
    assert(fast.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(fast).count() == 0)
    assert(fast.count() == 75) // exactly 25 per group
  }

  test("plan: the salted (group, salt) shuffle reaches phase 1's " +
      "exchange, so no group's full data funnels through one task — " +
      "the single-task sort only ever sees phase 1's <= n*salts " +
      "survivors per group") {
    val ord = Quota.orderKey(col("id"))
    val plan = Quota.topNPerGroup(docs, "grp", ord, n = 25)
      .queryExecution.executedPlan.toString
    // exactly the two window stages of the design — a third would mean
    // an accidental extra global sort crept in
    assert("(?m)^[^\\n]*Window ".r.findAllIn(plan).size == 2,
      s"expected exactly 2 Window nodes:\n$plan")
    // phase 1 shuffles on (grp, salt) — Spark pre-projects the
    // pmod(xxhash64(ord), salts) salt as a _w0 window key, so the
    // salted exchange shows as hashpartitioning(grp, _w0, ...); its
    // presence means no group's full data ever sorts in one task
    assert("hashpartitioning\\(grp#\\d+, _w0#\\d+".r
        .findFirstIn(plan).isDefined,
      s"salted hashpartitioning missing — phase 1 would sort whole " +
        s"groups in single tasks:\n$plan")
    // and phase 2's exchange re-partitions by the group alone over
    // phase 1's bounded survivors
    assert("hashpartitioning\\(grp#\\d+, \\d+\\)".r
        .findFirstIn(plan).isDefined,
      s"unsalted phase-2 hashpartitioning missing:\n$plan")
  }

  test("quota membership is deterministic under repartitioning and " +
      "independent of the train/valid split hash") {
    val ord = Quota.orderKey(col("id"))
    val a = Quota.topNPerGroup(docs, "grp", ord, n = 25)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Quota.topNPerGroup(docs.repartition(17), "grp", ord, n = 25)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // different tag -> a (almost surely) different member set:
    // quota hashing must not correlate with Splits/other tags
    val c = Quota.topNPerGroup(docs, "grp",
      Quota.orderKey(col("id"), tag = "other"), n = 25)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a != c)
  }
}
