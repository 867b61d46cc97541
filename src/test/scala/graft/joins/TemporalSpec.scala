package graft.joins

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def purchasesViews() = {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("p_us"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("t_us"))
      .agg(max_by(col("value"), col("event_id")).as("view_value"))
    (purchases, views)
  }

  test("asOfJoin equals the brute-force max-ts-at-or-before semantics " +
      "on real events, with and without tolerance") {
    val (p, v) = purchasesViews()
    for (tol <- Seq(None, Some(604800000000L), Some(3600000000L))) {
      val fast = Temporal.asOfJoin(p, v, "user_id", "p_us", "t_us",
        Seq("view_value"), tol).orderBy("event_id").collect()
      val slow = Temporal.asOfJoinBruteForce(p, v, "user_id", "p_us", "t_us",
        Seq("view_value"), tol).orderBy("event_id").collect()
      assert(fast.length == slow.length && fast.length > 0)
      assert(fast.toSeq == slow.toSeq, s"mismatch at tolerance $tol")
    }
  }

  test("asOfJoin: inclusive bound, left-outer nulls, and tolerance nulling") {
    val left = Seq((1L, 100L, "a"), (1L, 50L, "b"), (2L, 10L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 1.0), (1L, 60L, 2.0), (1L, 10L, 3.0))
      .toDF("k", "t", "v")
    val out = Temporal.asOfJoin(left, right, "k", "t", "t", Seq("v"))
      .orderBy("tag").collect().map(r =>
        (r.getString(2), Option(r.get(3)), Option(r.get(4)))).toSeq
    // a: right row AT 100 matches (inclusive); b: 10 <= 50 < 60 -> 10;
    // c: key 2 has no right rows -> nulls
    assert(out == Seq(
      ("a", Some(100L), Some(1.0)),
      ("b", Some(10L), Some(3.0)),
      ("c", None, None)))
    val bounded = Temporal.asOfJoin(left, right, "k", "t", "t", Seq("v"),
        tolerance = Some(30L))
      .orderBy("tag").collect().map(r => Option(r.get(3))).toSeq
    // b's nearest match (10) is 40 back > 30 -> nulled, row kept
    assert(bounded == Seq(Some(100L), None, None))
  }

  test("asOfJoin plans one equi shuffle — no nested-loop or cartesian " +
      "stage for the range condition") {
    val (p, v) = purchasesViews()
    val plan = Temporal.asOfJoin(p, v, "user_id", "p_us", "t_us",
      Seq("view_value")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("rangeJoinBucketed equals the naive interval theta join on real " +
      "events and plans no nested-loop stage") {
    val ev = Tables.events(spark, sf)
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - 1800000000L).as("lo"),
        unix_micros(col("ts")).as("hi"))
    val pts = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("value").as("click_value"))
    val fast = Temporal.rangeJoinBucketed(iv, pts, "user_id",
      "lo", "hi", "t_us", bucketWidth = 1800000000L)
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    val naive = iv.join(pts, Seq("user_id"))
      .filter(col("lo") < col("t_us") && col("t_us") <= col("hi"))
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val f = fast.select(col("event_id"), col("t_us")).collect().map(key).toSet
    val n = naive.select(col("event_id"), col("t_us")).collect().map(key).toSet
    assert(f == n && f.nonEmpty)
  }

  test("randomized parity: asOfJoin and rangeJoinBucketed match their " +
      "naive counterparts on seeded random inputs (ties, empty keys, " +
      "multi-bucket intervals included)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 3) {
      // keys 0-4, timestamps 0-99: dense enough to generate ties,
      // duplicate instants, and keys present on only one side
      val left = (0 until 60).map(i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(100).toLong))
        .toDF("lid", "k", "t")
      val right = (0 until 60).map(i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(100).toLong, rnd.nextDouble()))
        .toDF("k", "t", "v")
        .groupBy("k", "t").agg(max(col("v")).as("v")) // unique per (k,t)
      for (tol <- Seq(None, Some(15L))) {
        val fast = Temporal.asOfJoin(left, right, "k", "t", "t",
          Seq("v"), tol).collect().map(r =>
            (r.getLong(0), Option(r.get(3)), Option(r.get(4)))).toSet
        val slow = Temporal.asOfJoinBruteForce(left, right, "k", "t", "t",
          Seq("v"), tol).collect().map(r =>
            (r.getLong(0), Option(r.get(3)), Option(r.get(4)))).toSet
        assert(fast == slow, s"asOf mismatch at tolerance $tol")
      }
      val iv = (0 until 40).map { i =>
        val lo = rnd.nextInt(80).toLong
        (i.toLong, rnd.nextInt(5).toLong, lo, lo + rnd.nextInt(25))
      }.toDF("iv_id", "k", "lo", "hi")
      val pts = (0 until 60).map(i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(100).toLong, i.toLong))
        .toDF("k", "t", "pid")
      // bucketWidth 10 < max interval length 24: intervals span up to
      // 3 buckets — the multi-bucket path must still be exactly-once
      val fast = Temporal.rangeJoinBucketed(iv, pts, "k", "lo", "hi", "t", 10L)
        .select("iv_id", "pid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val naive = iv.join(pts, Seq("k"))
        .filter(col("lo") < col("t") && col("t") <= col("hi"))
        .select("iv_id", "pid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(fast.sorted.toSeq == naive.sorted.toSeq) // incl. multiplicity
    }
  }

  test("rangeJoinBucketed: intervals longer than a bucket still match " +
      "every point exactly once") {
    val iv = Seq((10L, 1L, 0L, 95L)).toDF("iv_id", "k", "lo", "hi")
    val pts = Seq((1L, 0L), (1L, 1L), (1L, 50L), (1L, 95L), (1L, 96L))
      .toDF("k", "t")
    val out = Temporal.rangeJoinBucketed(iv, pts, "k", "lo", "hi", "t", 10L)
      .select(col("t")).as[Long].collect().sorted.toSeq
    // (0, 95]: 0 excluded (half-open), 96 excluded, each match ONCE
    assert(out == Seq(1L, 50L, 95L))
  }
}
