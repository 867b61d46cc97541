package graft.maintain

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups x 10k rows with known distinct cardinalities
  private lazy val data = (0 until 30000).map { i =>
    val g = i % 3
    // group 0: 1000 distinct, group 1: 5000 distinct, group 2: 137
    val card = Seq(1000, 5000, 137)(g)
    (s"g$g", s"v${i % (card * 3) % card}", (i % 997).toDouble)
  }.toDF("grp", "value", "x")

  test("HLL distinct counts land within ~3x rsd of the exact counts") {
    val exact = data.groupBy("grp").agg(countDistinct(col("value")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.distinctCount(data, Seq("grp"), "value", rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      val a = approx(g)
      assert(math.abs(a - n).toDouble / n <= 0.06,
        s"group $g exact $n approx $a")
    }
  }

  test("sketch percentiles land within 1% rank error of the exact data") {
    val ps = Seq(0.25, 0.5, 0.95)
    val approx = Sketches.percentiles(data, Seq("grp"), "x", ps,
        accuracy = 10000)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exact = data.select("grp", "x").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    // the sketch's per-partition summaries merge with inflated error,
    // so assert the delivered RANK error against the true sorted data:
    // within 1% of n (plus one value's multiplicity, since equal
    // values span a rank interval)
    approx.foreach { case (g, qs) =>
      val xs = exact(g)
      val n = xs.length
      ps.zip(qs).foreach { case (p, v) =>
        val below = xs.count(_ < v)
        val atMost = xs.count(_ <= v)
        val target = p * n
        val rankErr = // distance from target to the value's rank span
          if (target < below) below - target
          else if (target > atMost) target - atMost
          else 0.0
        assert(rankErr <= 0.01 * n, s"group $g p=$p got $v rankErr $rankErr")
      }
    }
  }

  test("topK plans a bounded heap (TakeOrderedAndProject), not a global sort") {
    val out = Sketches.topK(data, "value", 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(out.collect().length == 5)
  }

  test("frequentItems delivers the Misra-Gries guarantee on skewed data " +
      "regardless of partitioning") {
    // Zipf-ish truth: item i appears ~60000/i times, plus a long tail
    // of singletons — heavy hitters well above n/(k+1) and a dense
    // band of borderline items below it.
    val rows = (1 to 40).flatMap(i => Seq.fill(60000 / i)(s"hh$i")) ++
      (0 until 20000).map(i => s"tail$i")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val k = 50
    val errBound = n.toDouble / (k + 1)
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.sparkContext.parallelize(
        scala.util.Random.shuffle(rows), parts).toDF("item")
      val got = Sketches.frequentItems(df, "item", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(got.forall(_._3 == errBound))
      val gotMap = got.map(x => x._1 -> x._2).toMap
      assert(got.length <= k, s"parts=$parts: ${got.length} entries > k")
      // every true heavy hitter above the guarantee line is present
      truth.filter(_._2 > errBound).foreach { case (item, f) =>
        assert(gotMap.contains(item),
          s"parts=$parts: heavy hitter $item (freq $f) missing")
      }
      // stored counts are under-estimates within the bound
      gotMap.foreach { case (item, c) =>
        val f = truth(item)
        assert(c <= f && f <= c + errBound,
          s"parts=$parts: $item stored $c true $f bound $errBound")
      }
    }
  }

  test("frequentItemsByGroup delivers the per-group guarantee with " +
      "independent group budgets") {
    val k = 10
    // group A: one dominant item + tail; group B: uniform tail only
    val rows = Seq.fill(5000)(("A", "hot")) ++
      (0 until 3000).map(i => ("A", s"a$i")) ++
      (0 until 4000).map(i => ("B", s"b${i % 2000}"))
    val df = spark.sparkContext.parallelize(
      scala.util.Random.shuffle(rows), 16).toDF("grp", "item")
    val got = Sketches.frequentItemsByGroup(df, Seq("grp"), "item", k)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val byGrp = got.groupBy(_._1)
    // per-group err bounds reflect each group's OWN size
    assert(byGrp("A").head._4 == 8000.0 / (k + 1))
    byGrp.get("B").foreach(b => assert(b.head._4 == 4000.0 / (k + 1)))
    // A's dominant item (5000 > 8000/11) must be present with a
    // count within the group bound
    val hot = byGrp("A").find(_._2 == "hot")
    assert(hot.isDefined, s"hot missing from ${byGrp("A").toSeq}")
    assert(hot.get._3 <= 5000 && 5000 <= hot.get._3 + 8000.0 / (k + 1))
    assert(byGrp.values.forall(_.length <= k))
  }
}
