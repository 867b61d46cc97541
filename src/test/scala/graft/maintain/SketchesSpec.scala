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
}
