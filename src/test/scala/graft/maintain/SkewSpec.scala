package graft.maintain

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation gives the same totals as a direct groupBy") {
    // 90% of rows share one hot key
    val df = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toDouble))
      .toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val salted = Skew.saltedAgg(df, "k", saltBuckets = 8,
        partialAggs = Seq(count(lit(1)).as("n"), sum("v").as("s")),
        finalAggs = Seq(sum("n").as("n"), sum("s").as("s")))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.map(t => (t._1, t._2)).toSeq == direct.map(t => (t._1, t._2)).toSeq)
    salted.zip(direct).foreach { case (s, d) =>
      assert(math.abs(s._3 - d._3) < 1e-6)
    }
  }

  test("salted join matches a plain join, every fact row exactly once") {
    val fact = (1 to 1000).map(i =>
      (if (i % 20 == 0) s"k${i % 5}" else "HOT", i)).toDF("k", "x")
    val dim = Seq(("HOT", "hot-dim"), ("k0", "d0"), ("k1", "d1"),
      ("k2", "d2"), ("k3", "d3"), ("k4", "d4")).toDF("k", "label")
    val plain = fact.join(dim, Seq("k")).count()
    val salted = Skew.saltedJoin(fact, dim, "k", saltBuckets = 4).count()
    assert(salted == plain)
  }
}
