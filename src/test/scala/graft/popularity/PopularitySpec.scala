package graft.popularity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Popularity math cases from util/popularity/test_sql.py:153-426. */
class PopularitySpec extends SparkSpec {
  import spark.implicits._

  test("percentile constant: ((1-p)/p) * percentile value (test_sql.py:247)") {
    val df = (1 to 100).map(i => ("flickr", i.toDouble)).toDF("provider", "views")
    val c = Popularity.percentileConstants(df, "provider", col("views"), 0.8)
      .collect().head
    assert(c.getAs[Double]("raw_value") == 80.0)
    assert(math.abs(c.getAs[Double]("constant") - 0.25 * 80.0) < 1e-12)
  }

  test("zero percentile raw value guards to 1 (sql.py:193-197)") {
    val df = Seq(("p", 0.0), ("p", 0.0)).toDF("provider", "views")
    val c = Popularity.percentileConstants(df, "provider", col("views"), 0.85)
      .collect().head
    assert(c.getAs[Double]("value") == 1.0)
  }

  test("standardized popularity x/(x+c); null metric propagates (test_sql.py:303,359)") {
    val df = Seq(("p", Option(100.0)), ("p", Option.empty[Double]),
      ("p", Option(300.0))).toDF("provider", "views")
    val consts = Seq(("p", 50.0)).toDF("provider", "constant")
    val out = Popularity.standardized(df, "provider", col("views"), consts)
      .orderBy(col("views").asc_nulls_first).collect()
    assert(out(0).isNullAt(out(0).fieldIndex("standardized_popularity")))
    assert(math.abs(out(1).getAs[Double]("standardized_popularity") -
      100.0 / 150.0) < 1e-12)
    assert(math.abs(out(2).getAs[Double]("standardized_popularity") -
      300.0 / 350.0) < 1e-12)
  }
}
