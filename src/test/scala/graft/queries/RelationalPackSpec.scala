package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r15 two-level q_a2 shape against the semantics of the
  * single-agg countDistinct it replaced — specifically the NULL
  * cases the driver testdata cannot exercise (no null keys there):
  * countDistinct counts non-null values only, and a group whose key
  * column is all-null must keep its total with a 0 distinct count,
  * not vanish through an inner join or count the null as a value. */
class RelationalPackSpec extends SparkSpec {
  import spark.implicits._

  test("q_a2's two-level distinct counts match countDistinct " +
      "semantics under null keys") {
    val li = Seq[(Long, Option[Long], Option[Long])](
      (1L, Some(10L), Some(100L)),
      (1L, Some(10L), Some(101L)),
      (1L, None, Some(101L)),     // null partkey: not a distinct part
      (2L, None, None),           // all-null group: total 1, counts 0
      (2L, None, None)            // ...total 2
    ).toDF("l_suppkey", "l_partkey", "l_orderkey")

    // the production shape, on a frame with nulls (built inline the
    // same way RelationalPack builds it — the query reads a parquet
    // dir, so the null CASES are pinned here on the same plan shape)
    def distinctCount(key: String, as: String) =
      li.filter(col(key).isNotNull)
        .select(col("l_suppkey"), col(key)).distinct()
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as(as))
    val twoLevel = li
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("total"))
      .join(distinctCount("l_partkey", "parts"), Seq("l_suppkey"), "left")
      .join(distinctCount("l_orderkey", "orders_d"), Seq("l_suppkey"), "left")
      .select(col("l_suppkey"), col("total"),
        coalesce(col("parts"), lit(0L)).as("parts"),
        coalesce(col("orders_d"), lit(0L)).as("orders_d"))

    val reference = li.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("total"),
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_orderkey")).as("orders_d"))

    val got = twoLevel.orderBy("l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = reference.orderBy("l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq, s"got ${got.toSeq} want ${want.toSeq}")
    assert(got.toSeq == Seq((1L, 3L, 1L, 2L), (2L, 2L, 0L, 0L)),
      "all-null group keeps total with 0 distinct counts")
  }
}
