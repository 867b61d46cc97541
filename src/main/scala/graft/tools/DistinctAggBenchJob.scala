package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** A/B of the two physical shapes for q_a2's double-distinct
  * aggregate, at the scale where they diverge:
  *
  *  - `expand` (the shipped query): one `groupBy(suppkey).agg(count,
  *    countDistinct(part), countDistinct(order))` — Catalyst plans an
  *    Expand x3 (one replica per aggregate "group"), a partial
  *    aggregate on (suppkey, part|order|null, gid) that dedups
  *    map-side, one exchange on suppkey, final aggregate. 2 exchanges
  *    total but 3x rows enter the partial aggregate.
  *
  *  - `twolevel`: each distinct count as its own pre-aggregate
  *    (`groupBy(suppkey, part).count` -> `groupBy(suppkey).count`),
  *    joined back to the plain total. 3 scans (column-pruned to 2
  *    cols each) and more exchanges, but no Expand: every partial
  *    aggregate sees 1x rows and the first-level exchange carries
  *    only distinct (suppkey, key) pairs.
  *
  * Both arms must produce the IDENTICAL top-100 frame before their
  * walls print. Arms alternate, min-of-2 each. Usage:
  * runMain graft.tools.DistinctAggBenchJob <sfDir|scaledDir> — the
  * dir needs only lineitem.parquet. Prints one JSON line.
  */
object DistinctAggBenchJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DistinctAggBenchJob <dir>")
    val dir = args(0)
    val spark = Sessions.local("graft-distinctagg-bench")

    def expand(): DataFrame = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("total"),
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_orderkey")).as("orders_d"))
      .orderBy(desc("total"), asc("l_suppkey"))
      .limit(100)

    def twolevel(): DataFrame = {
      val li = Tables.lineitem(spark, dir)
      def distinctCount(key: String, as: String) =
        li.select(col("l_suppkey"), col(key)).distinct()
          .groupBy(col("l_suppkey")).agg(count(lit(1)).as(as))
      li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("total"))
        .join(distinctCount("l_partkey", "parts"), Seq("l_suppkey"))
        .join(distinctCount("l_orderkey", "orders_d"), Seq("l_suppkey"))
        .select(col("l_suppkey"), col("total"), col("parts"),
          col("orders_d"))
        .orderBy(desc("total"), asc("l_suppkey"))
        .limit(100)
    }

    def time(f: () => DataFrame): (Double, Seq[(Long, Long, Long, Long)]) = {
      val t0 = System.nanoTime()
      val rows = f().collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    val (e1, rowsE) = time(expand _)
    val (t1, rowsT) = time(twolevel _)
    require(rowsE == rowsT,
      s"arms disagree: expand head ${rowsE.take(2)} vs twolevel ${rowsT.take(2)}")
    val (e2, _) = time(expand _)
    val (t2, _) = time(twolevel _)
    val expandS = math.min(e1, e2)
    val twoS = math.min(t1, t2)
    println(s"""{"dir":"$dir","expand_s":${f"$expandS%.2f"},""" +
      s""""twolevel_s":${f"$twoS%.2f"},""" +
      s""""twolevel_over_expand":${f"${twoS / expandS}%.3f"},""" +
      s""""passes":[${f"$e1%.2f"},${f"$t1%.2f"},${f"$e2%.2f"},${f"$t2%.2f"}],""" +
      s""""rows":${rowsE.size}}""")
    spark.stop()
  }
}
