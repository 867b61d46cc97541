package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** A/B of the two physical shapes for q_a2's double-distinct
  * aggregate, at the scale where they diverge:
  *
  *  - `expand` (the pre-r15 shape, kept as the comparison arm): one
  *    `groupBy(suppkey).agg(count,
  *    countDistinct(part), countDistinct(order))` — Catalyst plans an
  *    Expand x3 (one replica per aggregate "group"), a partial
  *    aggregate on (suppkey, part|order|null, gid) that dedups
  *    map-side, one exchange on suppkey, final aggregate. 2 exchanges
  *    total but 3x rows enter the partial aggregate.
  *
  *  - `twolevel`: THE production q_a2 (graft.Aggregates
  *    .withDistinctCounts through the SparkEntry registry) — each
  *    distinct count as its own pre-aggregate joined back
  *    null-safely. 3 scans (column-pruned to 2 cols each) and more
  *    exchanges, but no Expand: every partial aggregate sees 1x rows
  *    and the first-level exchange carries only distinct
  *    (suppkey, key) pairs.
  *
  * Both arms must produce the IDENTICAL top-100 frame before their
  * walls print (single-JVM mode). Usage:
  * runMain graft.tools.DistinctAggBenchJob <dir>
  * [expand|twolevel|twolevel_nn|union|both]
  * — the dir needs only lineitem.parquet. `both` (default) alternates
  * the arms min-of-2 in one JVM (`twolevel_nn` — the
  * groupNullable=false fast path — and `union` run single-arm only);
  * a single-arm run exists so a
  * heap-death in one arm can be ATTRIBUTED (HotKeyBenchJob's
  * failure-matrix discipline — at 600M rows the expand arm's fate is
  * part of the measurement), printing the arm's wall plus an
  * order-free fingerprint of its top-100 so cross-JVM parity can
  * still be checked. Prints one JSON line per run.
  */
object DistinctAggBenchJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: DistinctAggBenchJob <dir> [expand|twolevel|twolevel_nn|union|both]")
    val dir = args(0)
    val arm = args.lift(1).getOrElse("both")
    require(Set("expand", "twolevel", "twolevel_nn", "union", "both")(arm),
      s"arm must be expand|twolevel|twolevel_nn|union|both, got '$arm'")
    val spark = Sessions.local("graft-distinctagg-bench")

    def expand(): DataFrame = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("total"),
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_orderkey")).as("orders_d"))
      .orderBy(desc("total"), asc("l_suppkey"))
      .limit(100)

    // the twolevel arm IS the production query, invoked through the
    // driver registry — the measurement and the shipped plan cannot
    // drift (a review pass caught an earlier hand copy that had
    // already lost the null filter and the outer joins)
    def twolevel(): DataFrame =
      graft.SparkEntry.queries("q_a2_top_domains")(spark, dir)

    // the groupNullable=false fast path (plain === join-backs reuse
    // the aggregates' partitioning — 5 exchanges at 1000x instead of
    // the null-safe form's 8): l_suppkey is structurally non-null, so
    // q_a2 QUALIFIES for it; measured here before any registry swap
    def twolevelNn(): DataFrame =
      graft.Aggregates.withDistinctCounts(
          Tables.lineitem(spark, dir), "l_suppkey", "total",
          Seq("l_partkey" -> "parts", "l_orderkey" -> "orders_d"),
          groupNullable = false)
        .orderBy(desc("total"), asc("l_suppkey"))
        .limit(100)

    // the join-free tagged-union candidate (keys + 1 exchanges, no
    // null-safe join re-exchanges) — measured here before any swap
    def union(): DataFrame =
      graft.Aggregates.withDistinctCountsUnion(
          Tables.lineitem(spark, dir), "l_suppkey", "total",
          Seq("l_partkey" -> "parts", "l_orderkey" -> "orders_d"))
        .orderBy(desc("total"), asc("l_suppkey"))
        .limit(100)

    def time(f: () => DataFrame): (Double, Seq[(Long, Long, Long, Long)]) = {
      val t0 = System.nanoTime()
      val rows = f().collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    def fingerprint(rows: Seq[(Long, Long, Long, Long)]): Long =
      rows.map { case (a, b, c, d) =>
        java.util.Objects.hash(a, b, c, d).toLong }.sum

    if (arm == "both") {
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
    } else {
      val f = arm match {
        case "expand" => expand _
        case "union" => union _
        case "twolevel_nn" => twolevelNn _
        case _ => twolevel _
      }
      val (w1, rows) = time(f)
      val (w2, _) = time(f)
      println(s"""{"dir":"$dir","arm":"$arm",""" +
        s""""wall_s":${f"${math.min(w1, w2)}%.2f"},""" +
        s""""passes":[${f"$w1%.2f"},${f"$w2%.2f"}],""" +
        s""""rows":${rows.size},"fingerprint":${fingerprint(rows)}}""")
    }
    spark.stop()
  }
}
