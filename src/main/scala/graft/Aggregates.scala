package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared aggregate shapes with a measured scale rationale. */
object Aggregates {

  /** count(*) + one null-faithful distinct count per (key -> alias)
    * entry, per `groupCol` group — WITHOUT the Expand plan Catalyst
    * produces for multiple countDistincts in one aggregate.
    *
    * Why not `agg(count, countDistinct, countDistinct)`: Catalyst
    * plans that as an Expand x(1 + keys) whose partial aggregate's
    * working set scales with the expanded row count — measured DEAD
    * (OOM in the spill reader's read-ahead) at 600M input rows on an
    * 8 GB heap, and 1.3x slower even with 4x the heap
    * (DistinctAggBenchJob's r15 matrix; PERF.md item 10). This shape
    * computes each distinct count as its own (group, key)
    * pre-aggregate: one extra exchange per key, but every partial
    * aggregate sees 1x rows and spills like any hash aggregate.
    *
    * Semantics match the single-agg form exactly, including nulls:
    * null KEY values don't count (countDistinct ignores them; an
    * all-null group keeps its total with a 0), and a null GROUP key
    * is a real group (the join back is null-safe `<=>` — a plain
    * equi-join would zero the null group's distinct counts because
    * null never equals null). AggregatesSpec pins both against the
    * countDistinct reference. */
  def withDistinctCounts(
      df: DataFrame,
      groupCol: String,
      totalAs: String,
      distinctKeys: Seq[(String, String)]): DataFrame = {
    val totals = df.groupBy(col(groupCol)).agg(count(lit(1)).as(totalAs))
    val joined = distinctKeys.foldLeft(totals) { case (acc, (key, as)) =>
      val dc = df.filter(col(key).isNotNull)
        .select(col(groupCol).as("__g"), col(key)).distinct()
        .groupBy(col("__g")).agg(count(lit(1)).as(as))
      acc.join(dc, acc(groupCol) <=> dc("__g"), "left").drop("__g")
    }
    joined.select(col(groupCol) +: col(totalAs) +:
      distinctKeys.map { case (_, as) =>
        coalesce(col(as), lit(0L)).as(as) }: _*)
  }
}
