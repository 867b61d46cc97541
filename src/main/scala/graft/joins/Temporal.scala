package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join family: backward as-of join and interval (range)
  * join — the two joins event/feature pipelines need that have no
  * direct equi-join form. Both are implemented so the plan Spark
  * produces is an EQUI shuffle (one exchange on the join key), never
  * a nested-loop/cartesian stage: a naive `l.ts >= r.ts` or
  * `lo < ts AND ts <= hi` condition carries no equi key, so Catalyst
  * plans BroadcastNestedLoopJoin — quadratic per key and the join
  * that dies first at 100 TB.
  *
  * Reference context: the reference's closest construct is the tiered
  * reingestion back-shift schedule (flickr_ingestion_workflow.py:33-46)
  * joining each snapshot to the most recent prior load — an as-of
  * lookup done procedurally in Airflow; here it is one declarative
  * operator.
  */
object Temporal {

  /** Backward as-of join: for every left row, the most recent right
    * row with `r.ts <= l.ts` on the same key (inclusive bound —
    * a right row at exactly the left timestamp matches).
    *
    * Scale design: both inputs are unioned and windowed — ONE shuffle
    * of (left + right) on `key`, then a streaming
    * `last(ignoreNulls)` over rows-unbounded-preceding, which Spark
    * evaluates incrementally per partition in O(1) memory per row.
    * No range condition ever reaches a join operator, so the plan
    * cannot degrade to a nested loop regardless of key cardinality;
    * skewed keys are handled like any window shuffle (AQE).
    *
    * Contract:
    *  - `ts` is an integral column (epoch µs by convention — µs
    *    integers are exact where double epoch math is not);
    *  - `right` must be unique per (key, ts): with two right rows at
    *    one instant "the most recent" is ill-defined — pre-aggregate
    *    (e.g. max_by) first;
    *  - `rightCols` must not clash with left column names;
    *  - left-outer semantics: unmatched left rows keep nulls.
    *
    * `tolerance` (same unit as `ts`): a match farther back than
    * `l.ts - tolerance` is nulled out — the row stays, its match
    * goes. Nearest-within-tolerance equals nearest-overall when that
    * is in tolerance, else no row is (all others are older), so
    * post-filtering the single nearest match is exact.
    *
    * Output: left.* + `asof_ts` (matched right ts, null if none) +
    * `rightCols`.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val lCols = left.columns.toSeq
    require(!lCols.contains("asof_ts") && !rightCols.contains("asof_ts"),
      "column name asof_ts is reserved for the matched right timestamp")
    require(rightCols.forall(!lCols.contains(_)),
      s"rightCols ${rightCols.filter(lCols.contains)} clash with left columns")
    val rStruct = struct(col(rightTs).as("asof_ts") +: rightCols.map(col): _*)
    // null literals need the exact struct types of the other side
    val rType = right.select(rStruct.as("__r")).schema("__r").dataType
    val lType =
      left.select(struct(lCols.map(col): _*).as("__l")).schema("__l").dataType
    val lSide = left.select(
      col(key).as("__k"), col(leftTs).cast("long").as("__ts"),
      lit(1).as("__side"),
      struct(lCols.map(col): _*).as("__l"), lit(null).cast(rType).as("__r"))
    val rSide = right.select(
      col(key).as("__k"), col(rightTs).cast("long").as("__ts"),
      lit(0).as("__side"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))
    // at equal ts the right row sorts first (side 0 < 1), making the
    // bound inclusive; right uniqueness per (key, ts) makes the order
    // total where it matters
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lSide.unionByName(rSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = tolerance match {
      case Some(tol) =>
        // null condition (no match at all) nulls through `when`
        matched.withColumn("__m",
          when(col("__ts") - col("__m.asof_ts") <= tol, col("__m")))
      case None => matched
    }
    bounded.select(col("__l.*") +: ("asof_ts" +: rightCols)
      .map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Interval (range) join: points (key, ts) into intervals
    * (key, (lo, hi]) — half-open on the left bound, inclusive on the
    * right. Inner join; returns intervals.* + points.* (minus the
    * shared key/bucket duplicates).
    *
    * Scale design: both sides get an integer bucket (`x div
    * bucketWidth`; an interval explodes to every bucket it overlaps),
    * so the join Spark sees is an EQUI join on (key, bucket) with the
    * interval predicate left as a residual filter. A point belongs to
    * exactly ONE bucket, so each (interval, point) match is produced
    * once — no post-join dedupe. Correct for any interval length;
    * size `bucketWidth` >= the longest interval so each interval
    * lands in at most 2 buckets (candidate inflation bounded at 2x).
    * Timestamps must be non-negative integers (epoch µs): `div`
    * truncates toward zero, which is floor only for non-negatives.
    */
  def rangeJoinBucketed(
      intervals: DataFrame,
      points: DataFrame,
      key: String,
      lo: String,
      hi: String,
      ts: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val clash = intervals.columns.toSet
      .intersect(points.columns.toSet) - key
    require(clash.isEmpty, s"non-key columns $clash appear on both sides")
    // integral `div`, not `/`: epoch-µs magnitudes (~1.7e15) are fine
    // in double, but ns or composite keys are not — keep it exact
    val iv = intervals.withColumn("__b", explode(sequence(
      expr(s"`$lo` div ${bucketWidth}L"), expr(s"`$hi` div ${bucketWidth}L"))))
    val pt = points.withColumn("__b", expr(s"`$ts` div ${bucketWidth}L"))
    iv.join(pt, Seq(key, "__b"))
      .filter(col(lo) < col(ts) && col(ts) <= col(hi))
      .drop("__b")
  }

  /** Brute-force as-of reference — O(n·m) per key, test oracle ONLY:
    * proves [[asOfJoin]]'s window formulation against the direct
    * "max right ts at or before left ts" semantics. */
  def asOfJoinBruteForce(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    val lowBound = tolerance
      .map(t => col(s"r.$rightTs") >= col(s"l.$leftTs") - t)
      .getOrElse(lit(true))
    val best = l.join(r,
        col(s"l.$key") === col(s"r.$key") &&
          col(s"r.$rightTs") <= col(s"l.$leftTs") && lowBound, "left")
      .groupBy(left.columns.map(c => col(s"l.$c")): _*)
      .agg(max(col(s"r.$rightTs")).as("asof_ts"))
    best.alias("b").join(r,
        col(s"b.$key") === col(s"r.$key") &&
          col("b.asof_ts") === col(s"r.$rightTs"), "left")
      .select(left.columns.map(c => col(s"b.$c")) ++
        (col("b.asof_ts").as("asof_ts") +:
          rightCols.map(c => col(s"r.$c").as(c))): _*)
  }
}
