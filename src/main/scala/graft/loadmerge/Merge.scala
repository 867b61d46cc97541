package graft.loadmerge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The semantic heart of the reference: the loader's clean + dedupe +
  * upsert-merge path (util/loader/sql.py:155-316), re-expressed as a
  * join-based Spark pipeline.
  *
  * Scale notes: the merge is one full-outer shuffle join on
  * (provider, md5(foreign_identifier)) — the same hash key the
  * reference uses to keep 3000-char foreign ids cheap to compare
  * (sql.py:80-94,248). At 100 TB both sides hash-partition on the key;
  * there is no driver-side state and no per-row RPC. Bucketing the
  * canonical table by the same key turns repeated loads into
  * shuffle-free joins on the target side.
  */
object Merge {

  /** Column roles for a merge, mirroring upsert_records_to_image_table
    * (util/loader/sql.py:185-271). */
  final case class MergeSpec(
      provider: String,
      foreignId: String,
      scalarCols: Seq[String],
      mapCols: Seq[String] = Nil,
      arrayCols: Seq[String] = Nil,
      createdOn: Option[String] = None,
      updatedOn: Option[String] = None,
      lastSynced: Option[String] = None,
      removed: Option[String] = None,
      // Join on the raw foreign id instead of md5(foreign id). Same
      // result set (md5 equality == fid equality for the loader's
      // bounded ids); the raw key is what lets a table BUCKETED BY
      // (provider, fid) merge without shuffling the big side — a
      // derived md5 key would discard the bucketing. The md5 default
      // mirrors the reference's functional index (sql.py:251).
      joinOnRawKey: Boolean = false,
  )

  /** Postgres `jsonb_strip_nulls(old) || jsonb_strip_nulls(new)` with
    * COALESCE fallbacks (sql.py:194-204): strip null-valued keys from
    * BOTH sides first (so a null in the new map cannot erase an old
    * value), then new wins per key. Null-safe on either side. */
  def mergeJsonbObjects(oldMap: Column, newMap: Column): Column = {
    def strip(m: Column): Column = map_filter(m, (_, v) => v.isNotNull)
    when(oldMap.isNotNull && newMap.isNotNull,
      map_zip_with(strip(oldMap), strip(newMap), (_, o, n) => coalesce(n, o)))
      .otherwise(coalesce(newMap, oldMap))
  }

  /** Postgres `jsonb_agg(DISTINCT x) FROM jsonb_array_elements(old ||
    * new)` with COALESCE fallbacks (sql.py:206-214): union-distinct
    * when both sides exist (Postgres `||` is null-propagating), else
    * whichever side is non-null. We canonicalize with array_sort —
    * jsonb_agg(DISTINCT) also emits in canonical order (SURVEY §7.4.1).
    */
  def mergeJsonbArrays(oldArr: Column, newArr: Column): Column =
    when(oldArr.isNotNull && newArr.isNotNull,
      array_sort(array_distinct(concat(oldArr, newArr))))
      .otherwise(coalesce(newArr, oldArr))

  /** J1: INSERT ... ON CONFLICT (provider, md5(foreign_id)) DO UPDATE
    * (sql.py:243-271) as a single full-outer join:
    *   - unmatched source rows  = the INSERT half (anti-join side)
    *   - matched rows           = DO UPDATE with per-column rules
    *   - unmatched target rows  = untouched
    * Scalars take COALESCE(new, old) ("newest non-null"); maps/arrays
    * take the jsonb merge rules above; bookkeeping timestamps follow
    * sql.py:248-252 (updated_on/last_synced stamped, created_on kept,
    * removed reset to false on any touch).
    */
  def upsertMerge(
      target: DataFrame,
      source: DataFrame,
      spec: MergeSpec,
      now: Column = current_timestamp()): DataFrame = {
    val t = target.alias("old")
    val s = source.alias("new")
    val fidEq =
      if (spec.joinOnRawKey)
        col(s"old.${spec.foreignId}") === col(s"new.${spec.foreignId}")
      else
        md5(col(s"old.${spec.foreignId}")) === md5(col(s"new.${spec.foreignId}"))
    val joinCond =
      col(s"old.${spec.provider}") === col(s"new.${spec.provider}") && fidEq
    val joined = t.join(s, joinCond, "full_outer")

    val sourcePresent = col(s"new.${spec.foreignId}").isNotNull
    val targetPresent = col(s"old.${spec.foreignId}").isNotNull

    def oldC(c: String) = col(s"old.$c")
    def newC(c: String) = col(s"new.$c")

    val keyCols = Seq(spec.provider, spec.foreignId).map(c =>
      coalesce(newC(c), oldC(c)).as(c))
    val scalarCols = spec.scalarCols.map(c => coalesce(newC(c), oldC(c)).as(c))
    val mapCols = spec.mapCols.map(c =>
      when(targetPresent && sourcePresent, mergeJsonbObjects(oldC(c), newC(c)))
        .when(sourcePresent, newC(c)).otherwise(oldC(c)).as(c))
    val arrayCols = spec.arrayCols.map(c =>
      when(targetPresent && sourcePresent, mergeJsonbArrays(oldC(c), newC(c)))
        .when(sourcePresent, newC(c)).otherwise(oldC(c)).as(c))
    val created = spec.createdOn.map(c =>
      when(targetPresent, oldC(c)).otherwise(now).as(c))
    val updated = spec.updatedOn.map(c =>
      when(sourcePresent, now).otherwise(oldC(c)).as(c))
    val synced = spec.lastSynced.map(c =>
      when(sourcePresent, now).otherwise(oldC(c)).as(c))
    val removed = spec.removed.map(c =>
      when(sourcePresent, lit(false)).otherwise(oldC(c)).as(c))

    joined.select(
      keyCols ++ created ++ updated ++ synced ++ removed ++
        scalarCols ++ mapCols ++ arrayCols: _*)
  }

  /** J2: overwrite-update (sql.py:274-316) — matched rows take ALL
    * source data columns verbatim (no null-protection), dates are
    * kept; source-only rows are NOT inserted (it is an UPDATE). */
  def overwriteUpdate(
      target: DataFrame,
      source: DataFrame,
      spec: MergeSpec): DataFrame = {
    val t = target.alias("old")
    val s = source.alias("new")
    val joinCond =
      col(s"old.${spec.provider}") === col(s"new.${spec.provider}") &&
        md5(col(s"old.${spec.foreignId}")) === md5(col(s"new.${spec.foreignId}"))
    val joined = t.join(s, joinCond, "left_outer")
    val sourcePresent = col(s"new.${spec.foreignId}").isNotNull
    val dataCols = spec.scalarCols ++ spec.mapCols ++ spec.arrayCols
    val outCols =
      Seq(spec.provider, spec.foreignId).map(c => col(s"old.$c").as(c)) ++
        (spec.createdOn ++ spec.updatedOn ++ spec.lastSynced ++ spec.removed)
          .map(c => col(s"old.$c").as(c)) ++
        dataCols.map(c =>
          when(sourcePresent, col(s"new.$c")).otherwise(col(s"old.$c")).as(c))
    joined.select(outCols: _*)
  }

  /** D3: ctid-ordered dedupe (sql.py:171-182) — the reference keeps
    * the LAST physically-loaded row per (provider, foreign_id); here
    * the load order is an explicit column and a row_number window
    * keeps the top row per key. */
  def dedupeLastWins(
      df: DataFrame,
      provider: String,
      foreignId: String,
      loadOrder: String): DataFrame = {
    val w = Window.partitionBy(col(provider), col(foreignId))
      .orderBy(col(loadOrder).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** P7: required-field row drop (sql.py:155-170 deletes null
    * url/license/landing_url/foreign_id rows before merging). */
  def dropRequiredNull(df: DataFrame, required: Seq[String]): DataFrame =
    df.na.drop(required)

  /** J7/A6: the migration replay
    * (openledger_sql/02_migrate_to_new_image.sql:4-25) — the reference
    * loops 12 row_number buckets in updated_on order so later
    * non-nulls win per column. One windowed pass gives the same
    * result: per (provider, foreign_id), each scalar column takes its
    * LAST non-null value in updated_on order, updated_on takes the
    * max. No 12-pass loop, one shuffle. */
  def replayNewestNonNull(
      df: DataFrame,
      provider: String,
      foreignId: String,
      orderCol: String,
      valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(provider), col(foreignId))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val collapsed = valueCols.map(c =>
      last(col(c), ignoreNulls = true).over(w).as(c))
    val newest = max(col(orderCol)).over(w).as(orderCol)
    df.select(col(provider) +: col(foreignId) +: newest +: collapsed: _*)
      .dropDuplicates(provider, foreignId)
  }
}
