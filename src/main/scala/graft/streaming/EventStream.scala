package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface.
  *
  * The reference has no streaming engine — its incremental semantics
  * are micro-batched windows + idempotent upserts (SURVEY §2.10). We
  * still expose the two streaming shapes a training-data pipeline
  * needs: watermarked tumbling-window aggregation (the reference's
  * half-hour ingestion windows, flickr.py:95-122, as true event-time
  * windows) and stateful streaming dedupe (the D-family as a stream).
  */
object EventStream {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Tumbling 30-minute event-time windows with a late-data
    * watermark; emits (window_start, event_type, n, val_sum). */
  def windowedCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("val_sum"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("val_sum"))

  /** Stream-static enrichment: join the event stream against a static
    * dimension on `user_id = dimKey`, then count per (30-minute
    * window, dim attribute). Stream-static equi-joins are STATELESS —
    * with the dim broadcast, enrichment is a map-side operation on
    * every micro-batch and only the windowed aggregate keeps state.
    * This is the streaming form of the J3/J5 dim-lookup family. */
  def enrichedWindowedCounts(
      events: DataFrame,
      dim: DataFrame,
      dimKey: String,
      dimAttr: String,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim), col("user_id") === col(dimKey))
      .groupBy(window(col("ts"), "30 minutes"), col(dimAttr))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col(dimAttr), col("n"))

  /** Stateful exact dedupe on a key column: first occurrence passes,
    * repeats are dropped — flatMapGroupsWithState with a per-key seen
    * bit. At production scale the state is bounded with a timeout
    * (GroupStateTimeout.ProcessingTimeTimeout + setTimeoutDuration);
    * here NoTimeout keeps micro-batches purely data-driven, since
    * timeout evaluation spins empty batches on an always-available
    * local trigger. */
  def streamingDedupe(events: Dataset[Event]): Dataset[Event] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_id)
      .flatMapGroupsWithState[Boolean, Event](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[Event], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          }
      }
  }

  /** Event-time-bounded dedupe via the engine-native
    * `dropDuplicatesWithinWatermark` (Spark >= 3.5): duplicates whose
    * event times fall within the watermark delay of the first-seen row
    * are dropped, and the state store evicts entries the moment the
    * watermark passes them — bounded state with no custom
    * flatMapGroupsWithState code and no processing-time clock.
    * Complements the TTL overload below: choose THIS when duplicates
    * cluster in event time (publisher retries, replayed partitions),
    * the TTL form when they cluster in arrival time. */
  def watermarkDedupe(
      events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming session windows: the engine-native
    * `session_window(ts, gap)` + watermark — the streaming
    * counterpart of [[sessionize]]. A session closes (and emits, in
    * Append mode) once the watermark passes its end; state per open
    * session is bounded by the watermark exactly like windowed
    * aggregation state. Emits one row per (closed session, user). */
  def streamingSessions(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("val_sum"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"),
        col("n_events"), col("val_sum"))

  /** Batch sessionization: split each user's event stream into
    * sessions separated by more than `gapMinutes` of inactivity, and
    * aggregate one row per session. The batch counterpart of a
    * session window (the streaming form is
    * `session_window(ts, gap)` + watermark).
    *
    * Scale shape: ONE shuffle on user_id; the session id is a running
    * sum of new-session markers inside each user partition (lag +
    * sum window over the same partitioning — Catalyst plans a single
    * Exchange for both windows and the final aggregate re-uses it via
    * partial aggregation). No skew exposure beyond a genuinely
    * hyperactive user, which a gap-session by definition bounds in
    * session count. */
  def sessionize(
      events: DataFrame,
      gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val prev = lag(col("ts"), 1).over(byUser)
    val newSession = when(prev.isNull ||
      col("ts").cast("long") - prev.cast("long") > gapMinutes * 60L, 1L)
      .otherwise(0L)
    events
      .withColumn("session_seq",
        sum(newSession).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("t_start"), max(col("ts")).as("t_end"))
  }

  /** Streaming admission against a static digest index — the
    * streaming face of `graft.dedup.Dedup.incrementalExactDedup`:
    * documents arriving on a stream are dropped when their
    * whitespace-normalized content digest already exists in the
    * static index (stream-static LEFT ANTI join — STATELESS, the
    * index is broadcast and probed per micro-batch), then
    * first-within-the-stream wins via
    * `dropDuplicatesWithinWatermark` on the digest (state bounded by
    * the watermark, exactly like [[watermarkDedupe]]).
    *
    * `docs` must carry `ts` (event time) and `textCol`;
    * `indexDigests` is `Dedup.contentDigests` output (or any frame
    * with a `digest` column). The emitted rows carry their digest —
    * append them to the index between restarts and the next run's
    * static side covers this run's admissions (within a run, the
    * watermark dedupe already suppresses re-arrivals). */
  def streamingAdmission(
      docs: DataFrame,
      indexDigests: DataFrame,
      textCol: String = "text",
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("digest",
        md5(trim(regexp_replace(col(textCol), "\\s+", " "))))
      .join(broadcast(indexDigests.select(col("digest"))),
        Seq("digest"), "left_anti")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("digest")

  /** STREAM-STREAM interval join: match each left event to the right
    * events of the same user within `within` of event time (|ts_l -
    * ts_r| <= within) — the clicks-to-impressions shape. Both sides
    * carry watermarks and the join condition bounds event time in BOTH
    * directions, which is exactly what lets Spark evict buffered rows:
    * each side's state holds only rows newer than (watermark -
    * within), so state is bounded by rate x (watermark + within), not
    * by stream length. Inner join: a row emits once its partner
    * arrives; unmatched rows simply age out.
    *
    * At cluster scale both sides hash-partition on user_id — one
    * co-partitioned exchange per side, the same shape as the batch
    * rangeJoinBucketed, with the state store playing the bucket
    * role.
    *
    * `joinType` "inner" (default) or "left_outer": the outer form
    * emits an unmatched left row WITH NULL right columns once the
    * watermark proves no partner can still arrive (l_ts + within
    * below the global watermark) — the same eviction that bounds the
    * state also makes the no-match verdict safe to declare. */
  def streamingIntervalJoin(
      left: DataFrame,
      right: DataFrame,
      within: String = "10 minutes",
      watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer")(joinType),
      s"joinType must be inner or left_outer, got $joinType")
    val l = left.select(col("event_id").as("l_id"), col("ts").as("l_ts"),
      col("user_id"), col("event_type").as("l_type"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("event_id").as("r_id"), col("ts").as("r_ts"),
      col("user_id"), col("event_type").as("r_type"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      l("user_id") === r("user_id") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $within") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"),
      joinType)
      .select(l("user_id"), col("l_id"), col("r_id"), col("l_ts"),
        col("r_ts"), col("l_type"), col("r_type"))
  }

  /** BOUNDED-state streaming dedupe: same first-occurrence-wins
    * semantics, but each key's seen-bit expires after `stateTTL` of
    * processing time with no arrivals (idle TTL — the timeout is
    * re-armed on every access, since Spark clears a group's timeout
    * whenever the function is invoked for it). This is the production
    * shape: the NoTimeout variant's state grows with every distinct
    * key ever seen, which at 100 TB/day of events is unbounded; with
    * a TTL the state size is bounded by the key arrival rate x TTL,
    * trading exactness for "dedupe within the TTL horizon" — the
    * standard trade, made explicit. After expiry the key is admitted
    * (and counted) again. */
  def streamingDedupe(events: Dataset[Event], stateTTL: String): Dataset[Event] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_id)
      .flatMapGroupsWithState[Boolean, Event](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (_: Long, rows: Iterator[Event], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            state.setTimeoutDuration(stateTTL)
            Iterator.empty
          } else {
            state.update(true)
            state.setTimeoutDuration(stateTTL)
            rows.take(1)
          }
      }
  }
}
