package graft.maintain

import java.time.LocalDate

/** Tiered reingestion planning (util/helpers.py:1-27,
  * flickr_ingestion_workflow.py:33-46): a base date fans out into
  * day-shifted backfill dates — daily x n1, then every-2nd-day x n2,
  * etc. Pure driver-side plan generation (the execution is just
  * repeated idempotent J1 merges — SURVEY §2.10's late-data story).
  */
object Reingestion {

  /** helpers.get_reingestion_day_list_list: tiers of (step, count). */
  def dayShiftTiers(tiers: Seq[(Int, Int)]): Seq[Seq[Int]] = {
    var offset = 0
    tiers.map { case (step, count) =>
      val days = (1 to count).map(i => offset + step * i)
      offset = days.lastOption.getOrElse(offset)
      days
    }
  }

  /** The reference's production schedule: daily x 7, every 2nd day
    * x 12, every 4th x 20, every 8th x 24, every 16th x 24, every
    * 32nd x 16 (flickr_ingestion_workflow.py:33-46). */
  val flickrTiers: Seq[(Int, Int)] =
    Seq((1, 7), (2, 12), (4, 20), (8, 24), (16, 24), (32, 16))

  /** Expand a base date into its full backfill date list. */
  def reingestionDates(base: LocalDate, tiers: Seq[(Int, Int)] = flickrTiers)
      : Seq[LocalDate] =
    dayShiftTiers(tiers).flatten.map(d => base.minusDays(d.toLong))

  /** flickr.py:95-122: one UTC day split into 48 half-hour epoch
    * windows [(start, end)), as a Column over a date column — the
    * ingestion-window generator expressed with sequence/transform so
    * it can seed a per-window batch loop or an explode. */
  def halfHourWindows(dayStart: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val base = unix_timestamp(dayStart.cast("timestamp"))
    transform(sequence(lit(0), lit(47)), i =>
      struct((base + i.cast("long") * 1800L).as("win_start"),
        (base + (i.cast("long") + 1L) * 1800L).as("win_end")))
  }
}
