package graft.store

import java.time.{DayOfWeek, LocalDate}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D3 — the reference's flagship lifecycle (`cepea/api.py:96-226`):
  * serve from the fact table, but if any of the trailing
  * `windowDays` business days is missing, fetch JUST those dates and
  * MERGE them in, then serve the merged view.
  *
  * Scale shape: the staleness probe only scans the trailing window
  * (predicate pushed to the fact scan), the fetch is bounded by
  * `windowDays`, and the merge is the S8 upsert (anti-join + union,
  * update side broadcast-small). The driver-side date set is at most
  * `windowDays` elements — never data rows.
  */
object CacheFirst {

  /** Trailing business days (Mon-Fri), newest first. */
  def trailingBusinessDays(asOf: LocalDate, n: Int): Seq[LocalDate] =
    Iterator.iterate(asOf)(_.minusDays(1))
      .filter(d => d.getDayOfWeek != DayOfWeek.SATURDAY &&
        d.getDayOfWeek != DayOfWeek.SUNDAY)
      .take(n).toSeq

  /** @param fetch called with the missing dates only; returns rows to
    *              merge (None = source down → serve stale cache as-is,
    *              the reference's stale-fallback-with-warning path)
    * @return (servable DataFrame, dates that were fetched)
    */
  def readThrough(
      fact: DataFrame,
      pk: Seq[String],
      dateCol: String,
      asOf: LocalDate,
      windowDays: Int,
      fetch: Seq[LocalDate] => Option[DataFrame]): (DataFrame, Seq[LocalDate]) = {

    val expected = trailingBusinessDays(asOf, windowDays)
    val lo = expected.last
    // probe only the trailing window — pushed predicate, tiny result
    val present = fact
      .filter(col(dateCol).between(lit(lo.toString).cast("date"),
        lit(asOf.toString).cast("date")))
      .select(col(dateCol).cast("date")).distinct()
      .collect().map(_.getDate(0).toLocalDate).toSet
    val missing = expected.filterNot(present)

    if (missing.isEmpty) (fact, Seq.empty)
    else fetch(missing) match {
      case Some(updates) => (Store.upsert(fact, updates, pk), missing)
      case None => (fact, Seq.empty) // stale fallback
    }
  }
}
