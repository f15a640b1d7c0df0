package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar gap finder (reference: agrobr `cache/duckdb_store.py:463-491`
  * + `cepea/api.py:124-133`): expected business days between the observed
  * min/max date, anti-joined against the dates actually present. Drives
  * incremental fetch. The calendar is generated relationally per key
  * (`sequence` on the per-key bounds row + explode) — no driver-side
  * loops, and the anti-join probe side is the distinct-date set, not the
  * fact table, so the whole operator is two key-sized shuffles at any
  * scale.
  */
object Gaps {

  /** Missing business days per key (no keys = one global series). */
  def missingBusinessDays(df: DataFrame, dateCol: Column,
      keys: Seq[String] = Seq.empty): DataFrame = {
    val kc = keys.map(col)
    val dates = df.select(kc :+ dateCol.cast("date").as("d"): _*).distinct()
    val bounds = if (keys.isEmpty) dates.agg(min(col("d")).as("mn"), max(col("d")).as("mx"))
      else dates.groupBy(kc: _*).agg(min(col("d")).as("mn"), max(col("d")).as("mx"))
    val calendar = bounds
      .select(kc :+ explode(expr("sequence(mn, mx, interval 1 day)")).as("d"): _*)
      .filter(!dayofweek(col("d")).isin(1, 7)) // 1=Sun, 7=Sat
    calendar.join(dates, keys :+ "d", "left_anti")
      .orderBy(kc :+ col("d"): _*)
  }
}
