package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.T._
import graft.ops.{Temporal => Tp}

/** Temporal-join family over `events` (builder brief: "as-of join,
  * range join" — the canonical operators Spark lacks natively). Both
  * are oracle-checked: DuckDB ships a native ASOF JOIN and executes the
  * raw inequality range join directly, so the engine's union-window /
  * binned compositions are verified against first-principles semantics.
  */
object Temporal {

  /** As-of join: every event annotated with the SAME USER's most recent
    * purchase value at-or-before the event's timestamp (null if none).
    * Build side pre-aggregated to one row per (user, ts) so ties are
    * deterministic on both engines.
    */
  val q30 = Q("q30_asof_join",
    (s, dir) => {
      val ev = load(s, dir, "events")
      val probe = ev.select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val build = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("last_purchase_value"))
      Tp.asofJoin(probe, build, Seq("user_id"), "ts", "last_purchase_value")
        .orderBy(col("event_id"))
    },
    Some("""
      WITH build AS (
        SELECT user_id, ts, MAX(value) AS last_purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT e.event_id, e.user_id, e.ts, e.event_type, b.last_purchase_value
      FROM events e ASOF LEFT JOIN build b
        ON e.user_id = b.user_id AND e.ts >= b.ts
      ORDER BY e.event_id"""),
    bench = true)

  /** Range join: per purchase, how many of the same user's events fall
    * inside ±1 h of it — binned to 1 h epoch-microsecond buckets, exact
    * predicate after the bucket equi-join. The oracle runs the raw
    * inequality join.
    */
  val q31 = Q("q31_range_join",
    (s, dir) => {
      val hourUs = 3600L * 1000000L
      val ev = load(s, dir, "events")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("pt"))
      val windows = load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("win_id"), col("user_id"),
          (unix_micros(col("ts")) - hourUs).as("lo"),
          (unix_micros(col("ts")) + hourUs).as("hi"))
      Tp.rangeJoinBinned(windows, ev, Seq("user_id"), "pt", "lo", "hi", hourUs)
        .groupBy(col("win_id"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("win_id"))
    },
    Some("""
      WITH w AS (
        SELECT event_id AS win_id, user_id,
               epoch_us(ts) - 3600000000 AS lo, epoch_us(ts) + 3600000000 AS hi
        FROM events WHERE event_type = 'purchase'),
      e AS (SELECT user_id, epoch_us(ts) AS pt FROM events)
      SELECT w.win_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM w JOIN e ON e.user_id = w.user_id AND e.pt BETWEEN w.lo AND w.hi
      GROUP BY 1 ORDER BY 1"""),
    bench = true)

  def qs: Seq[Q] = Seq(q30, q31)
}
