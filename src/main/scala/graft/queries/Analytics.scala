package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.T._

/** Event-analytics staples over `events`: ordered funnels and cohort
  * retention — the product-analytics shapes a warehouse engine is
  * expected to answer directly. Both reduce to keyed conditional
  * aggregations and joins of per-user rows (never event×event
  * products), so the shuffles carry user-level aggregates only.
  */
object Analytics {

  /** Ordered funnel signup → view → purchase: each stage's timestamp
    * must follow the previous stage's. Three conditional-min passes;
    * the join sides after stage 1 are per-user single rows (broadcast
    * or map-side under AQE). Strictly-after semantics keep ties out of
    * the funnel on both engines.
    */
  val q43 = Q("q43_funnel",
    (s, dir) => {
      val ev = load(s, dir, "events")
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = ev.filter(col("event_type") === "view")
        .join(s1, Seq("user_id"))
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, Seq("user_id"))
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      s1.select(count(lit(1)).as("n_signup"))
        .crossJoin(s2.select(count(lit(1)).as("n_view_after")))
        .crossJoin(s3.select(count(lit(1)).as("n_purchase_after")))
    },
    Some("""
      WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        JOIN s1 USING (user_id)
        WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
      s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
             (SELECT COUNT(*) FROM s2) AS n_view_after,
             (SELECT COUNT(*) FROM s3) AS n_purchase_after"""))

  /** Cohort retention: users grouped by first-seen ISO week, counted
    * as active in each subsequent week — the (cohort, weeks_since)
    * matrix. Two aggregations over (user, week) distinct pairs; the
    * cohort table is one row per user.
    */
  val q44 = Q("q44_cohort_retention",
    (s, dir) => {
      val ev = load(s, dir, "events")
      val cohort = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
      val active = ev.select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk")).distinct()
      active.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("int").as("weeks_since"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("weeks_since"))
    },
    Some("""
      WITH cohort AS (
        SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY 1),
      active AS (
        SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS wk
        FROM events)
      SELECT cohort_week,
        CAST(date_diff('day', cohort_week, wk) / 7 AS INT) AS weeks_since,
        COUNT(DISTINCT user_id) AS n_users
      FROM active JOIN cohort USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Sliding (hopping) 6h/3h windows — q35's tumbling twin with
    * overlap: every event lands in exactly two windows. Spark's
    * `window(ts, len, slide)` expands map-side; the oracle derives the
    * same two epoch-aligned starts per event and re-groups.
    */
  val q45 = Q("q45_sliding_window",
    (s, dir) => {
      load(s, dir, "events")
        .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("w.start").as("bucket_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy(col("bucket_start"), col("event_type"))
    },
    Some("""
      WITH hits AS (
        SELECT CAST(TO_TIMESTAMP(FLOOR(EPOCH(ts) / 10800) * 10800) AS TIMESTAMP)
                 AS bucket_start, event_type, value
        FROM events
        UNION ALL
        SELECT CAST(TO_TIMESTAMP(FLOOR(EPOCH(ts) / 10800) * 10800 - 10800) AS TIMESTAMP),
               event_type, value
        FROM events)
      SELECT bucket_start, event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      FROM hits GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Winsorization: clip each group's values to its own exact
    * [p05, p95] band — the outlier treatment that keeps every row
    * (unlike v12's flagging) while bounding the damage any single
    * value can do to a mean; the standard numeric-feature step before
    * training. Percentile bounds are 6-dp-rounded before clipping so
    * both engines clamp with identical operands, and the clipped sum
    * goes through the exact-decimal path. One percentile pass, bounds
    * broadcast back, one clipped aggregation.
    */
  val q56 = Q("q56_winsorize",
    (s, dir) => {
      val ev = load(s, dir, "events").select(col("event_type"), col("value"))
      val bounds = ev.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.05)"), 6).as("lo"),
          round(expr("percentile(value, 0.95)"), 6).as("hi"))
      ev.join(broadcast(bounds), Seq("event_type"))
        .withColumn("w", least(greatest(col("value"), col("lo")), col("hi")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          first(col("lo")).as("lo"), first(col("hi")).as("hi"),
          sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_clipped_low"),
          sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_clipped_high"),
          dsum(col("w")).as("winsorized_sum"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH bounds AS (
        SELECT event_type,
          ROUND(quantile_cont(value, 0.05), 6) AS lo,
          ROUND(quantile_cont(value, 0.95), 6) AS hi
        FROM events GROUP BY 1)
      SELECT e.event_type, COUNT(*) AS n, MIN(b.lo) AS lo, MIN(b.hi) AS hi,
        CAST(SUM(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        CAST(SUM(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
        CAST(SUM(CAST(LEAST(GREATEST(e.value, b.lo), b.hi) AS DECIMAL(18,4))) AS DOUBLE)
          AS winsorized_sum
      FROM events e JOIN bounds b USING (event_type)
      GROUP BY 1 ORDER BY 1"""))

  def qs: Seq[Q] = Seq(q43, q44, q45, q56)
}
