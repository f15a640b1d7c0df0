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
        .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("pt"))
      val windows = load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("win_id"), col("user_id"),
          (epochUs(col("ts")) - hourUs).as("lo"),
          (epochUs(col("ts")) + hourUs).as("hi"))
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

  /** Linear time interpolation of a sparse series (the gap-FILL beside
    * q37's carry-FORWARD): null points get
    * prev + (next-prev) · (t-t_prev)/(t_next-t_prev) between their
    * bracketing non-null neighbors, one window shuffle on the key.
    * Edges (no prev / no next) stay null — interpolation, not
    * extrapolation. Epoch-millis integers feed the ratio so both
    * engines divide identical inputs.
    */
  val q41 = Q("q41_interpolate",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val prec = base.rowsBetween(Window.unboundedPreceding, -1)
      val foll = base.rowsBetween(1, Window.unboundedFollowing)
      load(s, dir, "events")
        .filter(col("user_id") < 20)
        .withColumn("v_sparse", when(col("value") >= 5.0, col("value")))
        .withColumn("pv", last(col("v_sparse"), ignoreNulls = true).over(prec))
        .withColumn("pt", last(when(col("v_sparse").isNotNull,
          epochMs(col("ts"))), ignoreNulls = true).over(prec))
        .withColumn("nv", first(col("v_sparse"), ignoreNulls = true).over(foll))
        .withColumn("nt", first(when(col("v_sparse").isNotNull,
          epochMs(col("ts"))), ignoreNulls = true).over(foll))
        .withColumn("v_interp", round(coalesce(col("v_sparse"),
          col("pv") + (col("nv") - col("pv")) *
            (epochMs(col("ts")) - col("pt")) / (col("nt") - col("pt"))), 6))
        .select(col("event_id"), col("user_id"), col("v_sparse"), col("v_interp"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, v_sparse,
        ROUND(COALESCE(v_sparse,
          pv + (nv - pv) * (epoch_ms(ts) - pt) / (nt - pt)), 6) AS v_interp
      FROM (
        SELECT event_id, user_id, ts, v_sparse,
          LAST_VALUE(v_sparse IGNORE NULLS) OVER prec AS pv,
          LAST_VALUE(CASE WHEN v_sparse IS NOT NULL THEN epoch_ms(ts) END IGNORE NULLS)
            OVER prec AS pt,
          FIRST_VALUE(v_sparse IGNORE NULLS) OVER foll AS nv,
          FIRST_VALUE(CASE WHEN v_sparse IS NOT NULL THEN epoch_ms(ts) END IGNORE NULLS)
            OVER foll AS nt
        FROM (SELECT *, CASE WHEN value >= 5.0 THEN value END AS v_sparse
              FROM events WHERE user_id < 20) t
        WINDOW
          prec AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          foll AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)) x
      ORDER BY user_id, event_id"""))

  /** RANGE-frame rolling window (the frame family q37/q36's ROWS
    * frames don't cover): per-user 3-day trailing event sum keyed on
    * event-TIME, so irregular sampling is handled by the frame, not by
    * resampling. Epoch-millis ordering keys make the two engines'
    * frames bound identically; DECIMAL partials keep the sums exact.
    */
  val q42 = Q("q42_rolling_range_window",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val threeDaysMs = 3L * 86400L * 1000L
      val w = Window.partitionBy(col("user_id")).orderBy(epochMs(col("ts")))
        .rangeBetween(-threeDaysMs, 0)
      load(s, dir, "events")
        .filter(col("user_id") < 50)
        .withColumn("n_3d", count(lit(1)).over(w))
        .withColumn("sum_3d", sum(dec(col("value"))).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("n_3d"), col("sum_3d"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT event_id, user_id,
        COUNT(*) OVER w AS n_3d,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_3d
      FROM events WHERE user_id < 50
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
                   RANGE BETWEEN 259200000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id"""))

  /** Temporal dimension join: every order priced against the CUSTOMER
    * DIM VERSION valid at its order date (the query every SCD2 table —
    * s05's output shape — exists to answer). Composed as an as-of join
    * on (custkey, valid_from) instead of the textbook
    * `BETWEEN valid_from AND valid_to` inequality join, which Spark
    * would execute as a per-key product; the union-window form is one
    * shuffle, O(n log n) per key. Two inline versions: base balance
    * from 1990, every 10th key revalued +100 from mid-1996 — so orders
    * straddle the version boundary.
    */
  val q48 = Q("q48_temporal_dim_join",
    (s, dir) => {
      val cust = load(s, dir, "customer")
      val v1 = cust.select(col("c_custkey").as("o_custkey"),
        to_timestamp(lit("1990-01-01")).as("o_orderdate"),
        col("c_acctbal").as("bal_at_order"))
      val v2 = cust.filter(pmod(col("c_custkey"), lit(10)) === 0)
        .select(col("c_custkey").as("o_custkey"),
          to_timestamp(lit("1996-06-15")).as("o_orderdate"),
          (col("c_acctbal") + 100.0).as("bal_at_order"))
      val probe = load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      Tp.asofJoin(probe, v1.unionByName(v2), Seq("o_custkey"),
          "o_orderdate", "bal_at_order")
        .withColumn("o_orderdate", col("o_orderdate").cast("date"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      WITH dim AS (
        SELECT c_custkey AS cust, TIMESTAMP '1990-01-01' AS vfrom,
               c_acctbal AS bal_at_order
        FROM customer
        UNION ALL
        SELECT c_custkey, TIMESTAMP '1996-06-15', c_acctbal + 100.0
        FROM customer WHERE c_custkey % 10 = 0)
      SELECT o.o_orderkey, o.o_custkey,
             CAST(o.o_orderdate AS DATE) AS o_orderdate, d.bal_at_order
      FROM orders o ASOF LEFT JOIN dim d
        ON o.o_custkey = d.cust AND o.o_orderdate >= d.vfrom
      ORDER BY o_orderkey"""))

  /** q30 with a 2-hour STALENESS bound
    * ([[graft.ops.Temporal.asofJoinTolerance]]): a purchase older than
    * 2 h at the event's timestamp no longer counts as "recent" — the
    * merge_asof(tolerance=...) shape. Oracle: DuckDB ASOF join, then
    * the same staleness filter on the matched build timestamp.
    */
  val q53 = Q("q53_asof_tolerance",
    (s, dir) => {
      val ev = load(s, dir, "events")
      val probe = ev.select(col("event_id"), col("user_id"), col("ts"))
      val build = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("recent_purchase_value"))
      Tp.asofJoinTolerance(probe, build, Seq("user_id"), "ts",
          "recent_purchase_value", toleranceMs = 2L * 3600 * 1000)
        .orderBy(col("event_id"))
    },
    Some("""
      WITH build AS (
        SELECT user_id, ts, MAX(value) AS recent_purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT e.event_id, e.user_id, e.ts,
        CASE WHEN b.ts IS NOT NULL
              AND epoch_ms(e.ts) - epoch_ms(b.ts) <= 7200000
             THEN b.recent_purchase_value END AS recent_purchase_value
      FROM events e ASOF LEFT JOIN build b
        ON e.user_id = b.user_id AND e.ts >= b.ts
      ORDER BY e.event_id"""))

  /** Exponentially-weighted moving average per user — the recursive
    * smoother (x_t = α·v_t + (1−α)·x_{t−1}) that NO window frame
    * expresses: it needs an ordered FOLD, here `aggregate` over the
    * time-sorted value array (codegen lambda, no UDF). Both engines
    * fold left in the identical order with identical double ops
    * (DuckDB `list_reduce` seeds with the first element; the Spark
    * fold mirrors that exactly), so the result is bit-reproducible and
    * fully oracle-checked. Per-user state is one bounded array —
    * sessionization's memory contract; at 100 TB this shape holds as
    * long as per-key series stay bounded (they do: ≤ ~100 events/user
    * here), the same caveat the streaming twin documents.
    */
  val q55 = Q("q55_ewma",
    (s, dir) => {
      load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(array_sort(collect_list(
          struct(col("ts"), col("event_id"), col("value")))).as("seq"))
        .select(col("user_id"),
          size(col("seq")).cast("long").as("n_events"),
          transform(col("seq"), x => x.getField("value")).as("vals"))
        .select(col("user_id"), col("n_events"),
          round(aggregate(
            expr("slice(vals, 2, size(vals) - 1)"),
            element_at(col("vals"), 1),
            (acc, x) => lit(0.3) * x + lit(0.7) * acc), 6).as("ewma"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
        ROUND(list_reduce(vals, (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma
      FROM (SELECT user_id, list(value ORDER BY ts, event_id) AS vals
            FROM events GROUP BY 1) t
      ORDER BY user_id"""))

  /** OHLC bar resampling — the price-series operator the reference's
    * whole domain revolves around (daily CEPEA indicator → monthly
    * candles): per (event_type, day) open/high/low/close/volume in ONE
    * aggregation pass. Open/close are `min(struct(ts, event_id,
    * value))`-style lexicographic extremes — the unique (ts, event_id)
    * prefix makes first/last deterministic on any engine, where a bare
    * min_by/arg_min would tie-break arbitrarily. No window, no
    * self-join: the shuffle carries one row per bar.
    */
  val q67 = Q("q67_ohlc_bars",
    (s, dir) => {
      load(s, dir, "events")
        .select(col("event_type"),
          to_date(col("ts")).as("day"),
          epochUs(col("ts")).as("tu"), col("event_id"), col("value"))
        .groupBy(col("event_type"), col("day"))
        .agg(
          min(struct(col("tu"), col("event_id"), col("value")))
            .getField("value").as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(struct(col("tu"), col("event_id"), col("value")))
            .getField("value").as("close"),
          count(lit(1)).as("n"),
          dsum(col("value")).as("volume"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""
      WITH e AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               epoch_us(ts) AS tu, event_id, value
        FROM events),
      r AS (
        SELECT *,
          ROW_NUMBER() OVER (PARTITION BY event_type, day
                             ORDER BY tu, event_id) AS rn_a,
          ROW_NUMBER() OVER (PARTITION BY event_type, day
                             ORDER BY tu DESC, event_id DESC) AS rn_d
        FROM e)
      SELECT event_type, day,
        MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
        MAX(value) AS high, MIN(value) AS low,
        MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS volume
      FROM r GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Time-weighted average (TWAP): each observation weighted by how
    * long it was the live value (interval to the next observation,
    * last one excluded — no weight without a successor). Integer
    * microsecond gaps × DECIMAL prices keep the weighted sum exact and
    * engine-order-independent; one lead window per key, one
    * aggregation. The honest average for irregularly-sampled price
    * series, where a plain mean over-weights bursts.
    */
  val q68 = Q("q68_twap",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("tu"), col("event_id"))
      load(s, dir, "events")
        .select(col("event_type"), epochUs(col("ts")).as("tu"),
          col("event_id"), col("value"))
        .withColumn("nxt", lead(col("tu"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .withColumn("dt", col("nxt") - col("tu"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dt")).as("span_us"),
          round((sum(dec(col("value")) * col("dt")).cast("double") /
            sum(col("dt"))), 6).as("twap"),
          round(davg(col("value")), 6).as("plain_mean"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (
        SELECT event_type, epoch_us(ts) AS tu, event_id, value FROM events),
      g AS (
        SELECT event_type, value,
          LEAD(tu) OVER (PARTITION BY event_type ORDER BY tu, event_id) - tu
            AS dt
        FROM e)
      SELECT event_type, COUNT(*) AS n_intervals,
        CAST(SUM(dt) AS BIGINT) AS span_us,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4)) * dt) AS DOUBLE)
          / CAST(SUM(dt) AS DOUBLE), 6) AS twap,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(value), 6)
          AS plain_mean
      FROM g WHERE dt IS NOT NULL
      GROUP BY 1 ORDER BY 1"""))

  def qs: Seq[Q] = Seq(q30, q31, q41, q42, q48, q53, q55, q67, q68)
}
