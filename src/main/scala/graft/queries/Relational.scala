package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.T._

/** Core relational operator inventory (SURVEY §2.2-§2.6): filters,
  * joins (incl. broadcast/semi/anti/full-outer mirror), hash aggregates,
  * rollup, windows (lag/gap/top-1), pivot/melt/union, dedup-by-key.
  * Scale notes are on each query: the join build sides that must be
  * broadcast at 100 TB are broadcast here; aggregations rely on
  * partial (map-side) aggregation; no driver-side collects.
  */
object Relational {

  /** TPC-H Q1-style pricing summary — partial agg + tiny shuffle (A1). */
  /** The oracle's `sum_disc_price` cast routes through VARCHAR because
    * DuckDB's DECIMAL(38,8)→DOUBLE converts scaled-int128 → double →
    * ÷1e8 (two roundings: the int128 exceeds 2^53), which is off by
    * one ulp for some sums — e.g. 2693383520.00590000 → …0.0059004.
    * Spark's cast (and DuckDB's VARCHAR→DOUBLE strtod) round correctly,
    * and the two exact DECIMAL sums are identical (verified digit by
    * digit at sf0.1/sf1.0); only the lossy final cast diverged.
    */
  val q01 = Q("q01_pricing_summary",
    (s, dir) => {
      val li = load(s, dir, "lineitem")
      li.filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    bench = true)

  /** P2 — date-range filter pushed to the parquet scan, in whichever
    * physical layout the events table shipped: under the µs layout the
    * range predicate is native TIMESTAMP_NTZ literals (pushable as-is —
    * the scan shows `PushedFilters: [GreaterThanOrEqual(ts,...)]`,
    * asserted in ApiSpec); under the legacy nanos layout it is applied
    * on the raw nanosecond longs BEFORE the timestamp conversion, which
    * a filter on the converted column would forfeit. Either way the
    * row-group min/max pruning fires.
    */
  val q02 = Q("q02_filter_daterange",
    (s, dir) => {
      val raw = loadEventsRaw(s, dir)
      val filtered = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.filter(col("ts") >= dateNanos("2024-01-10") &&
            col("ts") < dateNanos("2024-01-13"))
        case _ =>
          raw.filter(col("ts") >= lit("2024-01-10").cast("timestamp_ntz") &&
            col("ts") < lit("2024-01-13").cast("timestamp_ntz"))
      }
      normalizeEventTs(s, filtered)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          col("ts").cast("date").as("d"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, event_type, value, CAST(ts AS DATE) AS d
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-13'
      ORDER BY event_id"""))

  /** R2 — top-k by value with deterministic tie-break. */
  val q03 = Q("q03_topk_orders",
    (s, dir) => {
      load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""))

  /** J1 — 3-table join (fact ⋈ fact ⋈ dim). No broadcast hint on
    * customer: it is a scaling table (150k × sf in TPC-H), so a forced
    * broadcast OOMs at cluster scale; AQE picks broadcast-hash while the
    * table is small and shuffle-hash/SMJ once it isn't. Explicit
    * `broadcast()` is reserved for genuinely bounded dims (nation/region).
    */
  val q04 = Q("q04_join3_revenue",
    (s, dir) => {
      val li = load(s, dir, "lineitem")
      val o = load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val c = load(s, dir, "customer")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY c_custkey, c_name
      ORDER BY c_custkey"""),
    bench = true)

  /** J2 — trade-mirror with a zero-guarded ratio (reference
    * `comtrade/parser.py:88-155`). The naive shape is two fact scans +
    * full-outer join; this is the fused single-scan plan — one pass over
    * lineitem, conditional sums per side, identical output semantics
    * (a key missing on one side yields a null sum, exactly like the
    * outer join's null row). Halves the I/O and deletes the join — the
    * 100 TB-preferred shape.
    */
  val q05 = Q("q05_fullouter_mirror",
    (s, dir) => {
      val li = load(s, dir, "lineitem")
      li.filter(col("l_returnflag").isin("R", "A"))
        .groupBy(col("l_partkey"))
        .agg(
          sum(when(col("l_returnflag") === "R", dec(col("l_quantity"))))
            .cast("double").as("qty_r"),
          sum(when(col("l_returnflag") === "A", dec(col("l_quantity"))))
            .cast("double").as("qty_a"))
        .select(col("l_partkey"), col("qty_r"), col("qty_a"),
          when(col("qty_a").isNull || col("qty_a") === 0, lit(null).cast("double"))
            .otherwise(col("qty_r") / col("qty_a")).as("ratio"))
        .orderBy(col("l_partkey"))
    },
    Some("""
      SELECT COALESCE(l.l_partkey, r.l_partkey) AS l_partkey, qty_r, qty_a,
        CASE WHEN qty_a IS NULL OR qty_a = 0 THEN NULL ELSE qty_r / qty_a END AS ratio
      FROM
        (SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty_r
         FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey) l
      FULL OUTER JOIN
        (SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty_a
         FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_partkey) r
      ON l.l_partkey = r.l_partkey
      ORDER BY l_partkey"""),
    bench = true)

  /** Semi/anti joins (implicit in the reference's incremental appends —
    * SURVEY §2.3): parts never sold (anti) + count of parts sold (semi).
    */
  val q06 = Q("q06_anti_join",
    (s, dir) => {
      val p = load(s, dir, "part")
      // Existence test ⇒ reduce the build side to distinct keys first:
      // map-side partial agg shrinks the shuffle from the full fact to
      // |distinct l_partkey| — the difference between a full-fact
      // shuffle and a key-sized one at 100 TB.
      val soldKeys = load(s, dir, "lineitem").select(col("l_partkey")).distinct()
      p.join(soldKeys, col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey, p_name FROM part
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      ORDER BY p_partkey"""))

  /** W5 / P7 — latest-per-key dedup via row_number (deterministic,
    * unlike dropDuplicates): last order per customer.
    */
  val q07 = Q("q07_latest_per_key",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("last_order_date"), col("o_totalprice"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS last_order_date, o_totalprice
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) t
      WHERE rn = 1
      ORDER BY o_custkey"""),
    bench = true)

  /** W1/V3 — lag-based daily variation with anomaly flag (reference
    * `validators/semantic.py:144-181`). Partitioned per user: the whole
    * window computation shuffles once on user_id and scales linearly.
    */
  val q08 = Q("q08_lag_variation",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      load(s, dir, "events")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("variation_pct",
          when(col("prev_value").isNull || col("prev_value") === 0, lit(null).cast("double"))
            .otherwise((col("value") - col("prev_value")) / col("prev_value") * 100.0))
        .withColumn("anomaly", abs(col("variation_pct")) > 100.0)
        .filter(col("user_id") < 50)
        .select(col("event_id"), col("user_id"), col("value"), col("prev_value"),
          col("variation_pct"), col("anomaly"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, value, prev_value,
        CASE WHEN prev_value IS NULL OR prev_value = 0 THEN NULL
             ELSE (value - prev_value) / prev_value * 100.0 END AS variation_pct,
        CASE WHEN prev_value IS NULL OR prev_value = 0 THEN NULL
             ELSE ABS((value - prev_value) / prev_value * 100.0) > 100.0 END AS anomaly
      FROM (
        SELECT event_id, user_id, value, ts,
          LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        FROM events) t
      WHERE user_id < 50
      ORDER BY user_id, event_id"""),
    bench = true)

  /** W3 — date-gap detection per key (reference `validators/semantic.py:185-228`). */
  val q09 = Q("q09_date_gaps",
    (s, dir) => {
      val days = load(s, dir, "events")
        .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      days.withColumn("prev_d", lag(col("d"), 1).over(w))
        .withColumn("gap_days", datediff(col("d"), col("prev_d")).cast("long"))
        .filter(col("gap_days") > 2)
        .orderBy(col("user_id"), col("d"))
    },
    Some("""
      SELECT user_id, d, prev_d, CAST(d - prev_d AS BIGINT) AS gap_days
      FROM (
        SELECT user_id, d, LAG(d, 1) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
        FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events) x) t
      WHERE d - prev_d > 2
      ORDER BY user_id, d"""))

  /** A1 — monthly rollup (reference `comexstat/parser.py:108-130`). */
  val q10 = Q("q10_monthly_agg",
    (s, dir) => {
      load(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("ano"),
          month(col("o_orderdate")).cast("long").as("mes"))
        .agg(dsum(col("o_totalprice")).as("total"),
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy(col("ano"), col("mes"))
    },
    Some("""
      SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS ano, CAST(MONTH(o_orderdate) AS BIGINT) AS mes,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        COUNT(*) AS n_orders,
        COUNT(DISTINCT o_custkey) AS n_customers
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""),
    bench = true)

  /** A5/A6 — daily aggregation by type (reference `inmet/parser.py:94-151`:
    * pd.Grouper(freq='D') becomes a date_trunc group key).
    */
  val q11 = Q("q11_daily_by_type",
    (s, dir) => {
      load(s, dir, "events")
        .groupBy(col("ts").cast("date").as("d"), col("event_type"))
        .agg(davg(col("value")).as("mean_value"),
          max(col("value")).as("max_value"),
          min(col("value")).as("min_value"),
          dsum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("d"), col("event_type"))
    },
    Some("""
      SELECT CAST(ts AS DATE) AS d, event_type,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(value) AS mean_value,
        MAX(value) AS max_value, MIN(value) AS min_value,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** J3/R4/A12 — pivot long->wide with first/sum agg (reference
    * `ibge/api.py:151-168`): per-user event-type totals as columns.
    */
  val q13 = Q("q13_pivot_events",
    (s, dir) => {
      load(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(sum(dec(col("value"))).cast("double"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id,
        CAST(SUM(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS click,
        CAST(SUM(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS error,
        CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS purchase,
        CAST(SUM(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS signup,
        CAST(SUM(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS view
      FROM events GROUP BY user_id ORDER BY user_id"""),
    bench = true)

  /** R5 — melt wide->long via stack (reference `mapbiomas/parser.py:58-65`). */
  val q14 = Q("q14_melt_lineitem",
    (s, dir) => {
      load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice, " +
            "'discount', l_discount, 'tax', l_tax) AS (measure, val)"))
        // val completes the total order — scaled substrates carry
        // duplicate (l_orderkey, l_linenumber) pairs whose tie order
        // would otherwise be engine-dependent
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"), col("val"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber, measure, val FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val FROM lineitem WHERE l_orderkey < 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem WHERE l_orderkey < 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem WHERE l_orderkey < 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem WHERE l_orderkey < 1000) t
      ORDER BY l_orderkey, l_linenumber, measure, val"""))

  /** R3 — union of homogeneous frames by name (reference `ibge/api.py:265-285`). */
  val q15 = Q("q15_union_slices",
    (s, dir) => {
      val o = load(s, dir, "orders")
      val a = o.filter(year(col("o_orderdate")) === 1995)
      val b = o.filter(year(col("o_orderdate")) === 2000)
      a.unionByName(b)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          year(col("o_orderdate")).cast("long").as("ano"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice, CAST(YEAR(o_orderdate) AS BIGINT) AS ano
      FROM orders WHERE YEAR(o_orderdate) = 1995 OR YEAR(o_orderdate) = 2000
      ORDER BY o_orderkey"""))

  /** A4 — rollup in one pass (the reference computes its two rural-credit
    * rollups as separate scans; `cube/rollup` fuses them).
    */
  val q16 = Q("q16_rollup",
    (s, dir) => {
      load(s, dir, "orders")
        .rollup(year(col("o_orderdate")).cast("long").as("ano"), col("o_orderpriority"))
        .agg(dsum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
        .orderBy(col("ano").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },
    Some("""
      SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS ano, o_orderpriority,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total, COUNT(*) AS n
      FROM orders GROUP BY ROLLUP(1, 2)
      ORDER BY ano ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""))

  /** P4/S10 — as-of (snapshot) filter (reference `datasets/preco_diario.py:118-120`). */
  val q19 = Q("q19_asof_snapshot",
    (s, dir) => {
      load(s, dir, "orders")
        .filter(col("o_orderdate") <= lit("1997-06-30").cast("timestamp"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM orders WHERE o_orderdate <= TIMESTAMP '1997-06-30'
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** W6 — carry-forward (forward fill) via last(ignoreNulls) over an
    * unbounded-preceding frame (reference `b3/parser.py:76-88`).
    */
  val q37 = Q("q37_carry_forward",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      load(s, dir, "events")
        .withColumn("v_sparse", when(col("value") >= 5.0, col("value")))
        .withColumn("v_filled", last(col("v_sparse"), ignoreNulls = true).over(w))
        .filter(col("user_id") < 20)
        .select(col("event_id"), col("user_id"), col("v_sparse"), col("v_filled"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, v_sparse,
        LAST_VALUE(v_sparse IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
      FROM (SELECT *, CASE WHEN value >= 5.0 THEN value END AS v_sparse FROM events) t
      WHERE user_id < 20
      ORDER BY user_id, event_id"""))

  /** Sessionization done relationally: a session break is a >30 min gap;
    * session id = running count of breaks (single shuffle on user_id).
    */
  val q36 = Q("q36_sessionize",
    (s, dir) => {
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      load(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
        .withColumn("brk",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
        .filter(col("user_id") < 50)
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""
      SELECT user_id, session_id, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
      FROM (
        SELECT user_id, value,
          CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM (
          SELECT *, CASE WHEN prev_ts IS NULL OR EPOCH(ts) - EPOCH(prev_ts) > 1800
            THEN 1 ELSE 0 END AS brk
          FROM (
            SELECT *, LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events) a) b) c
      WHERE user_id < 50
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""),
    bench = true)

  /** q36's sessionizer through Spark's NATIVE session_window operator —
    * the same 30-min-gap sessions as one groupBy, no manual lag/cumsum.
    * The oracle derives sessions from first principles (lag + running
    * break sum), so this pins the native operator's exact merge
    * semantics: a gap of EXACTLY the threshold starts a new session
    * (session end = last ts + gap, merge requires ts strictly below
    * it) — one boundary off from q36's `>` convention, hence the `>=`
    * in this oracle. Window end = last event + gap is asserted too.
    */
  val q51 = Q("q51_session_window",
    (s, dir) => {
      load(s, dir, "events")
        .filter(col("user_id") < 50)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_start"))
    },
    Some("""
      WITH base AS (
        SELECT user_id, event_id, ts, value,
          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE user_id < 50),
      brk AS (
        SELECT user_id, event_id, ts, value,
          CASE WHEN prev_ts IS NULL OR EPOCH(ts) - EPOCH(prev_ts) >= 1800
            THEN 1 ELSE 0 END AS b
        FROM base),
      sess AS (
        SELECT user_id, ts, value,
          CAST(SUM(b) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        FROM brk)
      SELECT user_id, MIN(ts) AS session_start,
        MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, session_start"""))

  /** Tumbling-window (6h) event counts — the batch shape of the
    * Structured Streaming pipeline in graft.streaming (same grouping).
    */
  val q35 = Q("q35_tumbling_window",
    (s, dir) => {
      load(s, dir, "events")
        .withColumn("bucket_start",
          timestamp_seconds(floor(unix_timestamp(col("ts")) / 21600L) * 21600L))
        .groupBy(col("bucket_start"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("bucket_start"), col("event_type"))
    },
    Some("""
      SELECT CAST(TO_TIMESTAMP(FLOOR(EPOCH(ts) / 21600) * 21600) AS TIMESTAMP) AS bucket_start, event_type,
        COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** J6 at fact scale — the co-located bucketed join
    * ([[graft.store.Store.writeBucketed]]): orders and customer written
    * bucketed+sorted on the customer key, then joined as catalog
    * tables — the sort-merge join runs with zero exchanges (asserted
    * in BucketedJoinSpec; here the result goes through the driver's
    * oracle). The write-once-join-many layout for recurring fact⋈dim
    * joins too big to broadcast.
    */
  val q38 = Q("q38_bucketed_join",
    (s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_q38")
      graft.store.Store.writeBucketed(
        load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        "graft_q38_orders", s"$base/orders", 8, "o_custkey")
      graft.store.Store.writeBucketed(
        load(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        "graft_q38_customer", s"$base/customer", 8, "c_custkey")
      val o = s.table("graft_q38_orders")
      val c = s.table("graft_q38_customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  def qs: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q13, q14, q15, q16, q19, q35, q36, q37, q38, q51)
}
