package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.T._

/** Second relational wave: the remaining §2 operators — sentinel scrub
  * (P5), row classifier (P6), first-in-agg (A7/J4), pivot-first (A12),
  * safra-format check (F14).
  */
object Relational2 {

  /** P5 — null/sentinel scrub (reference `inmet/parser.py:50,74-77`):
    * sentinels are synthesized deterministically (value > 400 plays the
    * -9999 role), scrubbed to null, then rows with a null key dropped.
    */
  val q20 = Q("q20_sentinel_scrub",
    (s, dir) => {
      load(s, dir, "events")
        .withColumn("v_raw",
          when(col("value") > 400.0, lit(-9999.0)).otherwise(col("value")))
        .withColumn("v_clean",
          when(col("v_raw") === -9999.0, lit(null).cast("double"))
            .otherwise(col("v_raw")))
        .withColumn("was_sentinel", col("v_raw") === -9999.0)
        .filter(col("event_type").isNotNull)
        .select(col("event_id"), col("v_raw"), col("v_clean"), col("was_sentinel"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id,
        CASE WHEN value > 400.0 THEN -9999.0 ELSE value END AS v_raw,
        CASE WHEN value > 400.0 THEN NULL ELSE value END AS v_clean,
        value > 400.0 AS was_sentinel
      FROM events WHERE event_type IS NOT NULL
      ORDER BY event_id"""))

  /** P6 — row classifier + routing (reference
    * `conab/serie_historica/parser.py:91-115`): rows classified by a
    * derived when/otherwise column, then routed per class.
    */
  val q21 = Q("q21_row_classifier",
    (s, dir) => {
      load(s, dir, "events")
        .withColumn("row_class",
          when(col("event_type").isin("purchase", "signup"), "conversion")
            .when(col("event_type").isin("click", "view"), "engagement")
            .otherwise("other"))
        .groupBy(col("row_class"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("row_class"))
    },
    Some("""
      SELECT row_class, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      FROM (
        SELECT CASE WHEN event_type IN ('purchase','signup') THEN 'conversion'
                    WHEN event_type IN ('click','view') THEN 'engagement'
                    ELSE 'other' END AS row_class, value
        FROM events) t
      GROUP BY row_class ORDER BY row_class"""))

  /** A7/J4 — first() inside the aggregation (reference
    * `nasa_power/parser.py:89-126` keeps station coords with
    * `first(lat), first(lon)` instead of re-joining): deterministic via
    * min_by on the (ts, event_id) event-time key. One shuffle — the
    * reference's join-back is fused away.
    */
  val q22 = Q("q22_first_in_agg",
    (s, dir) => {
      load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          min_by(col("event_type"), struct(col("ts"), col("event_id"))).as("first_type"),
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("first_value"),
          count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, first_type, first_value, n, total FROM (
        SELECT user_id, event_type AS first_type, value AS first_value,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events) f
      JOIN (
        SELECT user_id, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM events GROUP BY user_id) a USING (user_id)
      WHERE rn = 1 ORDER BY user_id"""))

  /** A12 — pivot with FIRST as the cell aggregate (reference
    * `ibge/api.py:152-157` pivots with aggfunc='first'; q13 covers the
    * sum variant). Deterministic first = min_by over event time.
    */
  val q23 = Q("q23_pivot_first",
    (s, dir) => {
      load(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(min_by(col("value"), struct(col("ts"), col("event_id"))))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id,
        MAX(CASE WHEN event_type = 'click' THEN value END) AS click,
        MAX(CASE WHEN event_type = 'error' THEN value END) AS error,
        MAX(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
        MAX(CASE WHEN event_type = 'signup' THEN value END) AS signup,
        MAX(CASE WHEN event_type = 'view' THEN value END) AS view
      FROM (
        SELECT user_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        FROM events) t
      WHERE rn = 1
      GROUP BY user_id ORDER BY user_id"""))

  /** F14 — safra-format regex check (reference
    * `validators/semantic.py:289`): rlike over mixed constructed inputs.
    */
  val q24 = Q("q24_safra_format_check",
    (s, dir) => {
      val y = year(col("o_orderdate"))
      val raw = when(pmod(col("o_orderkey"), lit(3)) === 0,
          concat(y.cast("string"), lit("/"),
            lpad(pmod(y + 1, lit(100)).cast("string"), 2, "0")))
        .when(pmod(col("o_orderkey"), lit(3)) === 1, concat(y.cast("string"), lit("-25")))
        .otherwise(lit("not a safra"))
      load(s, dir, "orders")
        .select(col("o_orderkey"), raw.as("safra"),
          raw.rlike("^\\d{4}/\\d{2}$").as("valid_format"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, safra, regexp_full_match(safra, '\d{4}/\d{2}') AS valid_format
      FROM (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 3 = 0
                 THEN concat(CAST(YEAR(o_orderdate) AS VARCHAR), '/',
                      lpad(CAST((YEAR(o_orderdate) + 1) % 100 AS VARCHAR), 2, '0'))
               WHEN o_orderkey % 3 = 1 THEN concat(CAST(YEAR(o_orderdate) AS VARCHAR), '-25')
               ELSE 'not a safra' END AS safra
        FROM orders) t
      ORDER BY o_orderkey"""))

  def qs: Seq[Q] = Seq(q20, q21, q22, q23, q24)
}
