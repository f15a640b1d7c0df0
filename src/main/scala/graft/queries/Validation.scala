package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}
import graft.queries.T._
import graft.validate._

/** Validation operator family (SURVEY §2.8 V1-V8 + A10/A11) — the
  * reference's signature capability, re-expressed as fused Spark
  * aggregation passes over the test tables. Every query here costs a
  * bounded number of scans/shuffles regardless of table size.
  */
object Validation {

  /** V1/V2 — contract column validation: ALL declared checks fused into
    * ONE aggregation scan (reference runs them per-column:
    * `contracts/__init__.py:106-127`).
    */
  val v01 = Q("v01_contract_violations",
    (s, dir) => {
      val contract = Contract("lineitem", "1.0.0", Seq(
        ColumnSpec("l_orderkey", LongType, nullable = false),
        ColumnSpec("l_quantity", DoubleType, nullable = false,
          minValue = Some(5.0), maxValue = Some(45.0)),
        ColumnSpec("l_discount", DoubleType, maxValue = Some(0.08)),
        ColumnSpec("l_extendedprice", DoubleType, nullable = false,
          minValue = Some(1000.0)),
        ColumnSpec("l_shipdate", TimestampType, nullable = false)))
      contract.violationReport(load(s, dir, "lineitem"))
        .orderBy(col("check_name"), col("column_name"))
    },
    Some("""
      SELECT check_name, column_name, violations FROM (
        SELECT 'not_null' AS check_name, 'l_orderkey' AS column_name, CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM lineitem
        UNION ALL SELECT 'not_null', 'l_quantity', CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        UNION ALL SELECT 'min_value', 'l_quantity', CAST(SUM(CASE WHEN l_quantity < 5.0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        UNION ALL SELECT 'max_value', 'l_quantity', CAST(SUM(CASE WHEN l_quantity > 45.0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        UNION ALL SELECT 'max_value', 'l_discount', CAST(SUM(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        UNION ALL SELECT 'not_null', 'l_extendedprice', CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        UNION ALL SELECT 'min_value', 'l_extendedprice', CAST(SUM(CASE WHEN l_extendedprice < 1000.0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        UNION ALL SELECT 'not_null', 'l_shipdate', CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      ) t ORDER BY check_name, column_name"""))

  /** A11/V2 — PK-uniqueness detail: keys with more than one row
    * (reference `contracts/__init__.py:119-125`). One hash-agg shuffle.
    */
  val v02 = Q("v02_pk_duplicates",
    (s, dir) => {
      Contract("orders_by_cust", "1.0.0", Seq.empty, primaryKey = Seq("o_custkey"))
        .pkDuplicates(load(s, dir, "orders"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      SELECT o_custkey, COUNT(*) AS n_rows FROM orders
      GROUP BY o_custkey HAVING COUNT(*) > 1 ORDER BY o_custkey"""))

  /** V3/W2 — sanity rules: per-type static ranges + max-change vs the
    * previous value of the same series (reference
    * `validators/sanity.py:24-180`); flagged rows carry fired-rule names.
    */
  val v03 = Q("v03_sanity_anomalies",
    (s, dir) => {
      val rules = Map(
        "click" -> SanityRule(0.5, 300.0, 400.0),
        "error" -> SanityRule(0.5, 300.0, 400.0),
        "purchase" -> SanityRule(1.0, 350.0, 400.0),
        "signup" -> SanityRule(0.5, 300.0, 400.0),
        "view" -> SanityRule(0.5, 300.0, 400.0))
      Sanity.flagAnomalies(load(s, dir, "events"), rules,
          ruleKey = col("event_type"), valueCol = col("value"),
          seriesKeys = Seq(col("event_type"), col("user_id")),
          orderCols = Seq(col("ts"), col("event_id")))
        .select(col("event_id"), col("event_type"), col("value"),
          col("prev_value"), col("change_pct"), col("anomalies"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, event_type, value, prev_value, change_pct, anomalies FROM (
        SELECT *, concat_ws(',',
            CASE WHEN value < mn THEN 'below_min' END,
            CASE WHEN value > mx THEN 'above_max' END,
            CASE WHEN change_pct > 400.0 THEN 'daily_change' END) AS anomalies
        FROM (
          SELECT event_id, event_type, value, prev_value,
            CASE event_type WHEN 'purchase' THEN 1.0 ELSE 0.5 END AS mn,
            CASE event_type WHEN 'purchase' THEN 350.0 ELSE 300.0 END AS mx,
            CASE WHEN prev_value IS NULL OR prev_value = 0 THEN NULL
                 ELSE ABS(value - prev_value) / prev_value * 100.0 END AS change_pct
          FROM (
            SELECT event_id, event_type, value,
              LAG(value) OVER (PARTITION BY event_type, user_id ORDER BY ts, event_id) AS prev_value
            FROM events) a) b) c
      WHERE anomalies <> ''
      ORDER BY event_id"""))

  /** V4 — semantic-rule engine summary: aggregate-expressible rules are
    * fused into one scan; window rules get their own plan (reference
    * `validators/semantic.py:328-381` runs them all separately).
    */
  val v04 = Q("v04_semantic_summary",
    (s, dir) => Semantic.validate(load(s, dir, "events"), Semantic.eventSeriesRules()),
    Some("""
      SELECT rule_name, severity, violations, violations = 0 AS passed FROM (
        SELECT 'value_positive' AS rule_name, 'error' AS severity,
               CAST(SUM(CASE WHEN value <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM events
        UNION ALL
        SELECT 'value_not_null', 'error',
               CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM events
        UNION ALL
        SELECT 'daily_variation_gt_100pct', 'warning',
               CAST(SUM(CASE WHEN pct > 100.0 THEN 1 ELSE 0 END) AS BIGINT) FROM (
          SELECT CASE WHEN prev IS NULL OR prev = 0 THEN NULL
                      ELSE ABS((value - prev) / prev * 100.0) END AS pct FROM (
            SELECT value, LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events) a) b
        UNION ALL
        SELECT 'date_gap_gt_2d', 'warning',
               CAST(SUM(CASE WHEN gap > 2 THEN 1 ELSE 0 END) AS BIGINT) FROM (
          SELECT d - LAG(d) OVER (PARTITION BY k ORDER BY d) AS gap FROM (
            SELECT DISTINCT user_id AS k, CAST(ts AS DATE) AS d FROM events) x) y
      ) t ORDER BY rule_name"""))

  /** V5/A10 — quality certification: completeness / duplicates / schema /
    * freshness / value-range in ONE aggregation pass, then pure scoring
    * to GOLD/SILVER/BRONZE (reference `quality.py:257-302`).
    */
  val v05 = Q("v05_quality_certificate",
    (s, dir) => Quality.certify(load(s, dir, "orders"),
      expectedColumns = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"),
      dateCol = "o_orderdate", valueCol = "o_totalprice",
      asOf = "2001-09-01", maxAgeDays = 30,
      minValue = 0.0, maxValue = 450000.0),
    Some("""
      WITH m AS (
        SELECT COUNT(*) AS n_rows,
          CAST(COUNT(o_orderkey) + COUNT(o_custkey) + COUNT(o_orderstatus)
             + COUNT(o_totalprice) + COUNT(o_orderdate) + COUNT(o_orderpriority) AS BIGINT) AS non_null_cells,
          CAST(COUNT(*) - COUNT(DISTINCT (o_orderkey, o_custkey, o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority)) AS BIGINT) AS dup_rows,
          MAX(CAST(o_orderdate AS DATE)) AS max_date,
          CAST(SUM(CASE WHEN o_totalprice < 0.0 OR o_totalprice > 450000.0 THEN 1 ELSE 0 END) AS BIGINT) AS range_violations
        FROM orders),
      s AS (
        SELECT n_rows,
          CAST(non_null_cells AS DOUBLE) / (n_rows * 6) AS completeness,
          CASE WHEN CAST(non_null_cells AS DOUBLE) / (n_rows * 6) >= 0.95 THEN 'passed'
               WHEN CAST(non_null_cells AS DOUBLE) / (n_rows * 6) >= 0.855 THEN 'warning'
               ELSE 'failed' END AS completeness_status,
          dup_rows,
          CASE WHEN CAST(dup_rows AS DOUBLE) / n_rows <= 0.01 THEN 'passed' ELSE 'failed' END AS dup_status,
          'passed' AS schema_status,
          CAST(DATE '2001-09-01' - max_date AS BIGINT) AS age_days,
          CASE WHEN DATE '2001-09-01' - max_date <= 30 THEN 'passed'
               WHEN DATE '2001-09-01' - max_date <= 60 THEN 'warning'
               ELSE 'failed' END AS fresh_status,
          range_violations,
          CASE WHEN range_violations = 0 THEN 'passed' ELSE 'failed' END AS range_status
        FROM m),
      sc AS (
        SELECT *,
          ((CASE WHEN completeness_status = 'passed' THEN 1 ELSE 0 END
          + CASE WHEN dup_status = 'passed' THEN 1 ELSE 0 END
          + CASE WHEN schema_status = 'passed' THEN 1 ELSE 0 END
          + CASE WHEN fresh_status = 'passed' THEN 1 ELSE 0 END
          + CASE WHEN range_status = 'passed' THEN 1 ELSE 0 END)
          + 0.5 * (CASE WHEN completeness_status = 'warning' THEN 1 ELSE 0 END
          + CASE WHEN dup_status = 'warning' THEN 1 ELSE 0 END
          + CASE WHEN fresh_status = 'warning' THEN 1 ELSE 0 END)) / 5.0 AS score,
          (CASE WHEN completeness_status = 'failed' THEN 1 ELSE 0 END
          + CASE WHEN dup_status = 'failed' THEN 1 ELSE 0 END
          + CASE WHEN schema_status = 'failed' THEN 1 ELSE 0 END
          + CASE WHEN fresh_status = 'failed' THEN 1 ELSE 0 END
          + CASE WHEN range_status = 'failed' THEN 1 ELSE 0 END) AS n_failed
        FROM s)
      SELECT n_rows, completeness, completeness_status, dup_rows, dup_status,
        schema_status, age_days, fresh_status, range_violations, range_status, score,
        CASE WHEN score >= 0.9 AND n_failed = 0 THEN 'GOLD'
             WHEN score >= 0.7 AND n_failed <= 1 THEN 'SILVER'
             WHEN score >= 0.5 THEN 'BRONZE'
             ELSE 'UNCERTIFIED' END AS level
      FROM sc"""))

  /** V7 — parser consensus: two independent computations of the same
    * series, compared on row count and first/last value within 0.01;
    * newest version wins on agreement, max-rows on count mismatch
    * (reference `cepea/parsers/consensus.py:41-107,193-207`).
    */
  val v07 = Q("v07_parser_consensus",
    (s, dir) => {
      val ev = load(s, dir, "events")
      def summarize(df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n"),
          min_by(col("mean_value"), col("d")).as("first_val"),
          max_by(col("mean_value"), col("d")).as("last_val"))
      val a = summarize(ev.groupBy(col("ts").cast("date").as("d"))
        .agg(davg(col("value")).as("mean_value")))
        .select(col("n").as("n_v1"), col("first_val").as("first_v1"),
          col("last_val").as("last_v1"))
      val b = summarize(ev.groupBy(date_trunc("DAY", col("ts")).cast("date").as("d"))
        .agg(davg(col("value")).as("mean_value")))
        .select(col("n").as("n_v2"), col("first_val").as("first_v2"),
          col("last_val").as("last_v2"))
      a.crossJoin(b)
        .withColumn("counts_match", col("n_v1") === col("n_v2"))
        .withColumn("values_match",
          abs(col("first_v1") - col("first_v2")) <= 0.01 &&
            abs(col("last_v1") - col("last_v2")) <= 0.01)
        .withColumn("selected_parser",
          when(col("counts_match") && col("values_match"), "v2")
            .when(!col("counts_match"),
              when(col("n_v2") >= col("n_v1"), "v2").otherwise("v1"))
            .otherwise("diverged"))
    },
    Some("""
      WITH v1 AS (
        SELECT CAST(ts AS DATE) AS d,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(value) AS mean_value
        FROM events GROUP BY 1),
      v2 AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS d,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(value) AS mean_value
        FROM events GROUP BY 1),
      s1 AS (SELECT COUNT(*) AS n_v1, MIN_BY(mean_value, d) AS first_v1, MAX_BY(mean_value, d) AS last_v1 FROM v1),
      s2 AS (SELECT COUNT(*) AS n_v2, MIN_BY(mean_value, d) AS first_v2, MAX_BY(mean_value, d) AS last_v2 FROM v2)
      SELECT n_v1, first_v1, last_v1, n_v2, first_v2, last_v2,
        n_v1 = n_v2 AS counts_match,
        ABS(first_v1 - first_v2) <= 0.01 AND ABS(last_v1 - last_v2) <= 0.01 AS values_match,
        CASE WHEN n_v1 = n_v2 AND ABS(first_v1 - first_v2) <= 0.01 AND ABS(last_v1 - last_v2) <= 0.01 THEN 'v2'
             WHEN n_v1 <> n_v2 THEN (CASE WHEN n_v2 >= n_v1 THEN 'v2' ELSE 'v1' END)
             ELSE 'diverged' END AS selected_parser
      FROM s1, s2"""))

  /** V8 — calendar gap finder: per-user expected business days anti-joined
    * against present dates (reference `cache/duckdb_store.py:463-491`).
    */
  val v08 = Q("v08_calendar_gaps",
    (s, dir) => Gaps.missingBusinessDays(
      load(s, dir, "events"), col("ts"), keys = Seq("user_id")),
    Some("""
      WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      bounds AS (SELECT user_id, MIN(d) AS mn, MAX(d) AS mx FROM days GROUP BY user_id),
      cal AS (SELECT user_id, CAST(unnest(generate_series(CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d FROM bounds),
      bdays AS (SELECT * FROM cal WHERE dayofweek(d) NOT IN (0, 6))
      SELECT b.user_id, b.d FROM bdays b
      LEFT JOIN days p ON b.user_id = p.user_id AND b.d = p.d
      WHERE p.d IS NULL
      ORDER BY b.user_id, b.d"""))

  /** Referential-integrity audit: orphan foreign keys counted per
    * relation in one left-join pass each (planted: every 1000th order
    * points at a nonexistent customer; one line of every 500th order's
    * lineitems at a nonexistent order). The dim side is reduced to
    * DISTINCT keys before the join, so the shuffle carries keys, not
    * dim payloads; counts and orphans come from the same pass (no
    * second scan for the denominator).
    */
  val v09 = Q("v09_ref_integrity",
    (s, dir) => {
      import org.apache.spark.sql.DataFrame
      def audit(fact: DataFrame, fk: String, dimKeys: DataFrame, pk: String,
          name: String): DataFrame =
        fact.join(dimKeys.distinct(), fact(fk) === dimKeys(pk), "left")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col(pk).isNull, 1L).otherwise(0L)).as("n_orphans"))
          .select(lit(name).as("relation"), col("n_rows"), col("n_orphans"))
      val orders = load(s, dir, "orders")
      val oPlanted = orders.withColumn("o_custkey",
        when(pmod(col("o_orderkey"), lit(1000)) === 0, col("o_custkey") + 9000000L)
          .otherwise(col("o_custkey")))
      val liPlanted = load(s, dir, "lineitem").withColumn("l_orderkey",
        when(pmod(col("l_orderkey"), lit(500)) === 0 && col("l_linenumber") === 1,
          col("l_orderkey") + 90000000L).otherwise(col("l_orderkey")))
      audit(oPlanted, "o_custkey",
          load(s, dir, "customer").select(col("c_custkey")), "c_custkey",
          "orders->customer")
        .unionByName(audit(liPlanted, "l_orderkey",
          orders.select(col("o_orderkey")), "o_orderkey", "lineitem->orders"))
        .orderBy(col("relation"))
    },
    Some("""
      WITH o AS (
        SELECT CASE WHEN o_orderkey % 1000 = 0 THEN o_custkey + 9000000
                    ELSE o_custkey END AS o_custkey
        FROM orders),
      l AS (
        SELECT CASE WHEN l_orderkey % 500 = 0 AND l_linenumber = 1
                    THEN l_orderkey + 90000000 ELSE l_orderkey END AS l_orderkey
        FROM lineitem)
      SELECT 'lineitem->orders' AS relation, COUNT(*) AS n_rows,
        CAST(SUM(CASE WHEN oo.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
      FROM l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) oo
        ON l.l_orderkey = oo.o_orderkey
      UNION ALL
      SELECT 'orders->customer', COUNT(*),
        CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON o.o_custkey = c.c_custkey
      ORDER BY relation"""))

  /** Distribution-drift audit: the 1995 vs 1996 order-value histograms
    * compared bin by bin with a symmetric chi-square statistic
    * ((p-q)²/((p+q)/2) over bin proportions) — the drift gate a
    * curation pipeline runs before accepting a new data drop. One
    * aggregation pass builds both years' histograms (conditional sums,
    * never two scans); the statistic is pure rational arithmetic on
    * exact integer counts — no log/exp whose last-ulp could differ
    * between engines — so the oracle hash-matches. 10 fixed-width bins
    * with the overflow capped into the last one.
    */
  val v10 = Q("v10_dist_drift",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val yr = year(col("o_orderdate"))
      // single-partition by a materialized constant key: the frame is
      // the ≤10-row histogram, and the explicit key replaces the
      // empty partition spec that made WindowExec warn on every run
      val w = Window.partitionBy(col("_all"))
      load(s, dir, "orders")
        .filter(yr.isin(1995, 1996))
        .groupBy(least(floor(col("o_totalprice") / 50000), lit(9L)).as("bin"))
        .agg(sum(when(yr === 1995, 1L).otherwise(0L)).as("n_1995"),
          sum(when(yr === 1996, 1L).otherwise(0L)).as("n_1996"))
        .withColumn("_all", lit(0))
        .withColumn("p", col("n_1995").cast("double") /
          sum(col("n_1995")).over(w).cast("double"))
        .withColumn("q", col("n_1996").cast("double") /
          sum(col("n_1996")).over(w).cast("double"))
        .select(col("bin"), col("n_1995"), col("n_1996"),
          round(col("p"), 6).as("p_1995"), round(col("q"), 6).as("p_1996"),
          round(((col("p") - col("q")) * (col("p") - col("q"))) /
            ((col("p") + col("q")) / 2.0), 6).as("chi2"))
        .orderBy(col("bin"))
    },
    Some("""
      WITH h AS (
        SELECT CAST(LEAST(FLOOR(o_totalprice / 50000), 9) AS BIGINT) AS bin,
          CAST(SUM(CASE WHEN YEAR(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS BIGINT) AS n_1995,
          CAST(SUM(CASE WHEN YEAR(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS n_1996
        FROM orders WHERE YEAR(o_orderdate) IN (1995, 1996) GROUP BY 1),
      props AS (
        SELECT bin, n_1995, n_1996,
          CAST(n_1995 AS DOUBLE) / CAST(SUM(n_1995) OVER () AS DOUBLE) AS p,
          CAST(n_1996 AS DOUBLE) / CAST(SUM(n_1996) OVER () AS DOUBLE) AS q
        FROM h)
      SELECT bin, n_1995, n_1996,
        ROUND(p, 6) AS p_1995, ROUND(q, 6) AS p_1996,
        ROUND(((p - q) * (p - q)) / ((p + q) / 2.0), 6) AS chi2
      FROM props ORDER BY bin"""))

  /** Cross-table measure reconciliation (v09's sibling at the measure
    * level): each order's header total compared against the
    * recomputed sum over its lineitems
    * (extendedprice·(1−discount)·(1+tax), the TPC-H identity), all in
    * exact DECIMAL so both engines agree on every difference. Output
    * is the reconciliation summary a warehouse loader gates on:
    * orders checked, orders without lines, matches at 2 dp, and the
    * worst absolute discrepancy. (On the driver's synthetic tables the
    * identity deliberately does NOT hold — the audit's job is to say
    * so, identically in both engines.)
    */
  val v11 = Q("v11_reconciliation",
    (s, dir) => {
      val li = load(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum((dec(col("l_extendedprice")) * (lit(1.0) - dec(col("l_discount"))) *
          (lit(1.0) + dec(col("l_tax")))).cast(
            org.apache.spark.sql.types.DataTypes.createDecimalType(28, 8)))
          .as("computed"))
      load(s, dir, "orders")
        .select(col("o_orderkey"), dec(col("o_totalprice")).as("header"))
        .join(li, Seq("o_orderkey"), "left")
        .withColumn("diff",
          when(col("computed").isNull, lit(null))
            .otherwise(abs(col("header") - col("computed"))))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("computed").isNull, 1L).otherwise(0L)).as("n_no_lines"),
          sum(when(col("diff") <= 0.01, 1L).otherwise(0L)).as("n_match_2dp"),
          max(col("diff")).cast("double").as("max_abs_diff"))
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey AS o_orderkey,
          SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
            * (1.0 - CAST(l_discount AS DECIMAL(18,4)))
            * (1.0 + CAST(l_tax AS DECIMAL(18,4))) AS DECIMAL(28,8))) AS computed
        FROM lineitem GROUP BY 1),
      j AS (
        SELECT o.o_orderkey, CAST(o.o_totalprice AS DECIMAL(18,4)) AS header,
               li.computed,
               CASE WHEN li.computed IS NULL THEN NULL
                    ELSE ABS(CAST(o.o_totalprice AS DECIMAL(18,4)) - li.computed)
               END AS diff
        FROM orders o LEFT JOIN li USING (o_orderkey))
      SELECT COUNT(*) AS n_orders,
        CAST(SUM(CASE WHEN computed IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lines,
        CAST(SUM(CASE WHEN diff <= 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_match_2dp,
        CAST(MAX(diff) AS DOUBLE) AS max_abs_diff
      FROM j"""))

  /** Robust outlier audit: per event type, median and MAD (median
    * absolute deviation) of the value column — the estimators that
    * survive the very outliers they hunt, where mean/stddev get
    * dragged (v03's fixed sanity bounds, made data-calibrated). Two
    * exact-percentile passes (group medians broadcast back for the
    * deviation pass), then a count of |x − med| > 3·MAD. Medians are
    * 6-dp-rounded before the deviation/threshold arithmetic so both
    * engines run the identical comparison on identical operands. At
    * 100 TB the same shape runs on `percentile_approx` with a declared
    * rank-error (t09's stance); the exact form here is what makes the
    * oracle byte-checkable.
    */
  val v12 = Q("v12_robust_outliers",
    (s, dir) => {
      val ev = load(s, dir, "events")
        .select(col("event_type"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), first(col("med")).as("med"),
          round(expr("percentile(adev, 0.5)"), 6).as("mad"))
      dev.join(broadcast(mad.select(col("event_type"), col("mad"))),
          Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("adev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
        .join(mad, Seq("event_type"))
        .select(col("event_type"), col("n"), col("med"), col("mad"),
          col("n_outliers"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH med AS (
        SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
        FROM events GROUP BY 1),
      dev AS (
        SELECT e.event_type, ABS(e.value - m.med) AS adev, m.med
        FROM events e JOIN med m USING (event_type)),
      mad AS (
        SELECT event_type, COUNT(*) AS n, MIN(med) AS med,
               ROUND(quantile_cont(adev, 0.5), 6) AS mad
        FROM dev GROUP BY 1)
      SELECT d.event_type, m.n, m.med, m.mad,
        CAST(SUM(CASE WHEN d.adev > 3.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
          AS n_outliers
      FROM dev d JOIN mad m USING (event_type)
      GROUP BY 1, 2, 3, 4 ORDER BY d.event_type"""))

  /** Freshness audit: per event type, the high-water mark and how many
    * whole hours it trails a fixed reference instant (deterministic
    * twin of `now()` — the reference's TTL/staleness policies in
    * `store/Policies.scala` are the same arithmetic against the real
    * clock). Millisecond-epoch integer arithmetic on both sides: no
    * timezone, no fractional-second divergence, no datediff
    * boundary-counting ambiguity.
    */
  val v13 = Q("v13_freshness_audit",
    (s, dir) => {
      val refMs = java.time.Instant.parse("1997-01-01T00:00:00Z").toEpochMilli
      load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("ts")).as("max_ts"))
        .select(col("event_type"), col("n"), col("max_ts"),
          // EXPLICIT floor on both sides: Spark's cast-to-long truncates
          // toward zero and DuckDB's BIGINT // does too, but relying on
          // matching truncation conventions is fragile — the events
          // data has post-reference rows (negative spans), exactly
          // where the conventions can drift. Floor is the semantics
          // "hours behind" means, stated identically in both engines.
          floor((lit(refMs) - epochMs(col("max_ts"))) / lit(3600000.0))
            .cast("long").as("hours_behind"))
        .withColumn("is_stale", col("hours_behind") > 24 * 30)
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, COUNT(*) AS n, MAX(ts) AS max_ts,
        CAST(FLOOR((epoch_ms(TIMESTAMP '1997-01-01 00:00:00') - epoch_ms(MAX(ts)))
          / 3600000.0) AS BIGINT) AS hours_behind,
        CAST(FLOOR((epoch_ms(TIMESTAMP '1997-01-01 00:00:00') - epoch_ms(MAX(ts)))
          / 3600000.0) AS BIGINT) > 720 AS is_stale
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** Embedding-space drift between two corpus snapshots (v10's
    * distribution-drift monitor lifted to vector columns; cohorts =
    * vec_id parity as the two-snapshot stand-in): per-dimension mean
    * vectors, compared by cosine and L2. The plan is drift-monitor-
    * shaped for 100 TB: posexplode inflates rows ×dim but partial
    * aggregation collapses it map-side to 2×dim (coh, j) cells, the
    * only shuffle is those ≤128 rows, and the final comparison folds
    * 64 rows to one. All float work runs through 6/12-dp-rounded
    * DECIMAL sums, so the two engines agree bit-for-bit.
    */
  val v14 = Q("v14_embedding_drift",
    (s, dir) => {
      import org.apache.spark.sql.types.DataTypes
      val dec6 = DataTypes.createDecimalType(28, 6)
      val dec12 = DataTypes.createDecimalType(30, 12)
      val e = load(s, dir, "embeddings")
        .select(pmod(col("vec_id"), lit(2)).as("coh"),
          posexplode(col("embedding")).as(Seq("j", "x")))
      val m = e.groupBy(col("coh"), col("j"))
        .agg(round(sum(round(col("x").cast("double"), 6).cast(dec6))
          .cast("double") / count(lit(1)), 6).as("mu"))
      val a = m.filter(col("coh") === 0).select(col("j"), col("mu").as("ma"))
      val b = m.filter(col("coh") === 1).select(col("j"), col("mu").as("mb"))
      a.join(b, Seq("j"))
        .agg(
          sum(round(col("ma") * col("mb"), 12).cast(dec12))
            .cast("double").as("s_ab"),
          sum(round(col("ma") * col("ma"), 12).cast(dec12))
            .cast("double").as("s_aa"),
          sum(round(col("mb") * col("mb"), 12).cast(dec12))
            .cast("double").as("s_bb"),
          sum(round((col("ma") - col("mb")) * (col("ma") - col("mb")), 12)
            .cast(dec12)).cast("double").as("s_dd"))
        .select(
          round(col("s_ab") / (sqrt(col("s_aa")) * sqrt(col("s_bb"))), 6)
            .as("mean_cos"),
          round(sqrt(col("s_dd")), 6).as("mean_l2"))
    },
    Some("""
      WITH e AS (
        SELECT vec_id % 2 AS coh, j,
          CAST(embedding[j] AS DOUBLE) AS x
        FROM embeddings, generate_series(1, 64) t(j)),
      m AS (
        SELECT coh, j,
          ROUND(CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(28,6))) AS DOUBLE)
            / COUNT(*), 6) AS mu
        FROM e GROUP BY 1, 2),
      ab AS (
        SELECT a.mu AS ma, b.mu AS mb
        FROM m a JOIN m b ON a.j = b.j AND a.coh = 0 AND b.coh = 1),
      sums AS (
        SELECT
          CAST(SUM(CAST(ROUND(ma * mb, 12) AS DECIMAL(30,12))) AS DOUBLE) AS s_ab,
          CAST(SUM(CAST(ROUND(ma * ma, 12) AS DECIMAL(30,12))) AS DOUBLE) AS s_aa,
          CAST(SUM(CAST(ROUND(mb * mb, 12) AS DECIMAL(30,12))) AS DOUBLE) AS s_bb,
          CAST(SUM(CAST(ROUND((ma - mb) * (ma - mb), 12) AS DECIMAL(30,12))) AS DOUBLE) AS s_dd
        FROM ab)
      SELECT ROUND(s_ab / (SQRT(s_aa) * SQRT(s_bb)), 6) AS mean_cos,
        ROUND(SQRT(s_dd), 6) AS mean_l2
      FROM sums"""))

  /** Materialized-view consistency audit — the trust-but-verify leg of
    * the MV loop (s07 maintains, s14 rewrites onto, v15 AUDITS): the
    * maintained summary full-joins a fresh recompute on the group key
    * and every diverging row surfaces with both sides' values. Here
    * the "maintained" copy carries a planted drift (every 5th calendar
    * month's count off by one — the partial-double-apply failure mode
    * of a non-fenced refresh), and the audit must flag exactly those
    * months. Cost shape: one aggregation over the base (the recompute
    * — at 100 TB run it on a partition SAMPLE or only over partitions
    * touched since the last audit) plus a |distinct keys|-sized join;
    * nothing row-scale ever joins.
    */
  val v15 = Q("v15_mv_consistency",
    (s, dir) => {
      val recomputed = load(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("mes"))
        .agg(sum(dec(col("o_totalprice"))).as("total_dec"),
          count(lit(1)).as("n"))
      val maintained = recomputed
        .withColumn("n", when(pmod(month(col("mes")), lit(5)) === 0,
          col("n") + 1).otherwise(col("n")))
      maintained.select(col("mes"), col("n").as("n_maintained"),
          col("total_dec").as("t_m"))
        .join(recomputed.select(col("mes"), col("n").as("n_recomputed"),
          col("total_dec").as("t_r")), Seq("mes"), "full_outer")
        .filter(not(col("n_maintained") === col("n_recomputed") &&
          col("t_m") === col("t_r")))
        .select(col("mes"), col("n_maintained"), col("n_recomputed"),
          col("t_m").cast("double").as("total_maintained"),
          col("t_r").cast("double").as("total_recomputed"))
        .orderBy(col("mes"))
    },
    Some("""
      WITH r AS (
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mes,
          SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS total_dec,
          COUNT(*) AS n
        FROM orders GROUP BY 1),
      m AS (
        SELECT mes, total_dec,
          CASE WHEN MONTH(mes) % 5 = 0 THEN n + 1 ELSE n END AS n
        FROM r)
      SELECT m.mes, m.n AS n_maintained, r.n AS n_recomputed,
        CAST(m.total_dec AS DOUBLE) AS total_maintained,
        CAST(r.total_dec AS DOUBLE) AS total_recomputed
      FROM m JOIN r USING (mes)
      WHERE NOT (m.n = r.n AND m.total_dec = r.total_dec)
      ORDER BY m.mes"""))

  /** Seasonal anomaly audit: each (event_type, hour-of-day) cell gets
    * its own baseline — the diurnal profile every operational metric
    * has — and rows are flagged against THEIR OWN hour's mean ± 3σ,
    * not the global one (a 3 a.m. spike is an anomaly even when it
    * would be normal at noon). Mean/variance come from exact decimal
    * moment sums (Σv, Σv² — one aggregation pass, engine-order
    * independent), the baseline table is ≤ type×24 rows (broadcast),
    * and the flag pass is the only re-scan: two scans total, no
    * windows. Both engines compute identical doubles from identical
    * decimals, so even the σ-boundary comparisons agree bit-for-bit.
    */
  val v16 = Q("v16_seasonal_anomaly",
    (s, dir) => {
      val ev = load(s, dir, "events")
        .select(col("event_type"), hour(col("ts")).as("hh"), col("value"))
      val base = ev.groupBy(col("event_type"), col("hh"))
        .agg(count(lit(1)).as("n"),
          (sum(dec(col("value"))).cast("double") / count(lit(1))).as("mean"),
          (sum((dec(col("value")) * dec(col("value")))
              .cast(org.apache.spark.sql.types.DecimalType(38, 8)))
            .cast("double") / count(lit(1))).as("m2"))
        .withColumn("sd", sqrt(col("m2") - col("mean") * col("mean")))
      ev.join(broadcast(base), Seq("event_type", "hh"))
        .groupBy(col("event_type"), col("hh"))
        .agg(first(col("n")).as("n"),
          round(first(col("mean")), 6).as("mean"),
          round(first(col("sd")), 6).as("sd"),
          sum(when(abs(col("value") - col("mean")) > lit(3.0) * col("sd"),
            1L).otherwise(0L)).as("n_anomalies"))
        .orderBy(col("event_type"), col("hh"))
    },
    Some("""
      WITH ev AS (
        SELECT event_type, CAST(hour(ts) AS INT) AS hh, value FROM events),
      base AS (
        SELECT event_type, hh, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS mean,
          CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))
                 AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*) AS m2
        FROM ev GROUP BY 1, 2),
      b AS (SELECT *, sqrt(m2 - mean * mean) AS sd FROM base)
      SELECT e.event_type, e.hh, MIN(b.n) AS n,
        ROUND(MIN(b.mean), 6) AS mean, ROUND(MIN(b.sd), 6) AS sd,
        CAST(SUM(CASE WHEN ABS(e.value - b.mean) > 3.0 * b.sd
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
      FROM ev e JOIN b USING (event_type, hh)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  def qs: Seq[Q] = Seq(v01, v02, v03, v04, v05, v07, v08, v09, v10, v11, v12, v13, v14, v15, v16)
}
