package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.T._

/** Scale-variant aggregates: approx_count_distinct (HLL++) beside the
  * exact count. At 100 TB the exact distinct is a full shuffle on the
  * distinct key; the sketch is map-side mergeable with bounded memory.
  * Sketch estimates are engine-specific, so this is a rows-only entry;
  * the relative-error bound is asserted in the output itself.
  */
object Relational3 {

  val q25 = Q("q25_approx_distinct",
    (s, dir) => {
      load(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("ano"))
        .agg(
          countDistinct(col("o_custkey")).as("n_exact"),
          approx_count_distinct(col("o_custkey"), rsd = 0.02).as("n_approx"))
        .withColumn("rel_err",
          abs(col("n_approx") - col("n_exact")).cast("double") / col("n_exact"))
        .withColumn("within_5pct", col("rel_err") <= 0.05)
        .orderBy(col("ano"))
    },
    None)

  /** The oracle-checked half of q25: the exact distinct count alone is
    * engine-independent, so it gets a DuckDB oracle while the HLL
    * estimate above stays rows-only. Same scan, same grouping — proves
    * the exact column q25 compares its sketch against is itself
    * correct.
    */
  val q29 = Q("q29_exact_distinct",
    (s, dir) => {
      load(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("ano"))
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
        .orderBy(col("ano"))
    },
    Some("""
      SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS ano,
             COUNT(DISTINCT o_custkey) AS n_exact
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Set operations (SURVEY §2.6 note): customers active in BOTH years
    * (intersect) and in 1995 only (except) — both hash-dedup shuffles
    * on the full row.
    */
  val q26 = Q("q26_setops",
    (s, dir) => {
      val o = load(s, dir, "orders")
      def custs(y: Int) = o.filter(year(col("o_orderdate")) === y)
        .select(col("o_custkey"))
      val both = custs(1995).intersect(custs(1996))
        .withColumn("membership", lit("both"))
      val only95 = custs(1995).except(custs(1996))
        .withColumn("membership", lit("only_1995"))
      both.unionByName(only95).orderBy(col("membership"), col("o_custkey"))
    },
    Some("""
      SELECT o_custkey, membership FROM (
        SELECT o_custkey, 'both' AS membership FROM (
          SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995
          INTERSECT
          SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996) a
        UNION ALL
        SELECT o_custkey, 'only_1995' FROM (
          SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995
          EXCEPT
          SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996) b
      ) t ORDER BY membership, o_custkey"""))

  /** S7 — the fact-store predicate scan, via the Store.factQuery helper
    * (reference `indicadores_query`: equality + range + ORDER BY DESC,
    * `cache/duckdb_store.py:339-400`); predicates reach the parquet
    * scan.
    */
  val q27 = Q("q27_fact_query",
    (s, dir) => {
      graft.store.Store.factQuery(
          load(s, dir, "orders"),
          predicates = Seq(
            col("o_orderpriority") === "1-URGENT",
            col("o_orderdate").between(
              lit("1997-01-01").cast("timestamp"),
              lit("1997-12-31").cast("timestamp"))),
          orderDesc = col("o_orderdate"))
        .withColumn("o_orderdate", col("o_orderdate").cast("date"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
      ORDER BY o_orderdate DESC, o_orderkey"""))

  /** A5 — weekly resample (the pd.Grouper(freq='W') shape): ISO-Monday
    * week truncation, identical in both engines.
    */
  val q28 = Q("q28_weekly_agg",
    (s, dir) => {
      load(s, dir, "events")
        .groupBy(date_trunc("week", col("ts")).cast("date").as("semana"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy(col("semana"), col("event_type"))
    },
    Some("""
      SELECT CAST(DATE_TRUNC('week', ts) AS DATE) AS semana, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** A4's generalization — CUBE (all grouping sets of year ×
    * priority) with grouping_id disambiguating which combination each
    * row belongs to (q16 covers ROLLUP's prefix lattice; CUBE is the
    * full one). One pass, one shuffle: Spark expands grouping sets
    * map-side, exactly like the ROLLUP plan.
    */
  val q32 = Q("q32_cube_grouping_id",
    (s, dir) => {
      load(s, dir, "orders")
        .cube(year(col("o_orderdate")).cast("long").as("ano"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"),
          dsum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
        .orderBy(col("gid"), col("ano").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },
    Some("""
      SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS ano, o_orderpriority,
        GROUPING(CAST(YEAR(o_orderdate) AS BIGINT), o_orderpriority) AS gid,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total, COUNT(*) AS n
      FROM orders GROUP BY CUBE(1, 2)
      ORDER BY gid, ano ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""))

  /** W-family distribution windows: percent_rank / cume_dist / ntile
    * quartiles of event value within each event type (the ranking
    * shapes q08's lag and q07's row_number don't cover). One window
    * shuffle on the type key.
    */
  val q33 = Q("q33_rank_distribution",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      load(s, dir, "events")
        .filter(pmod(col("event_id"), lit(20)) === 0)
        .select(col("event_id"), col("event_type"), col("value"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("event_type"), col("value"), col("event_id"))
    },
    Some("""
      SELECT event_id, event_type, value,
        ROUND(percent_rank() OVER w, 6) AS pct_rank,
        ROUND(cume_dist() OVER w, 6) AS cume,
        CAST(ntile(4) OVER w AS INT) AS quartile
      FROM events WHERE event_id % 20 = 0
      WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      ORDER BY event_type, value, event_id"""))

  /** Correlated scalar subquery, decorrelated: orders beating their
    * customer's average order value. The correlated AVG is expressed as
    * a window aggregate over the customer partition — Catalyst's own
    * decorrelation target — so ONE shuffle on o_custkey replaces a
    * per-row subquery; the oracle keeps the textbook correlated form.
    * Average goes through the exact-decimal sum (T.davg's shape) so
    * both engines agree bit-for-bit.
    */
  val q34 = Q("q34_above_cust_avg",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
      load(s, dir, "orders")
        .withColumn("cust_avg",
          round((sum(dec(col("o_totalprice"))).over(w).cast("double") /
            count(lit(1)).over(w)), 6))
        .filter(col("o_totalprice") > col("cust_avg"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("cust_avg"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, cust_avg FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
          ROUND((SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
                 FROM orders o2 WHERE o2.o_custkey = o.o_custkey), 6) AS cust_avg
        FROM orders o) t
      WHERE o_totalprice > cust_avg
      ORDER BY o_orderkey"""))

  /** q26's multiset twin — EXCEPT ALL / INTERSECT ALL keep
    * multiplicities: a customer with 3 orders in 1995 and 1 in 1996
    * contributes 2 `excess_1995` rows and 1 `common` row (the bag
    * semantics the distinct set ops erase). Spark plans both as a
    * single hash aggregation computing per-row counts on each side —
    * one shuffle, no join.
    */
  val q46 = Q("q46_except_all",
    (s, dir) => {
      val o = load(s, dir, "orders")
      def custs(y: Int) = o.filter(year(col("o_orderdate")) === y)
        .select(col("o_custkey"))
      val common = custs(1995).intersectAll(custs(1996))
        .withColumn("membership", lit("common"))
      val excess = custs(1995).exceptAll(custs(1996))
        .withColumn("membership", lit("excess_1995"))
      common.unionByName(excess).orderBy(col("membership"), col("o_custkey"))
    },
    Some("""
      SELECT o_custkey, membership FROM (
        SELECT o_custkey, 'common' AS membership FROM (
          SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995
          INTERSECT ALL
          SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996) a
        UNION ALL
        SELECT o_custkey, 'excess_1995' FROM (
          SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995
          EXCEPT ALL
          SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996) b
      ) t ORDER BY membership, o_custkey"""))

  /** Explicit GROUPING SETS outside the rollup/cube lattice: the union
    * of two INDEPENDENT group-bys — by year and by priority — in ONE
    * pass over the fact table (q16's ROLLUP and q32's CUBE only cover
    * the lattice shapes). Spark expands the sets map-side into a
    * single shuffle, exactly like its ROLLUP plan, instead of the two
    * scans + union a user would otherwise write.
    */
  val q47 = Q("q47_grouping_sets",
    (s, dir) => {
      load(s, dir, "orders")
        .select(year(col("o_orderdate")).cast("long").as("ano"),
          col("o_orderpriority").as("prio"), col("o_totalprice"))
        .groupingSets(Seq(Seq(col("ano")), Seq(col("prio"))),
          col("ano"), col("prio"))
        .agg(grouping_id().as("gid"),
          dsum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
        .orderBy(col("gid"), col("ano").asc_nulls_first,
          col("prio").asc_nulls_first)
    },
    Some("""
      SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS ano,
        o_orderpriority AS prio,
        GROUPING(CAST(YEAR(o_orderdate) AS BIGINT), o_orderpriority) AS gid,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        COUNT(*) AS n
      FROM orders GROUP BY GROUPING SETS ((1), (2))
      ORDER BY gid, ano ASC NULLS FIRST, prio ASC NULLS FIRST"""))

  /** Count-min sketch beside exact counts (the q25/q29 stance for
    * FREQUENCIES): Spark's built-in count_min_sketch aggregate is
    * mergeable bounded memory — the streaming/distributed counting
    * standard (Cormode & Muthukrishnan 2005) — and CMS's one-sided
    * guarantee (never undercounts; overcount ≤ ε·N with prob 1−δ) is
    * asserted IN the row against the exact counts of the corpus's top
    * tokens. Deterministic seed ⇒ stable estimates; the sketch and the
    * token list are driver-side by design (one 7 KB row + 30 rows).
    */
  val q52 = Q("q52_count_min_sketch",
    (s, dir) => {
      import org.apache.spark.util.sketch.CountMinSketch
      val eps = 0.0001
      val toks = load(s, dir, "documents")
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      val bytes = toks
        .agg(expr(s"count_min_sketch(token, ${eps}d, 0.99d, 42)")).head()
        .getAs[Array[Byte]](0)
      val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      val total = toks.count()
      val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("token")).limit(30)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      import s.implicits._
      exact.map { case (t, n) =>
        val est = cms.estimateCount(t)
        (t, n, est, est >= n, est <= n + (eps * total).toLong)
      }.toSeq
        .toDF("token", "n_exact", "n_est", "never_undercounts", "within_eps")
        .orderBy(col("n_exact").desc, col("token"))
    },
    None)

  /** Grouped Pearson correlation through EXACT decimal moment sums
    * (q1-family arithmetic discipline): sums of x, y, x², y², xy are
    * DECIMAL — associative, so shuffle order can't perturb them — and
    * only the final closed-form formula runs in DOUBLE, written with
    * the identical expression shape in both engines so the doubles
    * match bit-for-bit. The built-in `corr` aggregate (a float
    * accumulator) would NOT hash-match across engines — this is the
    * deterministic form a 100 TB audit needs anyway. One scan, one
    * shuffle on the group key, partial aggregation map-side.
    */
  val q54 = Q("q54_group_corr",
    (s, dir) => {
      val li = load(s, dir, "lineitem")
      val x = dec(col("l_quantity"))
      val y = dec(col("l_extendedprice"))
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
          sum(x * x).cast("double").as("sxx"),
          sum(y * y).cast("double").as("syy"),
          sum(x * y).cast("double").as("sxy"))
        .select(col("l_returnflag"), col("n").cast("long").as("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag,
          CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
          -- DuckDB multiplies in the operand width (no auto-promotion to
          -- int128), so one side is widened; scale 4 is unchanged, the
          -- values are identical to the DECIMAL(18,4) view Spark sums.
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS syy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        ROUND((n * sxy - sx * sy) /
          (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6) AS corr_qty_price
      FROM m ORDER BY l_returnflag"""))

  /** Grouped least-squares regression (q54's sibling): slope and
    * intercept of extendedprice on quantity per return flag, through
    * the same exact decimal moment sums — the `regr_slope`/
    * `regr_intercept` family, but deterministic across engines (the
    * built-ins accumulate in float). Same one-scan, one-shuffle plan.
    */
  val q57 = Q("q57_group_regression",
    (s, dir) => {
      val li = load(s, dir, "lineitem")
      val x = dec(col("l_quantity"))
      val y = dec(col("l_extendedprice"))
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("nd"),
          sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
          sum(x * x).cast("double").as("sxx"),
          sum(x * y).cast("double").as("sxy"))
        .select(col("l_returnflag"), col("nd").cast("long").as("n"),
          round((col("nd") * col("sxy") - col("sx") * col("sy")) /
            (col("nd") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
          round((col("sy") - ((col("nd") * col("sxy") - col("sx") * col("sy")) /
            (col("nd") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
            col("nd"), 6).as("intercept"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag,
          CAST(COUNT(*) AS DOUBLE) AS nd,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, CAST(nd AS BIGINT) AS n,
        ROUND((nd * sxy - sx * sy) / (nd * sxx - sx * sx), 6) AS slope,
        ROUND((sy - ((nd * sxy - sx * sy) / (nd * sxx - sx * sx)) * sx) / nd, 6)
          AS intercept
      FROM m ORDER BY l_returnflag"""))

  /** Hamming similarity self-join with EXACT pigeonhole blocking: two
    * 20-char prefixes within 3 substitutions must agree exactly on at
    * least one of 4 disjoint 5-char segments, so candidates are met
    * only inside (segment-index, segment-value) buckets — never
    * all-pairs — and the exact per-position distance then verifies the
    * survivors (the SimHash-verification primitive, as a relational
    * operator). Pair dedup happens on ids before the verify; the
    * oracle is the brute-force cross join, which the blocking provably
    * equals. At 100 TB the bucket join scales with bucket occupancy
    * (near-dup density), not corpus².
    */
  val q59 = Q("q59_hamming_simjoin",
    (s, dir) => {
      val plen = 20; val segs = 4; val segLen = plen / segs
      val p = load(s, dir, "documents")
        .select(col("doc_id"),
          substring(lower(trim(col("text"))), 1, plen).as("pfx"))
        .filter(length(col("pfx")) === plen)
      val segCols = (0 until segs).map(i => struct(lit(i).as("i"),
        substring(col("pfx"), 1 + i * segLen, segLen).as("seg")))
      val blocked = p
        .select(col("doc_id"), col("pfx"), explode(array(segCols: _*)).as("e"))
        .select(col("doc_id"), col("pfx"), col("e.i").as("i"), col("e.seg").as("seg"))
      // verify-early: the 20-char hamming test runs INSIDE the bucket
      // join's output before the pair-dedup — the distinct then
      // exchanges only verified survivors (27 rows at sf0.01) instead
      // of every bucket collision with its string payloads (515k pairs
      // at sf0.1). A same-bucket pair may be verified up to 4× (once
      // per shared segment index) — redundant arithmetic, no extra I/O.
      // The probe side is round-robin repartitioned: the verify stage
      // is CPU-bound and hot segment values make bucket sizes skewed,
      // so spreading probe rows evenly beats inheriting the scan's
      // splits (an explicit repartition also can't be AQE-coalesced
      // back into one small-input task). The segment table broadcasts
      // at this fan-out; a corpus too big to broadcast switches the
      // same plan to a shuffle join on (i, seg).
      blocked.repartition(32)
        .select(col("i"), col("seg"), col("doc_id").as("id1"), col("pfx").as("p1"))
        .join(broadcast(blocked.select(col("i"), col("seg"),
          col("doc_id").as("id2"), col("pfx").as("p2"))), Seq("i", "seg"))
        .filter(col("id1") < col("id2"))
        // per-char compare as 20 STATIC terms, not an `aggregate` HOF:
        // higher-order functions break whole-stage codegen and drop
        // ~1M candidate rows into interpreted lambda eval; the unrolled
        // form stays inside one codegen stage
        .withColumn("dist", (1 to plen).map(i =>
          when(substring(col("p1"), i, 1) =!= substring(col("p2"), i, 1), 1)
            .otherwise(0)).reduce(_ + _))
        .filter(col("dist") <= 3)
        .select(col("id1"), col("id2"), col("dist"))
        .distinct()
        .orderBy(col("id1"), col("id2"))
    },
    Some("""
      WITH p AS (
        SELECT doc_id, substring(lower(trim(text)), 1, 20) AS pfx
        FROM documents),
      p20 AS (SELECT * FROM p WHERE length(pfx) = 20)
      SELECT a.doc_id AS id1, b.doc_id AS id2,
        CAST(hamming(a.pfx, b.pfx) AS INT) AS dist
      FROM p20 a JOIN p20 b ON a.doc_id < b.doc_id
      WHERE hamming(a.pfx, b.pfx) <= 3
      ORDER BY id1, id2"""))

  /** Exact per-group top-k WITHOUT a window
    * ([[graft.functions.TopKByOrd]] — the bounded-heap native
    * aggregate): the rank-window form must shuffle every row of every
    * group and sort whole partitions; this keeps ≤ k rows per group in
    * each map-side partial and ships only those, turning top-3-per-
    * customer over a 100 TB fact table into a k-bounded aggregation.
    * Same deterministic order contract as the window (ord desc, ties
    * to the lowest id — the oracle IS the window form), payload rides
    * through untouched. AggregatesSpec pins heap-vs-window equality
    * under skew and the partial-merge path across partitions.
    */
  val q60 = Q("q60_topk_per_key",
    (s, dir) => {
      load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(graft.functions.GraftFunctions.topKBy(
          col("o_totalprice"), col("o_orderkey"), col("o_orderstatus"), 3).as("top"))
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "e")))
        .select(col("o_custkey"), (col("i") + 1).cast("int").as("rk"),
          col("e.ord").as("o_totalprice"), col("e.tie").as("o_orderkey"),
          col("e.payload").as("o_orderstatus"))
        .orderBy(col("o_custkey"), col("rk"))
    },
    Some("""
      WITH r AS (
        SELECT o_custkey, o_totalprice, o_orderkey, o_orderstatus,
          CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
        FROM orders)
      SELECT o_custkey, rk, o_totalprice, o_orderkey, o_orderstatus
      FROM r WHERE rk <= 3 ORDER BY o_custkey, rk"""))

  def qs: Seq[Q] = Seq(q25, q26, q27, q28, q29, q32, q33, q34, q46, q47, q52, q54, q57, q59, q60)
}
