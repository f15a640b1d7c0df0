package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Graph
import graft.queries.T._

/** Graph analytics over a co-purchase graph, plus the two interval/
  * distribution staples (bin-blocked interval join, exact equi-depth
  * histogram) that round out the relational surface.
  *
  * The graph: parts co-ordered within the same order (first three line
  * numbers, so per-order fan-out is bounded by construction — the same
  * bound holds at any scale because TPC-H-ish orders have bounded
  * lines; a skew-unbounded source would cap per-key pairs the d04 way).
  * Both engines build the identical edge set from the identical SQL, so
  * the graph itself is part of the verified surface, not fixture data.
  */
object GraphAnalytics {

  /** Undirected co-order part pairs `(a < b)`, distinct. Two shuffles:
    * the orderkey self-join (bounded per-order pairs) and the edge
    * distinct.
    */
  private def coOrderEdges(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
      .filter(col("l_linenumber") <= 3)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
  }

  private val edgeCte = """
      li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             FROM lineitem WHERE l_linenumber <= 3),
      e0 AS (SELECT DISTINCT x.pk AS a, y.pk AS b
             FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk)"""

  /** Fixed-point integer PageRank (3 iterations, damping 0.85) over the
    * symmetrized co-order graph — "which parts sit at the center of the
    * co-purchase network". Integer arithmetic end-to-end
    * ([[Graph.pageRank]]) is what makes a 3×-unrolled SQL oracle
    * hash-exact: float PageRank would drift per engine per iteration.
    */
  val q61 = Q("q61_pagerank",
    (s, dir) => {
      val e0 = coOrderEdges(s, dir)
      val e = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      Graph.pageRank(e, iterations = 3)
        .select(col("node"), col("rank").as("rank_fp"))
        .orderBy(col("node"))
    },
    Some(s"""
      WITH $edgeCte,
      e AS (SELECT a AS src, b AS dst FROM e0
            UNION ALL SELECT b, a FROM e0),
      nodes AS (SELECT DISTINCT src AS node FROM e),
      nn AS (SELECT COUNT(*) AS n FROM nodes),
      deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
      r0 AS (SELECT node, 1000000000000 // n AS rank FROM nodes CROSS JOIN nn),
      s1 AS (SELECT e.dst AS node, CAST(SUM(r.rank // d.outdeg) AS BIGINT) AS sc
             FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY 1),
      r1 AS (SELECT nodes.node,
               (15 * 1000000000000) // (100 * nn.n)
                 + CAST((85 * COALESCE(s1.sc, 0)) // 100 AS BIGINT) AS rank
             FROM nodes CROSS JOIN nn LEFT JOIN s1 ON nodes.node = s1.node),
      s2 AS (SELECT e.dst AS node, CAST(SUM(r.rank // d.outdeg) AS BIGINT) AS sc
             FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY 1),
      r2 AS (SELECT nodes.node,
               (15 * 1000000000000) // (100 * nn.n)
                 + CAST((85 * COALESCE(s2.sc, 0)) // 100 AS BIGINT) AS rank
             FROM nodes CROSS JOIN nn LEFT JOIN s2 ON nodes.node = s2.node),
      s3 AS (SELECT e.dst AS node, CAST(SUM(r.rank // d.outdeg) AS BIGINT) AS sc
             FROM e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY 1),
      r3 AS (SELECT nodes.node,
               (15 * 1000000000000) // (100 * nn.n)
                 + CAST((85 * COALESCE(s3.sc, 0)) // 100 AS BIGINT) AS rank
             FROM nodes CROSS JOIN nn LEFT JOIN s3 ON nodes.node = s3.node)
      SELECT node, rank AS rank_fp FROM r3 ORDER BY node"""))

  /** Exact triangle count by degree-ordered orientation
    * ([[Graph.triangleCount]]): wedges are enumerated over out-edges of
    * the (deg,id)-smaller endpoint only, so max wedge fan-out is O(√m)
    * regardless of degree skew. The oracle's naive id-ordered three-way
    * self-join counts the same quantity (each triangle once) — the
    * orientation is a physical strategy, not a semantic.
    */
  val q62 = Q("q62_triangle_count",
    (s, dir) => Graph.triangleCount(coOrderEdges(s, dir)),
    Some(s"""
      WITH $edgeCte,
      nodes AS (SELECT a AS node FROM e0 UNION SELECT b FROM e0)
      SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
             (SELECT COUNT(*) FROM e0) AS n_edges,
             (SELECT COUNT(*)
              FROM e0 ab JOIN e0 bc ON ab.b = bc.a
                         JOIN e0 ac ON ac.a = ab.a AND ac.b = bc.b)
               AS n_triangles"""))

  /** Batch interval join, bin-blocked: views within ±5 minutes of each
    * purchase, joined through fixed 5-minute bins (each interval spans
    * ≤ 3 bins via an in-plan `sequence` explode; each point lands in
    * exactly one bin, so the bin equi-join introduces no duplicates and
    * needs no distinct). The equi-join on `bin` is hash-partitionable —
    * the shape that survives 100 TB where a raw range-predicate join
    * would be a broadcast-nested-loop. Streaming twin:
    * [[graft.streaming.Streaming.intervalJoinStream]] (native
    * stream-stream interval join).
    */
  val q63 = Q("q63_interval_join",
    (s, dir) => {
      val binUs = 300000000L // 5 minutes in epoch micros
      val ev = load(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), epochUs(col("ts")).as("pt"))
      val v = ev.filter(col("event_type") === "view")
        .select(epochUs(col("ts")).as("vt"), col("value"))
      val pBins = p.withColumn("bin",
        explode(sequence(expr(s"(pt - $binUs) div $binUs"),
          expr(s"(pt + $binUs) div $binUs"))))
      val vBins = v.withColumn("bin", expr(s"vt div $binUs"))
      val m = pBins.join(vBins, Seq("bin"))
        .filter(col("vt") >= col("pt") - binUs && col("vt") <= col("pt") + binUs)
        .groupBy(col("p_id"))
        .agg(count(lit(1)).as("n_views"), dsum(col("value")).as("sum_value"))
      p.select(col("p_id")).join(m, Seq("p_id"), "left")
        .select(col("p_id"),
          coalesce(col("n_views"), lit(0L)).as("n_views"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy(col("p_id"))
    },
    Some("""
      WITH p AS (SELECT event_id AS p_id, epoch_us(ts) AS pt
                 FROM events WHERE event_type = 'purchase'),
      v AS (SELECT epoch_us(ts) AS vt, value
            FROM events WHERE event_type = 'view'),
      m AS (SELECT p_id, COUNT(*) AS n_views,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
            FROM p JOIN v
              ON v.vt >= p.pt - 300000000 AND v.vt <= p.pt + 300000000
            GROUP BY 1)
      SELECT p.p_id, COALESCE(m.n_views, 0) AS n_views,
             COALESCE(m.sum_value, 0.0) AS sum_value
      FROM p LEFT JOIN m USING (p_id) ORDER BY p_id"""))

  /** Exact equi-depth histogram (16 buckets per event type): NTILE over
    * the (value, event_id) total order — the unique tiebreak is what
    * makes bucket assignment engine-independent. The window partitions
    * by event_type, so depth-k histograms over many groups parallelize;
    * this is the exact twin of the mergeable KLL sketch path (t30),
    * which is the single-global-distribution answer at 100 TB.
    */
  val q64 = Q("q64_equidepth_histogram",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      load(s, dir, "events")
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("bucket", ntile(16).over(w).cast("long"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("lo"), max(col("value")).as("hi"))
        .orderBy(col("event_type"), col("bucket"))
    },
    Some("""
      SELECT event_type, CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n,
             MIN(value) AS lo, MAX(value) AS hi
      FROM (SELECT event_type, value,
              NTILE(16) OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS bucket
            FROM events) t
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Hierarchy flattening — the recursive-CTE workload, answered by
    * [[Graph.flattenHierarchy]]'s pointer doubling (⌈log₂ depth⌉
    * join rounds, one row of state per node). The synthetic forest
    * confines each tree to one aligned block of 128 ids: node
    * `b·128 + i` has parent `b·128 + i div 2` when `i ≥ 2` and is a
    * root otherwise — a depth-7 binary tree per block, built
    * identically in the oracle, whose recursive CTE walks the same
    * chains one level at a time. Blocks make the forest invariant
    * under any key shift divisible by 128 (parents never cross a
    * block boundary), so the ScaleUp substrate — replicas shifted by
    * 10M = 78125·128 — grows the node count ×N while preserving every
    * chain's shape; a derivation that contracts ids toward zero
    * (e.g. plain `id div 4`) would dangle parents outside the
    * replica's key band instead.
    */
  val q65 = Q("q65_hierarchy_flatten",
    (s, dir) => {
      val nodes = load(s, dir, "part")
        .select((col("p_partkey") + 1L).as("node"))
        .select(col("node"),
          when(expr("node % 128") >= 2L,
            expr("node - node % 128 + (node % 128) div 2")).as("parent"))
      Graph.flattenHierarchy(nodes)
        .select(col("node"), col("root"), col("depth"))
        .orderBy(col("node"))
    },
    Some("""
      WITH RECURSIVE nodes AS (
        SELECT p_partkey + 1 AS node FROM part),
      anc AS (
        SELECT node, node AS cur, CAST(0 AS BIGINT) AS depth FROM nodes
        UNION ALL
        SELECT node, cur - cur % 128 + (cur % 128) // 2, depth + 1
        FROM anc WHERE cur % 128 >= 2)
      SELECT node, cur AS root, depth FROM anc WHERE cur % 128 < 2
      ORDER BY node"""))

  def qs: Seq[Q] = Seq(q61, q62, q63, q64, q65)
}
