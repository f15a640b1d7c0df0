package graft

import graft.queries.QueryRegistry

/** Structural lint over EVERY registered query's physical plan: the
  * two anti-patterns that silently work at test scale and melt down at
  * 100 TB are an unkeyed CartesianProduct and an unintended
  * BroadcastNestedLoopJoin. Neither may appear anywhere — except the
  * BNLJ cases that are the DESIGN (cross joins against broadcast
  * one-row aggregates or tiny broadcast query sets), which are named
  * here explicitly so a new query can't sneak one in unreviewed.
  */
class PlanLintSpec extends SparkSuite {

  /** Queries whose plan legitimately contains a BNLJ: every one is a
    * crossJoin against a broadcast side that is one row (scalar
    * aggregates) or a bounded query set — constant fan-out, by design.
    */
  private val bnljByDesign = Set(
    "q43_funnel",            // three 1-row funnel-stage counts
    "v07_parser_consensus",  // 1-row consensus summary
    "t08_heavy_hitters",     // 1-row corpus total
    "a01_ann_bruteforce",    // broadcast 1-row query vector
    "a07_ann_batch_exact",   // broadcast bounded query set
    "a06_ann_ivf_persisted", // broadcast 1-row query against pruned cells
    "a08_ann_ivf_batch",     // broadcast bounded query set against pruned cells
    "t09_approx_percentiles", // per-lang stats rejoin (broadcast under AQE)
    "q39_salted_skew_join",  // explicit salt replication: dim × saltBuckets literals
    "t10_vocab_coverage",    // 1-row corpus total against the top-100 survivors
    "t11_rarity_score",      // 1-row doc-count total against the df table
    "a12_ann_recall",        // broadcast bounded query set (ground-truth side)
    "a16_ivf_persisted_probe_all", // a06's shape at nprobe=C (broadcast 1-row query)
    "a18_pq_shortlist_all",  // exact re-rank = a01's broadcast 1-row query
    "a19_ivfpq_probe_all",   // exact re-rank = a01's broadcast 1-row query
    "a20_recall_exact",      // a12's shape with exact candidates
    "a21_versioned_ivf_probe_all", // a06's shape over the TxStore-versioned index
    "t16_domain_mixture",    // 1-row corpus total against the per-domain stats
    "t17_bm25_score",        // 1-row N/avgdl scalars against the tf table
    "t21_lm_surprisal",      // 1-row corpus-total scalar against the token stream
    "a23_matryoshka_rerank", // broadcast 1-row query vector (a01's shape, two stages)
    "t25_dsir_resample",     // 1-row (tr, tt) corpus totals against the ≤64-row λ table
    "d15_semantic_dedup",    // 1-row max(vec_id)+1 planted-offset scalar
    "t20_compression_gate",  // 1-row max(doc_id)+1 planted-offset scalar
    "a24_neardup_full_coverage", // 1-row max(vec_id)+1 planted-offset scalar (d15's stance)
    "a03_embedding_neardups", // 1-row max(vec_id)+1 planted-offset scalar (d15's stance)
    "a05_cosine_pairs_exact", // 1-row max(vec_id)+1 planted-offset scalar (d15's stance)
    "a25_hybrid_rrf",         // t17's 1-row N/avgdl scalars (lexical side, same shape)
    "t27_bigram_surprisal",   // 1-row vocab-size scalar against the bigram stream (t21's shape)
    "m05_media_neardup",      // 1-row max(doc_id)+1 planted-offset scalar (d15's stance)
    "a31_sq8_shortlist_all",  // exact re-rank = a01's broadcast 1-row query (a18's stance)
    "a32_ivfsq_probe_all",    // exact re-rank = a01's broadcast 1-row query (a19's stance)
    "q61_pagerank",           // 1-row node-count scalar rides along every iteration
    "q62_triangle_count",     // three 1-row count aggregates assembled into one summary row
    "a33_ann_filtered"        // a16's shape: broadcast 1-row query against pruned cells
  )

  /** Queries whose plan legitimately sorts a whole frame through one
    * Window partition: every one runs over a frame already reduced to
    * metadata scale (a constant-cardinality aggregate or a local dim),
    * never over per-row data. All three now DECLARE the single
    * partition with a materialized constant key (no WindowExec WARN);
    * the lint sees through that key — see [[effectivelyGlobal]] — so
    * they still need these entries, which is the point: deliberate
    * single-partition frames stay governed here.
    */
  private val globalWindowByDesign = Set(
    "t23_sequence_packing", // cumulative base over `doc_id div 1024` block totals (corpus/1024 rows, recursable)
    "v10_dist_drift",       // proportions over the 10-bin histogram frame (groupBy least(floor/50000, 9) ⇒ ≤10 rows)
    "a26_model_auc"         // cumulative base over floor(score·1000) block totals (≤1,001 rows; per-bucket ranks then run block-parallel)
  )

  import org.apache.spark.sql.catalyst.plans.logical._

  /** Conservative "output cardinality is bounded by a constant"
    * check: true for limits, scalar aggregates, local relations, and
    * any node all of whose inputs are bounded. A parquet scan is
    * unbounded; so is anything built only from one.
    */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit | _: LocalLimit            => true
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case _: LocalRelation | _: OneRowRelation      => true
    case l: LeafNode                               => false
    case other => other.children.forall(bounded)
  }

  /** True when every partition expression of the spec is constant —
    * foldable outright, or an attribute whose defining Alias (looked
    * up through the child plan) is foldable. Partitioning by a
    * materialized constant column is the sanctioned idiom for a
    * DELIBERATE single-partition window (it silences the WindowExec
    * warning); the lint must see through it, or the idiom would be a
    * free pass around the global-window check.
    */
  private def constantPartition(
      spec: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      child: LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
    def definedFoldable(a: Attribute): Boolean =
      child.collectFirst {
        case p: Project if p.projectList.exists {
          case al: Alias => al.exprId == a.exprId
          case _         => false
        } => p.projectList.collectFirst {
          case al: Alias if al.exprId == a.exprId => al.child.foldable
        }.get
      }.getOrElse(false)
    spec.nonEmpty && spec.forall {
      case e if e.foldable => true
      case a: Attribute    => definedFoldable(a)
      case _               => false
    }
  }

  /** A Window with no partitionBy — or one partitioned only by
    * constants — funnels its entire input through ONE task (Exchange
    * → Sort → Window on a single hash bucket) — the pattern that
    * silently works at sf0.01 and serializes at 100 TB. Only allowed
    * when the input is structurally bounded (a limit or local
    * relation below it) or declared above.
    */
  private def unboundedGlobalWindows(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case w: Window if (w.partitionSpec.isEmpty ||
          constantPartition(w.partitionSpec, w.child)) && !bounded(w.child) =>
        s"global-sort Window over unbounded input: ${w.windowExpressions.map(_.name).mkString(",")}"
    }

  test("no query plans a CartesianProduct; BNLJ only where designed") {
    graft.functions.GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    QueryRegistry.all.foreach { q =>
      val qe =
        try { val e = q.fn(spark, dir).queryExecution; e.executedPlan; e }
        catch { case e: Throwable =>
          fail(s"${q.name} failed to plan: ${e.getMessage}")
        }
      val plan = qe.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"${q.name}: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljByDesign(q.name))
        offenders += s"${q.name}: undeclared BroadcastNestedLoopJoin"
      if (!globalWindowByDesign(q.name))
        unboundedGlobalWindows(qe.optimizedPlan).foreach(v =>
          offenders += s"${q.name}: $v")
    }
    assert(offenders.isEmpty,
      s"plan lint violations:\n${offenders.mkString("\n")}")
  }

  test("the global-window lint catches a planted offender") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val offender = docs.withColumn("rank",
      row_number().over(Window.orderBy(col("doc_id"))))
    assert(unboundedGlobalWindows(offender.queryExecution.optimizedPlan).nonEmpty)
    // ...the constant-partition-key idiom (the WARN-silencing form) is
    // seen through, not waved past
    val evader = docs.withColumn("_all", lit(0)).withColumn("rank",
      row_number().over(Window.partitionBy(col("_all")).orderBy(col("doc_id"))))
    assert(unboundedGlobalWindows(evader.queryExecution.optimizedPlan).nonEmpty)
    // ...a genuinely keyed window does not fire
    val keyed = docs.withColumn("rank", row_number().over(
      Window.partitionBy(col("source")).orderBy(col("doc_id"))))
    assert(unboundedGlobalWindows(keyed.queryExecution.optimizedPlan).isEmpty)
    // ...and does NOT fire once the frame is limit-bounded (t10/t25 shape)
    val boundedTopK = docs.orderBy(col("doc_id")).limit(100)
      .withColumn("rank", row_number().over(Window.orderBy(col("doc_id"))))
    assert(unboundedGlobalWindows(boundedTopK.queryExecution.optimizedPlan).isEmpty)
  }
}
