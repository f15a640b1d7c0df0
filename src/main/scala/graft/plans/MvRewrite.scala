package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, ExprId, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view rewrite: the QUERY-side half of aggregate
  * maintenance. [[graft.store.Store.mergeAggregates]] (s07) keeps a
  * summary table incrementally up to date; this optimizer rule makes
  * queries USE it — an `Aggregate` whose scan is a registered base
  * table, whose grouping keys are a subset of the summary's keys, and
  * whose aggregates are algebraic rollups (SUM/COUNT/MIN/MAX) of the
  * summary's partials is rewritten to aggregate the summary instead.
  * At 100 TB that turns a full fact-table scan into a read of a table
  * ~|distinct keys| in size; semantics are unchanged (SUM of partial
  * SUMs, SUM of partial COUNTs, MIN of MINs, MAX of MAXs — the
  * classic algebraic-aggregate decomposition).
  *
  * Matching is syntactic over NORMALIZED expressions: attribute leaves
  * are replaced by lower-cased unresolved names, so registration-time
  * and query-time plans compare equal across their differing exprIds.
  * Only plain scans (optionally under a pruning/grouping `Project`)
  * rewrite — any `Filter` between the aggregate and the scan blocks
  * the rewrite, because the summary cannot answer it. The rewritten
  * aggregate re-uses the ORIGINAL output exprIds (aliases pinned), so
  * parent operators resolve untouched; types are cast back where the
  * rollup widens (decimal SUM-of-SUMs). Registered via
  * `spark.experimental.extraOptimizations` (session-scoped, runs after
  * the standard batches) or [[graft.functions.GraftExtensions]].
  *
  * Reference materializes per-dataset monthly rollups as cached
  * tables (`cache/store.py` read-through); the rewrite is the engine
  * formalization: queries keep targeting the fact table and the
  * optimizer proves when the rollup answers them.
  */
object MvRewrite {

  /** One algebraic measure of a registered summary: `fn` ∈
    * {sum, min, max, count}, `exprSql` the normalized base-side
    * expression it aggregates ("" for count), `mvCol` the summary
    * column holding the partial.
    */
  case class Measure(fn: String, exprSql: String, mvCol: String)

  /** A registered summary: base scan path, normalized key exprs →
    * summary key columns, measures, and the summary's analyzed plan.
    */
  case class MvDef(
      name: String,
      basePath: String,
      keys: Seq[(String, String)], // (normalized key exprSql, mv column)
      measures: Seq[Measure],
      mv: LogicalPlan)

  private val defs = mutable.ArrayBuffer.empty[MvDef]

  def clear(): Unit = synchronized { defs.clear() }

  /** Register a summary for the plain file scan `base`. `keys` /
    * `measures` take the SAME Column expressions queries use; each is
    * resolved against `base` through the normal analyzer (so both
    * sides of the later comparison went through identical resolution)
    * and then attribute-normalized. Measure fn "count" ignores its
    * Column.
    */
  def register(name: String, base: DataFrame,
      keys: Seq[(Column, String)],
      measures: Seq[(String, Column, String)],
      mv: DataFrame): Unit = synchronized {
    val path = (base.queryExecution.analyzed match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) => rootPath(fs)
      case _ => None
    }).getOrElse(throw new IllegalArgumentException(
      "MV base must be a single-root-path file scan"))
    def resolvedSql(c: Column): String =
      base.select(c.as("__mv_expr")).queryExecution.analyzed match {
        case Project(Seq(al: Alias), _) => normSql(al.child)
        case other => throw new IllegalStateException(
          s"unexpected shape resolving MV expression: $other")
      }
    val keyDefs = keys.map { case (c, mvCol) => (resolvedSql(c), mvCol) }
    val ms = measures.map { case (fn, c, mvCol) =>
      require(Seq("sum", "min", "max", "count").contains(fn),
        s"unsupported MV measure fn: $fn")
      val sql = if (fn == "count") "" else resolvedSql(c)
      Measure(fn, sql, mvCol)
    }
    // re-registration REPLACES: after an incremental refresh the new
    // summary version supersedes the old one for the same name/base
    defs.filterInPlace(d => d.name != name && d.basePath != path)
    defs += MvDef(name, path, keyDefs, ms, mv.queryExecution.analyzed)
  }

  def registered: Seq[MvDef] = synchronized { defs.toSeq }

  private def normPath(p: String): String =
    p.stripSuffix("/").replaceFirst("^file:", "")

  /** Normalize an expression for cross-plan comparison: every
    * attribute leaf becomes a lower-cased unresolved name; unresolved
    * leaves (registration-side Columns) likewise. Compared via `.sql`.
    */
  private def normSql(e: Expression): String = e.transformUp {
    case a: AttributeReference => UnresolvedAttribute(a.name.toLowerCase)
    case u: UnresolvedAttribute => UnresolvedAttribute(u.name.toLowerCase)
  }.sql

  /** The scan under an aggregate, if it is rewrite-safe: a bare
    * `LogicalRelation` over one root path, or one wrapped in a single
    * `Project` whose list is attributes/aliases over the relation
    * (column pruning + pulled-out grouping expressions). Returns the
    * path and the substitution map exprId → normalized expression.
    */
  private def matchScan(plan: LogicalPlan): Option[(String, Map[ExprId, Expression])] =
    plan match {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        rootPath(fs).map { p =>
          (p, lr.output.map(a =>
            a.exprId -> (UnresolvedAttribute(a.name.toLowerCase): Expression)).toMap)
        }
      case Project(projList, lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)) =>
        rootPath(fs).flatMap { p =>
          val base = lr.output.map(a =>
            a.exprId -> (UnresolvedAttribute(a.name.toLowerCase): Expression)).toMap
          val sub = mutable.Map.empty[ExprId, Expression] ++ base
          var ok = true
          projList.foreach {
            case a: AttributeReference => if (!base.contains(a.exprId)) ok = false
            case al @ Alias(child, _) =>
              val t = child.transformUp {
                case ar: AttributeReference =>
                  base.getOrElse(ar.exprId, { ok = false; ar })
              }
              sub.update(al.exprId, t)
            case _ => ok = false
          }
          if (ok) Some((p, sub.toMap)) else None
        }
      case _ => None
    }

  private def rootPath(fs: HadoopFsRelation): Option[String] =
    fs.location.rootPaths match {
      case Seq(p) => Some(normPath(p.toString))
      case _ => None
    }

  /** The optimizer rule. Installed session-wide; a no-op unless a
    * registered base path appears under an Aggregate.
    */
  object RewriteAggregateToMv extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (MvRewrite.registered.isEmpty) return plan
      plan.transform {
        case agg @ Aggregate(_, _, child, _) =>
          matchScan(child).flatMap { case (path, sub) =>
            MvRewrite.registered.find(_.basePath == path)
              .flatMap(d => tryRewrite(agg, sub, d))
          }.getOrElse(agg)
      }
    }

    private def norm(e: Expression, sub: Map[ExprId, Expression]): Option[String] = {
      var complete = true
      val t = e.transformUp {
        case ar: AttributeReference =>
          sub.get(ar.exprId) match {
            case Some(r) => r
            case None => complete = false; ar
          }
      }
      if (complete) Some(t.sql) else None
    }

    private def tryRewrite(agg: Aggregate, sub: Map[ExprId, Expression],
        d: MvDef): Option[LogicalPlan] = {
      val mvAttr: Map[String, AttributeReference] =
        d.mv.output.map(a => a.name.toLowerCase -> a.asInstanceOf[AttributeReference]).toMap
      val keyBySql = d.keys.toMap

      def keyAttr(e: Expression): Option[AttributeReference] =
        norm(e, sub).flatMap(keyBySql.get).flatMap(c => mvAttr.get(c.toLowerCase))

      /** The MV-side rollup of one aggregate call, cast back to the
        * original type where the re-aggregation widens (decimal
        * SUM-of-SUMs); None if the summary lacks the measure.
        */
      def rollup(ae: AggregateExpression): Option[Expression] = {
        if (ae.filter.nonEmpty || ae.isDistinct) return None
        val hit = ae.aggregateFunction match {
          case s: Sum => norm(s.child, sub).flatMap(sql =>
            d.measures.find(m => m.fn == "sum" && m.exprSql == sql))
          case Count(Seq(Literal(_, _))) =>
            d.measures.find(_.fn == "count")
          case m: Min => norm(m.child, sub).flatMap(sql =>
            d.measures.find(mm => mm.fn == "min" && mm.exprSql == sql))
          case m: Max => norm(m.child, sub).flatMap(sql =>
            d.measures.find(mm => mm.fn == "max" && mm.exprSql == sql))
          case _ => None
        }
        hit.flatMap(m => mvAttr.get(m.mvCol.toLowerCase)).map { a =>
          val rolled: Expression = m2fn(hit.get.fn, a)
          if (rolled.dataType == ae.dataType) rolled
          else Cast(rolled, ae.dataType)
        }
      }

      def m2fn(fn: String, a: AttributeReference): Expression = fn match {
        case "sum" | "count" => Sum(a).toAggregateExpression()
        case "min" => Min(a).toAggregateExpression()
        case "max" => Max(a).toAggregateExpression()
      }

      // every grouping expression must be one of the summary's keys
      val newGroupOpt = agg.groupingExpressions.map(keyAttr)
      if (newGroupOpt.exists(_.isEmpty)) return None
      val newGroup = newGroupOpt.map(_.get)

      // each output is either a grouping key (pin its exprId onto the
      // MV attribute) or a scalar expression over rewritable aggregate
      // calls (replace each call with its rollup, keep the scalar
      // shell — covers sum(..).cast(..), sum/count ratios, etc.)
      val newAggs = agg.aggregateExpressions.map {
        case ar: AttributeReference =>
          keyAttr(ar).map(mva => Alias(mva, ar.name)(exprId = ar.exprId))
            .getOrElse(return None)
        case al @ Alias(child, name)
            if child.exists(_.isInstanceOf[AggregateExpression]) =>
          var ok = true
          val newChild = child.transformUp {
            case ae: AggregateExpression =>
              rollup(ae).getOrElse { ok = false; ae }
          }
          if (!ok) return None
          Alias(newChild, name)(exprId = al.exprId)
        case al @ Alias(child, name) =>
          keyAttr(child).map(mva => Alias(mva, name)(exprId = al.exprId))
            .getOrElse(return None)
        case _ => return None
      }
      Some(Aggregate(newGroup, newAggs, d.mv))
    }
  }
}
