package graft.validate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pluggable semantic-rule engine (reference: agrobr
  * `validators/semantic.py:23-381`). A rule either contributes a fused
  * aggregate expression (all such rules cost ONE shared table scan) or,
  * when it needs its own shape (windows over a different key), a
  * standalone single-row check. The runner unions everything into a
  * (rule_name, severity, violations, passed) report.
  */
sealed trait SemanticRule { def name: String; def severity: String }

/** A rule expressible as a violation-counting aggregate — fused with all
  * other AggRules into one pass.
  */
final case class AggRule(name: String, severity: String, violations: Column)
    extends SemanticRule

/** A rule needing its own plan (e.g. a lag window); must return a
  * single-row DataFrame with one `violations` BIGINT column.
  */
final case class PlanRule(name: String, severity: String, check: DataFrame => DataFrame)
    extends SemanticRule

object Semantic {

  /** Run all rules; one scan for every AggRule plus one plan per
    * PlanRule. Output is deterministic (sorted by rule name).
    */
  def validate(df: DataFrame, rules: Seq[SemanticRule]): DataFrame = {
    val aggRules = rules.collect { case r: AggRule => r }
    val planRules = rules.collect { case r: PlanRule => r }

    val aggReport: Option[DataFrame] =
      if (aggRules.isEmpty) None
      else {
        val aggd = df.agg(
          aggRules.head.violations.as("c0"),
          aggRules.tail.zipWithIndex.map { case (r, i) =>
            r.violations.as(s"c${i + 1}") }: _*)
        val stacked = aggRules.zipWithIndex.map { case (r, i) =>
          s"'${r.name}', '${r.severity}', c$i"
        }.mkString(", ")
        Some(aggd.select(expr(
          s"stack(${aggRules.size}, $stacked) AS (rule_name, severity, violations)")))
      }

    val planReports = planRules.map { r =>
      r.check(df).select(lit(r.name).as("rule_name"),
        lit(r.severity).as("severity"), col("violations"))
    }

    (aggReport.toSeq ++ planReports)
      .reduce(_ unionByName _)
      .withColumn("passed", col("violations") === 0L)
      .orderBy(col("rule_name"))
  }

  /** Default rules for a (key, ts, value) event series — the engine
    * analogue of the reference's six default price-series rules.
    */
  def eventSeriesRules(
      userKey: Column = col("user_id"),
      tsCol: Column = col("ts"),
      valueCol: Column = col("value")): Seq[SemanticRule] = Seq(
    AggRule("value_positive", "error",
      sum(when(valueCol <= 0, 1L).otherwise(0L))),
    AggRule("value_not_null", "error",
      sum(when(valueCol.isNull, 1L).otherwise(0L))),
    PlanRule("daily_variation_gt_100pct", "warning", { df =>
      val w = Window.partitionBy(userKey).orderBy(tsCol, col("event_id"))
      val prev = lag(valueCol, 1).over(w)
      df.withColumn("pct",
          when(prev.isNull || prev === 0, lit(null).cast("double"))
            .otherwise(abs((valueCol - prev) / prev * 100.0)))
        .agg(sum(when(col("pct") > 100.0, 1L).otherwise(0L)).as("violations"))
    }),
    PlanRule("date_gap_gt_2d", "warning", { df =>
      val days = df.select(userKey.as("k"), tsCol.cast("date").as("d")).distinct()
      val w = Window.partitionBy(col("k")).orderBy(col("d"))
      days.withColumn("gap", datediff(col("d"), lag(col("d"), 1).over(w)))
        .agg(sum(when(col("gap") > 2, 1L).otherwise(0L)).as("violations"))
    }))
}
