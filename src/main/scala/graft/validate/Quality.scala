package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality certification (reference: agrobr `quality.py:82-302`):
  * completeness, whole-row duplicates, schema match, freshness and
  * value-range checks, combined into a weighted score and a
  * GOLD/SILVER/BRONZE/UNCERTIFIED level. All metrics come out of ONE
  * aggregation pass; scoring is pure column arithmetic.
  */
object Quality {

  def certify(
      df: DataFrame,
      expectedColumns: Seq[String],
      dateCol: String,
      valueCol: String,
      asOf: String,
      maxAgeDays: Int,
      minValue: Double,
      maxValue: Double,
      completenessThreshold: Double = 0.95,
      maxDupPct: Double = 0.01): DataFrame = {

    val cols = df.columns.toSeq
    val schemaOk = cols.toSet == expectedColumns.toSet

    val nonNullCells = cols.map(c => count(col(c))).reduce(_ + _)
    val base = df.agg(
      count(lit(1)).as("n_rows"),
      nonNullCells.as("non_null_cells"),
      (count(lit(1)) - countDistinct(cols.head, cols.tail: _*)).as("dup_rows"),
      max(col(dateCol).cast("date")).as("max_date"),
      sum(when(col(valueCol) < minValue || col(valueCol) > maxValue, 1L)
        .otherwise(0L)).as("range_violations"))

    val completeness = col("non_null_cells").cast("double") /
      (col("n_rows") * lit(cols.size)).cast("double")
    val dupPct = col("dup_rows").cast("double") / col("n_rows").cast("double")
    val ageDays = datediff(lit(asOf).cast("date"), col("max_date"))

    def status(passed: Column, warning: Column): Column =
      when(passed, "passed").when(warning, "warning").otherwise("failed")

    val withMetrics = base.select(
      col("n_rows"),
      completeness.as("completeness"),
      status(completeness >= completenessThreshold,
        completeness >= completenessThreshold * 0.9).as("completeness_status"),
      col("dup_rows"),
      status(dupPct <= maxDupPct, lit(false)).as("dup_status"),
      lit(if (schemaOk) "passed" else "failed").as("schema_status"),
      ageDays.cast("long").as("age_days"),
      status(ageDays <= maxAgeDays, ageDays <= maxAgeDays * 2).as("fresh_status"),
      col("range_violations"),
      status(col("range_violations") === 0, lit(false)).as("range_status"))

    val statuses = Seq("completeness_status", "dup_status", "schema_status",
      "fresh_status", "range_status").map(col)
    val nPassed = statuses.map(s => when(s === "passed", 1).otherwise(0)).reduce(_ + _)
    val nWarn = statuses.map(s => when(s === "warning", 1).otherwise(0)).reduce(_ + _)
    val nFailed = statuses.map(s => when(s === "failed", 1).otherwise(0)).reduce(_ + _)
    val score = (nPassed.cast("double") + nWarn.cast("double") * 0.5) /
      lit(statuses.size).cast("double")

    withMetrics
      .withColumn("score", score)
      .withColumn("level",
        when(col("score") >= 0.9 && nFailed === 0, "GOLD")
          .when(col("score") >= 0.7 && nFailed <= 1, "SILVER")
          .when(col("score") >= 0.5, "BRONZE")
          .otherwise("UNCERTIFIED"))
  }
}
