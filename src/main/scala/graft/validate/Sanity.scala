package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sanity validation (reference: agrobr `validators/sanity.py:24-180`):
  * per-product static value ranges plus a max-daily-change check against
  * the previous value of the same product. Batch semantics — every rule
  * is a Column expression; the change check is one lag window (a single
  * shuffle on the rule key), and flagged rows carry the names of the
  * rules they fired, like the reference's `anomalies` list.
  */
final case class SanityRule(
    minValue: Double,
    maxValue: Double,
    maxDailyChangePct: Double)

object Sanity {

  /** Flag anomalous rows. `ruleKey` selects the SanityRule (reference:
    * produto); `seriesKey` defines the previous-value series partition;
    * ordering columns define "previous". Returns only flagged rows with
    * an `anomalies` CSV column (deterministic rule order).
    */
  def flagAnomalies(
      df: DataFrame,
      rules: Map[String, SanityRule],
      ruleKey: Column,
      valueCol: Column,
      seriesKeys: Seq[Column],
      orderCols: Seq[Column]): DataFrame = {

    def perRule(f: SanityRule => Double): Column =
      rules.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
        case (acc, (k, r)) => when(ruleKey === k, lit(f(r))).otherwise(acc)
      }

    val w = Window.partitionBy(seriesKeys: _*).orderBy(orderCols: _*)
    val prev = lag(valueCol, 1).over(w)
    val chg = when(prev.isNull || prev === 0, lit(null).cast("double"))
      .otherwise(abs(valueCol - prev) / prev * 100.0)

    df.withColumn("prev_value", prev)
      .withColumn("change_pct", chg)
      .withColumn("anomalies", concat_ws(",",
        when(valueCol < perRule(_.minValue), "below_min"),
        when(valueCol > perRule(_.maxValue), "above_max"),
        when(col("change_pct") > perRule(_.maxDailyChangePct), "daily_change")))
      .filter(col("anomalies") =!= "")
  }
}
