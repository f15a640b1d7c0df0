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

  def qs: Seq[Q] = Seq(q25)
}
