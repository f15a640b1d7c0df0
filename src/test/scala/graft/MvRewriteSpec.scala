package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite
import graft.queries.{StoreOps, T}

/** The MV rewrite contract: a registered summary answers matching
  * aggregates (plan scans the summary, values identical to the base
  * aggregation), and anything the summary cannot answer — filters,
  * foreign keys, unregistered measures — falls through untouched.
  */
class MvRewriteSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def scanPaths(df: DataFrame): Seq[String] =
    planNodes(df).collect { case f: FileSourceScanExec =>
      f.relation.location.rootPaths.map(_.toString)
    }.flatten

  private lazy val base: DataFrame = StoreOps.s14Setup(spark, dir)

  test("matching aggregate rewrites to the summary scan, same values") {
    def query(df: DataFrame) = df
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("mes"))
      .agg(sum(T.dec(col("o_totalprice"))).cast("double").as("total"),
        count(lit(1)).as("n"),
        min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"))
      .orderBy(col("mes"))

    val rewritten = query(base)
    assert(scanPaths(rewritten).exists(_.contains("orders_monthly")),
      s"plan must scan the summary: ${rewritten.queryExecution.optimizedPlan}")

    // ground truth without the rule: aggregate the raw parquet scan of
    // an UNREGISTERED path (the sf dir itself)
    val direct = query(spark.read.parquet(s"$dir/orders.parquet"))
    assert(scanPaths(direct).forall(p => !p.contains("orders_monthly")))
    assert(rewritten.collect().toSeq == direct.collect().toSeq)
  }

  test("a filter between aggregate and scan blocks the rewrite") {
    val filtered = base
      .filter(col("o_orderstatus") === "F")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("mes"))
      .agg(count(lit(1)).as("n"))
    assert(scanPaths(filtered).forall(p => !p.contains("orders_monthly")),
      "summary cannot answer a filtered aggregate")
  }

  test("an unregistered measure blocks the rewrite") {
    val avgQ = base
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("mes"))
      .agg(sum(col("o_custkey")).as("s")) // o_custkey sum is not maintained
    assert(scanPaths(avgQ).forall(p => !p.contains("orders_monthly")))
  }

  test("grouping outside the summary keys blocks the rewrite") {
    val byStatus = base.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    assert(scanPaths(byStatus).forall(p => !p.contains("orders_monthly")))
  }

  test("count-distinct blocks the rewrite (not algebraic)") {
    val cd = base
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("mes"))
      .agg(countDistinct(col("o_custkey")).as("n"))
    assert(scanPaths(cd).forall(p => !p.contains("orders_monthly")))
  }

  test("avg as sum/count ratio over maintained partials rewrites") {
    val ratio = base
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("mes"))
      .agg((sum(T.dec(col("o_totalprice"))).cast("double") / count(lit(1)))
        .as("avg_price"))
      .orderBy(col("mes"))
    assert(scanPaths(ratio).exists(_.contains("orders_monthly")),
      s"ratio of maintained partials must rewrite: ${ratio.queryExecution.optimizedPlan}")
    val direct = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("mes"))
      .agg((sum(T.dec(col("o_totalprice"))).cast("double") / count(lit(1)))
        .as("avg_price"))
      .orderBy(col("mes"))
    assert(ratio.collect().toSeq == direct.collect().toSeq)
  }
}
