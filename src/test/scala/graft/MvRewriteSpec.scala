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

  test("incremental maintenance round-trip: delta-merged summary answers the refreshed base") {
    import graft.store.Store
    val tmp = java.nio.file.Files.createTempDirectory("graft_mv_incr")
    val basePath = tmp.resolve("orders").toString
    val mvPath1 = tmp.resolve("orders_monthly_v1").toString
    val mvPath2 = tmp.resolve("orders_monthly_v2").toString
    val key = date_trunc("month", col("o_orderdate")).cast("date")
    val cut = lit("1997-01-01").cast("timestamp_ntz")
    val all = spark.read.parquet(s"$dir/orders.parquet")
    def monthly(df: DataFrame) = df.groupBy(key.as("mes"))
      .agg(sum(T.dec(col("o_totalprice"))).as("total_dec"), count(lit(1)).as("n"))

    // v1: base holds only the pre-cut rows; summary maintained for them
    all.filter(col("o_orderdate") < cut).write.parquet(basePath)
    monthly(spark.read.parquet(basePath)).write.parquet(mvPath1)
    // refresh: the delta lands in the base AND folds into the summary
    // via mergeAggregates — no rescan of the maintained months
    all.filter(col("o_orderdate") >= cut).write.mode("append").parquet(basePath)
    val delta = monthly(all.filter(col("o_orderdate") >= cut))
    Store.mergeAggregates(spark.read.parquet(mvPath1), delta,
        keys = Seq("mes"), measures = Seq("total_dec", "n"))
      .write.parquet(mvPath2)

    val base = spark.read.parquet(basePath)
    MvRewrite.clear()
    MvRewrite.register("orders_monthly_incr", base,
      keys = Seq((key, "mes")),
      measures = Seq(("sum", T.dec(col("o_totalprice")), "total_dec"),
        ("count", lit(1L), "n")),
      mv = spark.read.parquet(mvPath2))
    if (!spark.experimental.extraOptimizations.contains(MvRewrite.RewriteAggregateToMv))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewrite.RewriteAggregateToMv

    def query(df: DataFrame) = df.groupBy(key.as("mes"))
      .agg(sum(T.dec(col("o_totalprice"))).cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy(col("mes"))
    val rewritten = query(base)
    assert(scanPaths(rewritten).exists(_.contains("orders_monthly_v2")),
      s"plan must read the refreshed summary: ${rewritten.queryExecution.optimizedPlan}")
    assert(rewritten.collect().toSeq ==
      query(spark.read.parquet(s"$dir/orders.parquet")).collect().toSeq,
      "delta-merged summary must equal the full recompute")
    MvRewrite.clear()
  }
}
