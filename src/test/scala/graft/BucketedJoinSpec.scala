package graft

import org.apache.spark.sql.functions._
import graft.store.Store

/** The point of bucketing is the PLAN: a join of two tables bucketed
  * on the join key with equal bucket counts must contain no Exchange —
  * the shuffle was paid at write time. Broadcast is disabled inside the
  * test so the sort-merge path (the 100 TB shape where neither side
  * broadcasts) is what's asserted.
  */
class BucketedJoinSpec extends SparkSuite {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed-bucketed join plans with zero exchanges and matches the plain join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    Store.writeBucketed(orders, "graft_spec_orders", s"$dir/orders", 4, "o_custkey")
    Store.writeBucketed(customer, "graft_spec_customer", s"$dir/customer", 4, "c_custkey")

    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val o = spark.table("graft_spec_orders")
      val c = spark.table("graft_spec_customer")
      val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"expected no Exchange:\n$plan")

      val got = joined.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = orders.join(customer,
          orders("o_custkey") === customer("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
    }
  }

  test("bucket pruning: equality probe on the bucket key reads one bucket") {
    withConf(
      "spark.sql.sources.bucketing.enabled" -> "true",
      // auto mode turns bucketed scans OFF when no exchange is saved;
      // force it on so the filter-pruning path is observable
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val o = spark.table("graft_spec_orders").filter(col("o_custkey") === 37L)
      val scan = o.queryExecution.executedPlan.toString
      // Spark annotates the scan with the selected-bucket count
      assert(scan.contains("Bucketed: true"), s"expected bucketed scan:\n$scan")
      assert(scan.contains("SelectedBucketsCount: 1 out of 4"),
        s"expected one pruned bucket:\n$scan")
    }
  }
}
