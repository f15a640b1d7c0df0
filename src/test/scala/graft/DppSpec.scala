package graft

import org.apache.spark.sql.functions._

/** Dynamic partition pruning: when a partitioned fact table is joined
  * to a filtered dim, the partition filter is only known at RUNTIME
  * (it comes out of the dim scan) — Spark must inject a dynamic
  * pruning subquery into the fact scan so only matching partition
  * directories are read. At 100 TB this is the difference between
  * scanning one year and scanning the decade; the engine's partitioned
  * layouts (TxStore partitioned commits, IVF cell partitions) rely on
  * it, so pin the behavior here.
  */
class DppSpec extends SparkSuite {
  import spark.implicits._

  test("join to a filtered dim injects a dynamic pruning subquery on the fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp")
      .resolve("fact").toString
    val fact = (1L to 4000L)
      .map(i => (i, 1992 + (i % 8).toInt, i * 1.5))
      .toDF("k", "year_part", "v")
    fact.write.partitionBy("year_part").parquet(dir)
    // dim must be a real source (a LocalRelation folds the filter away
    // and DPP then sees no selective predicate on the filtering side)
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp")
      .resolve("dim").toString
    Seq((1995, "keep"), (1996, "keep"), (2050, "absent"))
      .toDF("year_part", "tag").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)

    // the cost model compares scan bytes saved vs subquery overhead —
    // meaningless at unit-test sizes, so pin the decision, not the
    // estimate (column stats don't exist without ANALYZE here)
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "100.0")
    val joined = spark.read.parquet(dir)
      .join(dim.filter($"tag" === "keep"), Seq("year_part"))
    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.unset(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic pruning subquery in:\n$plan")

    // semantics: only the two matching partitions' rows survive
    val got = joined.agg(count(lit(1)), countDistinct($"year_part"))
      .as[(Long, Long)].head()
    val want = fact.filter($"year_part".isin(1995, 1996)).count()
    assert(got == ((want, 2L)))
    assert(want == 1000L)
  }
}
