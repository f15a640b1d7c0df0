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

  test("AQE splits a skewed join partition at runtime (the automatic twin of q39's salting)") {
    val base = java.nio.file.Files.createTempDirectory("graft_skewaqe")
    val factDir = base.resolve("fact").toString
    val dimDir = base.resolve("dim").toString
    // 95% of rows share key 0 -> one shuffle partition dwarfs the rest
    (1L to 60000L).map(i => (if (i % 20 == 0) i % 7 else 0L, i * 1.0))
      .toDF("k", "v").write.parquet(factDir)
    (0L until 7L).map(i => (i, s"d$i")).toDF("k", "tag").write.parquet(dimDir)
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = spark.read.parquet(factDir)
        .join(spark.read.parquet(dimDir), Seq("k"))
      // act on THIS dataset's own queryExecution (count() would plan a
      // new query and leave this one unfinalized)
      assert(joined.collect().length == 60000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split join in the final adaptive plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter is injected on the probe side of a selective shuffle join") {
    val base = java.nio.file.Files.createTempDirectory("graft_bloom")
    val factDir = base.resolve("fact").toString
    val dimDir = base.resolve("dim").toString
    (1L to 50000L).map(i => (i % 997, i * 1.0)).toDF("k", "v")
      .write.parquet(factDir)
    (0L until 997L).map(i => (i, if (i % 100 == 0) "keep" else "drop"))
      .toDF("k", "tag").write.parquet(dimDir)
    // non-partitioned fact + non-broadcast join: the only runtime
    // pruning available is a bloom filter on the probe side, built
    // from the filtered dim keys during the shuffle. Thresholds are
    // byte-based cost guesses — pin them open at unit-test sizes.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100000MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = spark.read.parquet(factDir)
        .join(spark.read.parquet(dimDir).filter($"tag" === "keep"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom"),
        s"expected a runtime bloom filter in:\n$plan")
      // 10 surviving dim keys x ~50 fact rows each
      assert(joined.count() == (1L to 50000L).count(i => (i % 997) % 100 == 0 && (i % 997) < 997))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
