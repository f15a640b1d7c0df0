package graft

import org.apache.spark.sql.functions._
import graft.ops.{VectorSearch => V}

/** Persisted IVF index: probes must be PARTITION-pruned reads, and the
  * persisted path must return exactly the in-query path's candidates.
  */
class IvfIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val e = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
  private lazy val base = e.filter(col("vec_id") =!= 0)
  private lazy val query = e.filter(col("vec_id") === 0)
  private lazy val cents =
    V.trainCentroids(base, "vec_id", "embedding", c = 8, iters = 2)
  private lazy val idx = {
    val p = java.nio.file.Files.createTempDirectory("graft_ivfspec")
      .resolve("index").toString
    V.buildIvfIndex(base, "vec_id", "embedding", cents, p)
    p
  }

  test("probe plans a partition filter on cell (directory pruning)") {
    val probed = V.probeIvfIndex(spark, idx, query, "embedding", cents, nprobe = 2)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell#"),
      s"expected a cell partition filter in:\n$plan")
  }

  test("persisted probe == in-query probe, cell partitions on disk") {
    val dirs = new java.io.File(idx).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell=")).sorted
    assert(dirs.length > 1, s"expected multiple cell partitions, got ${dirs.toSeq}")
    for (np <- Seq(2, 8)) { // partial probe and the full-probe degeneracy
      val persisted = V.probeIvfIndex(spark, idx, query, "embedding", cents, np)
        .select("vec_id", "sim").as[(Long, Double)].collect().toSet
      val inQuery = V.ivfCandidates(base, query, "embedding", cents, np)
        .select("vec_id", "sim").as[(Long, Double)].collect().toSet
      assert(persisted == inQuery, s"nprobe=$np mismatch")
    }
    // nprobe = C degenerates to exact brute force
    val full = V.probeIvfIndex(spark, idx, query, "embedding", cents, 8)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSet
    val brute = V.bruteForceTopK(base, query, "embedding", base.count().toInt)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSet
    assert(full == brute)
  }

  test("incremental append under the same quantizer == full rebuild") {
    // day 0: index over the first half; day 1: append the rest
    val day0 = base.filter($"vec_id" % 2 === 0)
    val day1 = base.filter($"vec_id" % 2 =!= 0)
    val inc = java.nio.file.Files.createTempDirectory("graft_ivfinc")
      .resolve("index").toString
    V.buildIvfIndex(day0, "vec_id", "embedding", cents, inc)
    val before = V.probeIvfIndex(spark, inc, query, "embedding", cents, 3)
      .select("vec_id").as[Long].collect().toSet
    V.appendToIvfIndex(day1, "vec_id", "embedding", cents, inc)

    val appended = V.probeIvfIndex(spark, inc, query, "embedding", cents, 3)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSet
    val rebuilt = V.probeIvfIndex(spark, idx, query, "embedding", cents, 3)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSet
    assert(appended == rebuilt,
      "append must land each new vector in the same cell a rebuild would")
    // resident vectors were never rewritten, only extended
    assert(before.subsetOf(appended.map(_._1)))
    // probes stay partition-pruned after the append
    val plan = V.probeIvfIndex(spark, inc, query, "embedding", cents, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell#"))
  }
}
