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
    assert(hasCellPartitionFilter(probed),
      "expected a parquet scan carrying a partition filter on `cell`")
  }

  /** Structural: some parquet scan prunes directories on the `cell`
    * partition column (matches scan-node state, not plan-string
    * rendering).
    */
  private def hasCellPartitionFilter(df: org.apache.spark.sql.DataFrame): Boolean =
    planNodes(df).exists {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.partitionFilters.exists(_.references.exists(_.name == "cell"))
      case _ => false
    }

  test("filtered probe: label predicate reaches the pruned scan; planted same-label dup recovered") {
    // the metadata filter must compose into the probe: pushed to the
    // parquet scan INSIDE the surviving cell partitions, and still
    // cell-pruned (both structural facts on one plan)
    val probed = V.probeIvfIndex(spark, idx, query, "embedding", cents, nprobe = 2)
      .filter(col("label") === 3)
    assert(hasCellPartitionFilter(probed))
    assert(planNodes(probed).exists {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.dataFilters.exists(_.references.exists(_.name == "label")) &&
          s.partitionFilters.exists(_.references.exists(_.name == "cell"))
      case _ => false
    }, "expected the label predicate as a data filter on the cell-pruned scan")
    // recall: a near-copy of the query with label 3 lands in the
    // query's own cell, so even nprobe=1 must surface it as the
    // filtered top-1
    val qv = query.select(col("embedding")).as[Seq[Float]].head()
    val planted = qv.updated(0, qv.head + 0.001f)
    val idx2 = java.nio.file.Files.createTempDirectory("graft_ivff")
      .resolve("index").toString
    V.buildIvfIndex(
      base.unionByName(Seq((900001L, planted, 3))
        .toDF("vec_id", "embedding", "label")
        .select(col("vec_id"), col("embedding").cast(base.schema("embedding").dataType),
          col("label").cast("int"))),
      "vec_id", "embedding", cents, idx2)
    val top = V.probeIvfIndex(spark, idx2, query, "embedding", cents, nprobe = 1)
      .filter(col("label") === 3)
      .orderBy(col("sim").desc, col("vec_id"))
      .select(col("vec_id")).as[Long].head()
    assert(top == 900001L, "planted same-label near-dup must be the filtered top-1")
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

  // ---- production-C regime: past LiteralMaxCells the assignment must
  // be the broadcast-join argmax (constant-size plan), and everything
  // the toy-C specs prove must still hold ----

  /** 3000 deterministic 16-dim vectors (no RNG — sin over the id). */
  private lazy val big = spark.range(3000).select(col("id").as("vec_id"),
    transform(sequence(lit(0), lit(15)), i =>
      sin(col("id") * 0.7 + i * 1.3).cast("float")).as("embedding"))
    .cache()
  private lazy val bigCents =
    V.trainCentroids(big, "vec_id", "embedding", c = 256, iters = 1)

  test("C=256 assignment is a pure projection and equals both superseded forms") {
    assert(bigCents.length == 256)
    assert(bigCents.length > V.LiteralMaxCells,
      "test must exercise the production-C regime")
    val assigned = V.withNearestCell(big, "vec_id", "embedding", bigCents)
    val nodes = planNodes(assigned)
    // the plan-reference kernel needs NO join and NO exchange of any
    // kind: centroids ride inside the CellAssign expression (shipped
    // via the stage's task-binary broadcast), so assignment is a
    // projection over the scan at any C. Matched on plan-node classes,
    // not rendered strings.
    assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]),
      "cell assignment must not join")
    assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
      "cell assignment must not shuffle or broadcast a relation")
    val viaKernel = assigned.select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    // both superseded forms — the centroid-literal argmax and the
    // broadcast-row fold — are independently written paths the kernel
    // must match exactly, tie-breaks included
    val viaLiteral = big
      .withColumn("cell", V.nearestCell(col("embedding"), bigCents))
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val viaFold = V.assignCellsJoin(big, "vec_id", "embedding", bigCents)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(viaKernel == viaLiteral,
      "kernel cells must match the literal argmax (incl. tie-breaks)")
    assert(viaKernel == viaFold,
      "kernel cells must match the broadcast-row fold (incl. tie-breaks)")
    // every vector got exactly one cell, all cells in range
    assert(viaKernel.size == 3000 && viaKernel.values.forall(c => c >= 0 && c < 256))
  }

  test("C=256 persisted index: append == rebuild, full probe == brute force") {
    val query = big.filter($"vec_id" === 0)
    val base = big.filter($"vec_id" =!= 0)
    val full = java.nio.file.Files.createTempDirectory("graft_ivf256")
      .resolve("index").toString
    V.buildIvfIndex(base, "vec_id", "embedding", bigCents, full)
    val inc = java.nio.file.Files.createTempDirectory("graft_ivf256i")
      .resolve("index").toString
    V.buildIvfIndex(base.filter($"vec_id" % 2 === 0), "vec_id", "embedding",
      bigCents, inc)
    V.appendToIvfIndex(base.filter($"vec_id" % 2 =!= 0), "vec_id", "embedding",
      bigCents, inc)
    val rebuilt = V.probeIvfIndex(spark, full, query, "embedding", bigCents, 5)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSet
    val appended = V.probeIvfIndex(spark, inc, query, "embedding", bigCents, 5)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSet
    assert(appended == rebuilt,
      "append under the join-path assignment must land cells exactly as a rebuild")
    // nprobe = C degeneracy survives the production-C path
    val all = V.probeIvfIndex(spark, full, query, "embedding", bigCents, 256)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSet
    val brute = V.bruteForceTopK(base, query, "embedding", 2999)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSet
    assert(all == brute)
  }

  test("versioned index: retrain swaps atomically, old geometry stays time-travelable") {
    val root = java.nio.file.Files.createTempDirectory("graft_vivf")
      .resolve("idx").toString
    val v1 = V.initVersionedIvf(base, "vec_id", "embedding", cents, root)
    assert(v1 == 1L)
    // probes through the versioned table carry the cell partition filter
    val p1 = V.probeVersionedIvf(spark, root, query, "embedding", nprobe = 3)
    assert(hasCellPartitionFilter(p1))
    val before = p1.select("vec_id", "sim").as[(Long, Double)].collect().toSet
    // answers equal the plain persisted index under the same quantizer
    val plain = V.probeIvfIndex(spark, idx, query, "embedding", cents, 3)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSet
    assert(before == plain)
    // retrain with a DIFFERENT quantizer (more cells) and swap
    val cents2 = V.trainCentroids(base, "vec_id", "embedding", c = 12, iters = 2)
    val v2 = V.retrainVersionedIvf(spark, root, "vec_id", "embedding", cents2)
    assert(v2 == 2L)
    // full probe of the new geometry is still exhaustive-correct
    val full2 = V.probeVersionedIvf(spark, root, query, "embedding", nprobe = 12)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSet
    val brute = V.bruteForceTopK(base, query, "embedding", base.count().toInt)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSet
    assert(full2 == brute)
    // time travel: v1 probes with v1's OWN quantizer, answers unchanged
    val travel = V.probeVersionedIvf(spark, root, query, "embedding",
        nprobe = 3, version = Some(1L))
      .select("vec_id", "sim").as[(Long, Double)].collect().toSet
    assert(travel == before)
    // history shows the rebuild as a first-class commit
    val actions = graft.store.TxStore.history(spark, root)
      .select("action").as[String].collect().toSeq
    assert(actions == Seq("init", "replace"))
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
    assert(hasCellPartitionFilter(
      V.probeIvfIndex(spark, inc, query, "embedding", cents, 3)))
  }
}
