package graft

import org.apache.spark.sql.functions._
import graft.ops.{VectorSearch => V}

/** Batch ANN: the tree-reduction top-k must equal the naive window
  * plan, and the batched persisted-index probe must equal running the
  * single-query probe once per query.
  */
class BatchAnnSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("batchTopK equals the naive window top-k (ties included)") {
    val rng = new scala.util.Random(3)
    // deliberately coarse sims -> plenty of ties to exercise the tie-break
    val scored = Seq.tabulate(4000) { i =>
      (i % 7L, i.toLong, math.floor(rng.nextDouble() * 20) / 20.0)
    }.toDF("query_id", "vec_id", "sim").repartition(8)
    val got = V.batchTopK(scored, "query_id", "vec_id", "sim", k = 9)
      .select("query_id", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"vec_id".asc)
    val want = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 9)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == want)
  }

  test("product quantization: 32x codes, planted duplicate recovered, full-candidate degeneracy") {
    val base = emb.filter($"vec_id" =!= 0)
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("nrm", sqrt(aggregate($"v", lit(0.0d), (a, x) => a + x * x)))
      .withColumn("nv", transform($"v", x => x / $"nrm"))
    val books = V.trainPqCodebooks(base, "vec_id", "nv", m = 8, c = 16)
    assert(books.length == 8 && books.forall(_.length == 16)
      && books.forall(_.forall(_.size == 8)))

    // codes: 8 cell ids in [0, 16) — 8 bytes of information per vector
    val encoded = base.withColumn("codes", V.pqEncode($"nv", books)).cache()
    val codes = encoded.select($"codes").as[Seq[Int]].collect()
    assert(codes.forall(cs => cs.size == 8 && cs.forall(c => c >= 0 && c < 16)))

    // query = vec 0; ADC must put its near-identical planted copy first
    val q = emb.filter($"vec_id" === 0)
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("nrm", sqrt(aggregate($"v", lit(0.0d), (a, x) => a + x * x)))
      .withColumn("nv", transform($"v", x => x / $"nrm"))
      .select($"nv").head().getSeq[Double](0)
    val dup = emb.filter($"vec_id" === 0)
      .select(lit(9999L).as("vec_id"), lit("dup").as("label"),
        transform($"embedding", x => x + lit(0.001f)).as("embedding"))
    val withDup = emb.filter($"vec_id" =!= 0).unionByName(dup)
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("nrm", sqrt(aggregate($"v", lit(0.0d), (a, x) => a + x * x)))
      .withColumn("nv", transform($"v", x => x / $"nrm"))
    val lut = books.zipWithIndex.map { case (cb, i) =>
      cb.map(cent => cent.zipWithIndex.map { case (x, j) => x * q(i * 8 + j) }.sum.toDouble)
    }
    val byAdc = withDup.withColumn("codes", V.pqEncode($"nv", books))
      .withColumn("adc", V.pqScore($"codes", lut))
      .orderBy($"adc".desc).select($"vec_id").as[Long].collect()
    assert(byAdc.take(5).contains(9999L),
      s"planted duplicate not in ADC top-5: ${byAdc.take(5).toSeq}")

    // degeneracy: candidates == corpus -> PQ+re-rank == brute force
    val exact = withDup
      .withColumn("sim", aggregate(zip_with($"nv", typedlit(q), (a, b) => a * b),
        lit(0.0d), (acc, x) => acc + x))
      .orderBy($"sim".desc, $"vec_id").select($"vec_id").as[Long].collect().take(10)
    assert(exact.head == 9999L, "exact re-rank must put the duplicate first")
  }

  test("IVF-PQ persisted index: codes scan is partition-pruned, full probe == in-memory PQ") {
    val base = emb.filter($"vec_id" =!= 0)
    val cents = V.trainCentroids(base, "vec_id", "embedding", c = 8, iters = 2)
    val normBase = base
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("nrm", sqrt(aggregate($"v", lit(0.0d), (a, x) => a + x * x)))
      .withColumn("nv", transform($"v", x => x / $"nrm"))
    val books = V.trainPqCodebooks(normBase, "vec_id", "nv", m = 8, c = 16)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec")
      .resolve("index").toString
    V.buildIvfPqIndex(base, "vec_id", "embedding", cents, books, idx)
    val qv = emb.filter($"vec_id" === 0)
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("nrm", sqrt(aggregate($"v", lit(0.0d), (a, x) => a + x * x)))
      .withColumn("nv", transform($"v", x => x / $"nrm"))
      .select($"nv").head().getSeq[Double](0)
    // pruned scan: the codes read carries a cell partition filter
    val probed = V.probeIvfPqIndex(spark, idx, qv, cents, books,
      nprobe = 3, shortlist = 20, idCol = "vec_id")
    assert(probed.queryExecution.executedPlan.toString.contains("PartitionFilters: [cell#"),
      "expected a cell partition filter on the codes scan")
    // full-probe degeneracy: nprobe == C must equal the in-memory PQ
    // pipeline over the same codes (same shortlist, same sims)
    val full = V.probeIvfPqIndex(spark, idx, qv, cents, books,
        nprobe = 8, shortlist = 20, idCol = "vec_id")
      .select($"vec_id", $"sim").as[(Long, Double)].collect().toSet
    val lut = books.zipWithIndex.map { case (cb, i) =>
      cb.map(c => c.zipWithIndex.map { case (x, j) => x * qv(i * 8 + j) }.sum.toDouble)
    }
    val inMem = normBase.withColumn("codes", V.pqEncode($"nv", books))
      .withColumn("adc", V.pqScore($"codes", lut))
      .orderBy($"adc".desc, $"vec_id").limit(20)
      .withColumn("sim", round(aggregate(zip_with($"nv", typedlit(qv), (a, b) => a * b),
        lit(0.0d), (acc, x) => acc + x), 6))
      .select($"vec_id", $"sim").as[(Long, Double)].collect().toSet
    assert(full == inMem, s"persisted IVF-PQ diverged from in-memory PQ:\n$full\nvs\n$inMem")
  }

  test("batched persisted-index probe == per-query persisted probes") {
    val base = emb.filter(pmod($"vec_id", lit(10)) =!= 0)
    val cents = V.trainCentroids(base, "vec_id", "embedding", c = 8, iters = 2)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivfbatch")
      .resolve("index").toString
    V.buildIvfIndex(base, "vec_id", "embedding", cents, idx)
    val queries = emb.filter(pmod($"vec_id", lit(10)) === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    val batch = V.probeIvfIndexBatch(spark, idx, queries, "embedding",
        "query_id", cents, nprobe = 3)
      .select($"query_id", $"vec_id", $"sim")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    // the batched probe must reach the index as a PARTITION filter —
    // only the union of probed cell directories is listed and read
    val planned = V.probeIvfIndexBatch(spark, idx, queries, "embedding",
      "query_id", cents, nprobe = 3)
    assert(planned.queryExecution.executedPlan.toString.contains("PartitionFilters: [cell#"),
      "expected a cell partition filter in the batched probe plan")
    val qs = queries.as[(Long, Seq[Float])].collect()
    assert(qs.nonEmpty && batch.keySet == qs.map(_._1).toSet)
    qs.foreach { case (qid, vec) =>
      val single = V.probeIvfIndex(spark, idx,
          Seq(Tuple1(vec)).toDF("embedding"), "embedding", cents, nprobe = 3)
        .select($"vec_id", $"sim").as[(Long, Double)].collect().toSet
      assert(batch(qid) == single, s"candidate mismatch for query $qid")
    }
  }

  test("a12 recall harness: bucketed candidates, deterministic recall floor") {
    val rows = graft.queries.VectorSearch.a12
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 5)
    // every query recovers at least one true neighbor through the buckets
    assert(rows.forall(_.getAs[Long]("n_hits") >= 1))
    // ...without degenerating into brute force: candidate sets stay a
    // fraction of the 495-vector base (4-bit buckets x 3 tables)
    assert(rows.forall(_.getAs[Long]("n_candidates") <= 495 / 3))
    val mean = rows.map(_.getAs[Double]("recall_at_10")).sum / rows.length
    assert(mean >= 0.2, s"mean recall@10 $mean below deterministic floor")
  }
}
