package graft

import org.apache.spark.sql.functions._
import graft.ops.{VectorSearch => V}

/** Product quantization at PRODUCTION codebook size (c=256, the
  * standard 8-bit-per-subspace PQ regime): past LiteralMaxCodebook the
  * encode must run as a broadcast join — codebooks as data, not
  * expression-tree constants — and still produce byte-identical codes,
  * and the full persisted IVF-PQ pipeline must keep its exactness
  * degeneracy (probe-all + shortlist-all == brute force).
  */
class PqSpec extends SparkSuite {
  import spark.implicits._

  /** 3000 deterministic 16-dim vectors (no RNG — sin over the id). */
  private lazy val big = spark.range(3000).select(col("id").as("vec_id"),
    transform(sequence(lit(0), lit(15)), i =>
      sin(col("id") * 0.7 + i * 1.3).cast("float")).as("embedding"))
    .cache()
  private lazy val normed = big
    .withColumn("v", $"embedding".cast("array<double>"))
    .withColumn("nrm", sqrt(aggregate($"v", lit(0.0d), (a, x) => a + x * x)))
    .filter($"nrm" > 0)
    .withColumn("nv", transform($"v", x => x / $"nrm"))
    .select($"vec_id", $"embedding", $"nv")
    .cache()
  private lazy val books =
    V.trainPqCodebooks(normed, "vec_id", "nv", m = 4, c = 256, iters = 1)

  test("c=256 encode is a pure projection and equals both superseded forms") {
    assert(books.length == 4 && books.forall(_.length == 256))
    assert(books.length * books(0).length > V.LiteralMaxCodebook,
      "test must exercise the production-codebook regime")
    val coded = V.withPqCodes(normed.select($"vec_id", $"nv"), "vec_id", "nv", books)
    val plan = coded.queryExecution.executedPlan.toString
    // the plan-reference kernel needs NO join and NO exchange: the
    // codebooks ride inside the PqEncodeCodes expression
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"PQ encode must be a pure projection, got:\n$plan")
    val viaKernel = coded.select($"vec_id", $"codes")
      .as[(Long, Seq[Int])].collect().toMap
    // both superseded forms — codebook-literal fold and broadcast-join
    // min_by — are independently written paths the kernel must match
    val viaLiteral = normed
      .withColumn("codes", V.pqEncode($"nv", books))
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    val viaJoin = V.pqCodesJoin(normed.select($"vec_id", $"nv"), "vec_id", "nv", books)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    assert(viaKernel == viaLiteral,
      "kernel codes must match the literal encode (incl. tie-breaks)")
    assert(viaKernel == viaJoin,
      "kernel codes must match the broadcast-join encode (incl. tie-breaks)")
    assert(viaKernel.size == 3000 &&
      viaKernel.values.forall(cs => cs.size == 4 && cs.forall(c => c >= 0 && c < 256)))
  }

  test("C=256 cells x c=256 codebooks persisted IVF-PQ: probe-all degeneracy holds") {
    val cents = V.trainCentroids(big, "vec_id", "embedding", c = 256, iters = 1)
    val base = big.filter($"vec_id" =!= 0)
    val idx = java.nio.file.Files.createTempDirectory("graft_pq256")
      .resolve("index").toString
    V.buildIvfPqIndex(base, "vec_id", "embedding", cents, books, idx)
    val qv = normed.filter($"vec_id" === 0).select($"nv").head().getSeq[Double](0)
    // probe every cell with an all-rows shortlist: exact brute force
    val got = V.probeIvfPqIndex(spark, idx, qv, cents, books,
        nprobe = 256, shortlist = 2999, idCol = "vec_id")
      .orderBy($"sim".desc, $"vec_id").limit(10)
      .select($"vec_id").as[Long].collect().toSeq
    val brute = V.bruteForceTopK(base, big.filter($"vec_id" === 0), "embedding", 10)
      .orderBy($"sim".desc, $"vec_id").limit(10)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got == brute,
      s"probe-all IVF-PQ must equal brute-force top-10: $got vs $brute")
  }
}
