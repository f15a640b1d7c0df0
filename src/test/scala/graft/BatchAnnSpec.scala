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
}
