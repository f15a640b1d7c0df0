package graft

import org.apache.spark.sql.functions._
import graft.ops.{VectorSearch => V}
import graft.functions.{GraftFunctions => G}

/** Exactness of the unit-sphere grid cosine pair join: identical to
  * brute-force all-pairs on the same input, at several thresholds
  * (grid width depends on the threshold, so each tau exercises a
  * different cell geometry).
  */
class CosinePairsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val vecs = {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val planted = e.filter(pmod(col("vec_id"), lit(7)) === 0)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x)).as("embedding"))
    e.unionByName(planted).cache()
  }

  private def brute(minCos: Double): Set[(Long, Long)] = {
    val a = vecs.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = vecs.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    a.crossJoin(b).filter(col("id1") < col("id2"))
      .filter(G.cosineSim(col("v1"), col("v2")) >= minCos)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
  }

  for (tau <- Seq(0.99, 0.9, 0.7)) {
    test(s"grid pair join == brute force at tau=$tau") {
      val got = V.cosinePairsExact(vecs, "vec_id", "embedding", minCos = tau)
        .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
      assert(got == brute(tau))
      if (tau == 0.99) assert(got.nonEmpty) // planted pairs recovered
    }
  }

  test("gridDims=3 gives the same answer as gridDims=2") {
    val g2 = V.cosinePairsExact(vecs, "vec_id", "embedding", 0.95, gridDims = 2)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
    val g3 = V.cosinePairsExact(vecs, "vec_id", "embedding", 0.95, gridDims = 3)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
    assert(g2 == g3)
  }
}
