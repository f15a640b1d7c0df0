package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{VectorSearch => V}
import graft.functions.{GraftFunctions => G}

/** Exactness and recall properties of the cell-confined kNN graph that
  * a30's C=1 oracle cannot cover: brute-force equality at nprobe=C
  * with REAL multi-cell partitions, and planted-copy rank-1 recovery
  * when probing stays sparse.
  */
class KnnGraphSpec extends SparkSuite {
  import spark.implicits._

  private lazy val vecs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding")).cache()

  private def bruteGraph(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val a = df.select(col("vec_id").as("src_id"), col("embedding").as("v1"))
    val b = df.select(col("vec_id").as("nbr_id"), col("embedding").as("v2"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("sim").desc, col("nbr_id").asc)
    a.crossJoin(b).filter(col("src_id") =!= col("nbr_id"))
      .withColumn("sim", round(G.cosineSim(col("v1"), col("v2")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src_id"), col("nbr_id"), col("sim"), col("rank"))
  }

  test("nprobe=C probes every cell: graph == brute force at real C") {
    val cents = V.trainCentroids(vecs, "vec_id", "embedding", c = 8, iters = 2)
    val got = V.knnGraph(vecs, "vec_id", "embedding", cents, k = 3, nprobe = 8)
      .select(col("src_id"), col("nbr_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    val want = bruteGraph(vecs, 3)
      .select(col("src_id"), col("nbr_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("probe forms agree: plan-reference kernel == literal argsort == broadcast-row fold") {
    // the SAME centroid array through all three forms must probe the
    // SAME cells — the production path (CellProbes kernel) is held to
    // the two independently-written sort-based baselines, tie-break
    // included (sim desc, cid desc — the reversed struct-sort order)
    val cents = V.trainCentroids(vecs, "vec_id", "embedding", c = 8, iters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cell")).as[(Long, Int)].collect()
    val kernel = rows(V.withProbedCells(vecs, "embedding", cents, nprobe = 3))
    val lit = rows(V.probedCellsLiteral(vecs, "embedding", cents, nprobe = 3))
    val join = rows(V.probedCellsJoin(vecs, "embedding", cents, nprobe = 3))
    // multiplicity AND per-row probe sets, not just global set identity
    assert(kernel.length == lit.length && kernel.length == join.length)
    def byRow(a: Array[(Long, Int)]) =
      a.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byRow(kernel) == byRow(lit))
    assert(byRow(kernel) == byRow(join))
  }

  test("planted near-copies are each other's rank-1 neighbor at sparse nprobe") {
    val off = vecs.agg(max(col("vec_id"))).head().getLong(0) + 1
    val planted = vecs.filter(pmod(col("vec_id"), lit(11)) === 0)
      .select((col("vec_id") + off).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x)).as("embedding"))
    val all = vecs.unionByName(planted)
    val cents = V.trainCentroids(all, "vec_id", "embedding", c = 8, iters = 2)
    val g = V.knnGraph(all, "vec_id", "embedding", cents, k = 1, nprobe = 2)
      .select(col("src_id"), col("nbr_id")).as[(Long, Long)].collect().toMap
    val pairs = planted.select(col("vec_id")).as[Long].collect()
    pairs.foreach { pid =>
      assert(g.get(pid).contains(pid - off),
        s"planted $pid should rank its original ${pid - off} first, got ${g.get(pid)}")
    }
  }
}
