package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{VectorSearch => V}
import graft.functions.{GraftFunctions => G}

/** NN-descent's contract, all deterministic (rounded cosine + id
  * tie-breaks, round-seeded exploration):
  *  - CLOSURE: refining the exact kNN graph returns the exact kNN
  *    graph — nothing can displace a true top-k entry;
  *  - BRUTE-FORCE DEGENERACY: `explore >= N` puts every pair in one
  *    exploration clique, so ONE round equals the exact graph — the
  *    machinery certificate, same pattern as the suite's other
  *    degenerate twins;
  *  - MANIFOLD CONVERGENCE: on a corpus with intrinsic structure (the
  *    deterministic sin-over-id manifold — the regime real embedding
  *    corpora live in, and the paper's own evaluation regime) a sparse
  *    cell-confined init refines to near-exact in a few rounds;
  *  - ISOTROPIC HONESTY: on the isotropic testdata embeddings,
  *    propagation from a cell-exact init is EXACTLY a no-op (the init
  *    is propagation-closed), and exploration is reduced to blind
  *    sampling — the documented degeneration (no neighbor-of-neighbor
  *    signal without intrinsic structure; the same
  *    concentration-of-measure wall as cosinePairsExact's scale notes).
  */
class NnDescentSpec extends SparkSuite {
  import spark.implicits._

  /** Isotropic corpus: the driver's synthetic embeddings (500 × 64). */
  private lazy val iso = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding")).cache()

  /** Manifold corpus: 500 deterministic 16-dim points on a 1-D curve —
    * nearby ids are nearby vectors (IvfIndexSpec's construction).
    */
  private lazy val manifold = spark.range(500)
    .select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => sin(col("id") * 0.37 + i * 1.3).cast("float")).as("embedding"))
    .cache()

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

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("src_id"), col("nbr_id")).as[(Long, Long)].collect().toSet

  private def recallOf(df: org.apache.spark.sql.DataFrame,
      exact: Set[(Long, Long)]): Double =
    edgeSet(df).intersect(exact).size.toDouble / exact.size

  test("closure: refining the exact graph is a no-op (ranks included)") {
    val exact = bruteGraph(iso, 3)
    val refined = V.nnDescent(iso, "vec_id", "embedding", exact, k = 3, rounds = 2)
    val want = exact.select("src_id", "nbr_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val got = refined.select("src_id", "nbr_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("brute-force degeneracy: explore >= N reaches the exact graph in one round") {
    val cents = V.trainCentroids(iso, "vec_id", "embedding", c = 8, iters = 2)
    val init = V.knnGraph(iso, "vec_id", "embedding", cents, k = 3, nprobe = 1)
    val exact = edgeSet(bruteGraph(iso, 3))
    val mega = V.nnDescent(iso, "vec_id", "embedding", init,
      k = 3, rounds = 1, explore = 500)
    assert(recallOf(mega, exact) == 1.0)
  }

  test("manifold corpus: NN-descent converges to the EXACT graph from an empty init") {
    // the paper's regime end to end: no init graph at all — the
    // round-seeded exploration cliques provide the random seed edges
    // and descent walks the manifold, doubling each node's reach per
    // round (measured S-curve at k=5/explore=5 with the reverse-edge
    // cap: 0.94 @ r6, 0.99 @ r8, 1.0 @ r12 — the cap costs ~2 rounds
    // vs unbounded reverse edges, the paper's stated trade). Total
    // work 12·N·((2k)² + explore) proposals vs the N² brute force —
    // the trade that pays at corpus scale.
    val exactDf = bruteGraph(manifold, 5)
    val exact = edgeSet(exactDf)
    val empty = exactDf.limit(0)
    val mid = recallOf(V.nnDescent(manifold, "vec_id", "embedding", empty,
      k = 5, rounds = 5, explore = 5), exact)
    val full = recallOf(V.nnDescent(manifold, "vec_id", "embedding", empty,
      k = 5, rounds = 12, explore = 5), exact)
    assert(mid > 0.05 && mid < full,
      s"the S-curve must be in flight mid-descent (got $mid -> $full)")
    assert(full == 1.0, s"twelve rounds must reach the exact graph (got $full)")
  }

  test("isotropic corpus: cell-exact init is propagation-closed (documented degeneration)") {
    val cents = V.trainCentroids(iso, "vec_id", "embedding", c = 8, iters = 2)
    val init = V.knnGraph(iso, "vec_id", "embedding", cents, k = 3, nprobe = 1)
    val exact = edgeSet(bruteGraph(iso, 3))
    val r0 = recallOf(init, exact)
    val confined = recallOf(V.nnDescent(iso, "vec_id", "embedding", init,
      k = 3, rounds = 3, explore = 0), exact)
    // the init is exact WITHIN each Voronoi cell, so every
    // neighbor-of-neighbor proposal was already ranked — refinement
    // without exploration must change nothing, bit for bit
    assert(confined == r0,
      s"propagation from a cell-exact init must be a no-op ($r0 vs $confined)")
  }

  test("planted near-copy stays rank-1 through refinement") {
    val off = iso.agg(max(col("vec_id"))).head().getLong(0) + 1
    val planted = iso.filter(pmod(col("vec_id"), lit(7)) === 0)
      .select((col("vec_id") + off).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x)).as("embedding"))
    val all = iso.unionByName(planted).cache()
    val cents = V.trainCentroids(all, "vec_id", "embedding", c = 8, iters = 2)
    val init = V.knnGraph(all, "vec_id", "embedding", cents, k = 2, nprobe = 1)
    val refined = V.nnDescent(all, "vec_id", "embedding", init,
      k = 2, rounds = 2, explore = 3)
    val top = refined.filter(col("rank") === 1)
      .select(col("src_id"), col("nbr_id")).as[(Long, Long)].collect().toMap
    planted.select(col("vec_id")).as[Long].collect().foreach { pid =>
      assert(top.get(pid).contains(pid - off),
        s"planted $pid should rank its original ${pid - off} first after refinement")
    }
  }
}
