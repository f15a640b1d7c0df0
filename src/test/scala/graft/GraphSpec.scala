package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Connected components vs a driver-side union-find oracle. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(v => v -> find(v)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val got = Graph.connectedComponents(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    val want = unionFind(edges.size, edges)
    assert(got == want)
  }

  test("chain of 120 nodes collapses to one component (high diameter)") {
    check((0L until 119L).map(i => (i, i + 1)))
  }

  test("forest of triangles + chains + a star, arbitrary id order") {
    val edges = Seq[(Long, Long)](
      (5, 3), (3, 9), (9, 5),          // triangle, min 3
      (100, 200), (200, 150),          // path, min 100
      (1000, 999),                     // pair
      (42, 42),                        // self-loop: ignored
      (7, 70), (7, 71), (7, 72), (70, 71)) // star with extra edge
    check(edges.filter(e => e._1 != e._2))
  }

  test("duplicate and reversed edges do not change the answer") {
    val base = Seq[(Long, Long)]((1, 2), (2, 3), (3, 4))
    val noisy = base ++ base.map(_.swap) ++ base
    val a = Graph.connectedComponents(base.toDF("u", "v")).as[(Long, Long)].collect().toMap
    val b = Graph.connectedComponents(noisy.toDF("u", "v")).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("two batches of many small components") {
    // 40 disjoint 3-cliques with shuffled ids
    val edges = (0 until 40).flatMap { c =>
      val base = c * 100L
      Seq((base + 7, base + 3), (base + 3, base + 11), (base + 11, base + 7))
    }
    check(edges)
  }

  test("nearDupClusters rolls members up under the min-id cluster") {
    val pairs = Seq((10L, 20L), (20L, 30L), (50L, 60L)).toDF("id1", "id2")
    val rows = Graph.nearDupClusters(pairs)
      .orderBy("cluster_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(rows == Seq((10L, 3L, "10,20,30"), (50L, 2L, "50,60")))
  }
}
