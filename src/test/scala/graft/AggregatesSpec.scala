package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => G}

/** MisraGriesTopK — the native mergeable aggregate: the classic MG
  * guarantees must hold through Spark's partial-aggregation path
  * (update on partitions, merge across them, serialize in between).
  */
class AggregatesSpec extends SparkSuite {
  import spark.implicits._

  // skewed stream: item "h<i>" appears (20-i)*50 times, tail of singletons
  private def skewed = {
    val heavy = (0 until 20).flatMap(i => Seq.fill((20 - i) * 50)(s"h$i"))
    val tail = (0 until 3000).map(i => s"t$i")
    new scala.util.Random(7).shuffle(heavy ++ tail)
  }

  test("MG guarantees survive the distributed update/merge/serialize path") {
    val items = skewed
    val n = items.size.toLong
    val k = 50
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = items.toDF("item").repartition(16)
      .agg(G.mgTopK($"item", k).as("top"))
      .select(explode($"top").as("e"))
      .select($"e.item", $"e.est_count").as[(String, Long)].collect().toMap
    assert(got.size <= k)
    val bound = n / (k + 1)
    // guaranteed present: everything with true count > n/(k+1)
    truth.filter(_._2 > bound).keys.foreach { item =>
      assert(got.contains(item), s"$item (count ${truth(item)}) must survive")
    }
    // never overestimates; underestimates by at most the bound
    got.foreach { case (item, est) =>
      assert(est <= truth(item), s"$item overestimated: $est > ${truth(item)}")
      assert(est >= truth(item) - bound, s"$item under the MG floor")
    }
  }

  test("exact recount of MG candidates is partition-invariant") {
    val items = skewed
    def top5(parts: Int): Seq[(String, Long)] = {
      val df = items.toDF("item").repartition(parts)
      val cand = df.agg(G.mgTopK($"item", 50).as("top"))
        .select(explode($"top.item").as("item"))
      df.join(broadcast(cand), Seq("item"))
        .groupBy($"item").agg(count(lit(1)).as("freq"))
        .orderBy($"freq".desc, $"item").limit(5)
        .as[(String, Long)].collect().toSeq
    }
    assert(top5(1) == top5(16))
    assert(top5(1).map(_._1) == (0 until 5).map(i => s"h$i"))
  }

  test("mg_topk is SQL-callable via register() with a literal k") {
    graft.functions.GraftFunctions.register(spark)
    skewed.toDF("item").createOrReplaceTempView("mg_items")
    val r = spark.sql(
      "SELECT mg_topk(item, 10) AS top FROM mg_items")
      .select(explode($"top.item").as("item")).as[String].collect()
    assert(r.nonEmpty && r.contains("h0"))
  }

  // ---- TopKByOrd (bounded-heap exact per-group top-k) ----

  /** Skewed groups: group g has (g+1)*40 rows; ord collides every 4th
    * row so the tie-break path is exercised constantly.
    */
  private def topkInput = (0 until 8).flatMap { g =>
    (0 until (g + 1) * 40).map { i =>
      (g.toLong, ((i % 97) / 4 * 4).toDouble, (g * 100000 + i).toLong, s"p$g-$i")
    }
  }

  test("topk_by equals the rank-window form under skew, any partitioning") {
    val df = topkInput.toDF("g", "ord", "id", "payload")
    def viaWindow = {
      import org.apache.spark.sql.expressions.Window
      df.withColumn("rk", row_number().over(
          Window.partitionBy($"g").orderBy($"ord".desc, $"id")))
        .filter($"rk" <= 5)
        .select($"g", $"rk", $"ord", $"id", $"payload")
        .orderBy($"g", $"rk").collect().toSeq
    }
    def viaHeap(parts: Int) = df.repartition(parts, $"id")
      .groupBy($"g")
      .agg(G.topKBy($"ord", $"id", $"payload", 5).as("top"))
      .select($"g", posexplode($"top").as(Seq("i", "e")))
      .select($"g", ($"i" + 1).cast("int").as("rk"),
        $"e.ord".as("ord"), $"e.tie".as("id"), $"e.payload".as("payload"))
      .orderBy($"g", $"rk").collect().toSeq
    assert(viaHeap(1) == viaWindow, "single partition must match the window")
    assert(viaHeap(16) == viaWindow,
      "16-partition partial-merge path must match the window")
  }

  test("topk_by groups smaller than k return all rows, still ordered") {
    val df = Seq((1L, 5.0, 10L, "a"), (1L, 7.0, 11L, "b")).toDF("g", "ord", "id", "p")
    val got = df.groupBy($"g").agg(G.topKBy($"ord", $"id", $"p", 5).as("top"))
      .select(explode($"top").as("e"))
      .select($"e.ord", $"e.tie", $"e.payload").as[(Double, Long, String)]
      .collect().toSeq
    assert(got == Seq((7.0, 11L, "b"), (5.0, 10L, "a")))
  }

  test("topk_by null ord/tie rows are skipped; payload nulls survive") {
    val df = Seq[(Long, Option[Double], Option[Long], Option[String])](
      (1L, Some(3.0), Some(1L), Some("x")),
      (1L, None, Some(2L), Some("dropped")),
      (1L, Some(9.0), None, Some("dropped")),
      (1L, Some(4.0), Some(3L), None))
      .toDF("g", "ord", "id", "p")
    val got = df.groupBy($"g").agg(G.topKBy($"ord", $"id", $"p", 5).as("top"))
      .select(explode($"top").as("e"))
      .select($"e.ord", $"e.payload").as[(Double, Option[String])]
      .collect().toSeq
    assert(got == Seq((4.0, None), (3.0, Some("x"))))
  }

  test("topk_by shuffles at most k rows per group per partial (plan + math)") {
    // ObjectHashAggregate partial path: the aggregate appears in the
    // plan (not a window), and state size is bounded by construction
    val df = topkInput.toDF("g", "ord", "id", "payload").repartition(8, $"id")
    val agg = df.groupBy($"g").agg(G.topKBy($"ord", $"id", $"payload", 5).as("top"))
    val nodes = planNodes(agg).map(_.getClass.getSimpleName)
    assert(nodes.count(_ == "ObjectHashAggregateExec") >= 2,
      s"partial + final ObjectHashAggregate expected, got $nodes")
    assert(!nodes.exists(_.contains("Window")), "no window may appear")
  }
}
