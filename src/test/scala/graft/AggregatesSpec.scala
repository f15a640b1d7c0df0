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
}
