package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, KllBuffer}

/** Contract of the KLL-style quantile sketch: exact while n ≤ k (the
  * regime t30's oracle checks), merge ≡ concat in that regime, bounded
  * rank error once compacting, and survival of the distributed
  * serialize/merge path.
  */
class KllQuantilesSpec extends SparkSuite {
  import spark.implicits._

  private val probs = Seq(0.0, 0.25, 0.5, 0.75, 1.0)

  /** Deterministic pseudo-random stream (LCG — no Math.random). */
  private def stream(n: Int, seed: Long = 42L): Array[Double] = {
    var x = seed
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 11).toDouble
    }
  }

  private def exactQuantiles(vs: Array[Double], ps: Seq[Double]): Seq[Double] = {
    val sorted = vs.sorted
    ps.map { p =>
      val target = math.max(1L, math.ceil(p * sorted.length).toLong)
      sorted((target - 1).toInt)
    }
  }

  test("exact regime: n <= k reproduces rank-selection quantiles") {
    val vs = stream(500)
    val buf = new KllBuffer(1024)
    vs.foreach(buf.add)
    assert(buf.quantiles(probs).toSeq == exactQuantiles(vs, probs))
  }

  test("exact regime: merge of disjoint buffers == one buffer over the concat") {
    val vs = stream(800)
    val (a, b) = vs.splitAt(300)
    val bufA = new KllBuffer(1024); a.foreach(bufA.add)
    val bufB = new KllBuffer(1024); b.foreach(bufB.add)
    bufA.merge(bufB)
    val whole = new KllBuffer(1024); vs.foreach(whole.add)
    assert(bufA.quantiles(probs).toSeq == whole.quantiles(probs).toSeq)
  }

  test("sketchy regime: rank error within ~3% of n for k=256") {
    val n = 100000
    val vs = stream(n)
    val buf = new KllBuffer(256)
    vs.foreach(buf.add)
    val sorted = vs.sorted
    val ests = buf.quantiles(Seq(0.25, 0.5, 0.75, 0.9))
    Seq(0.25, 0.5, 0.75, 0.9).zip(ests).foreach { case (p, est) =>
      val target = math.ceil(p * n).toLong
      // true rank of the estimate = #values <= est
      var lo = 0; var hi = sorted.length
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (sorted(mid) <= est) lo = mid + 1 else hi = mid
      }
      val err = math.abs(lo - target).toDouble / n
      assert(err <= 0.03, s"p=$p: rank err $err (est=$est)")
    }
  }

  test("state stays O(k): 100k inserts never exceed ~3k stored items for k=256") {
    val buf = new KllBuffer(256)
    stream(100000).foreach(buf.add)
    val stored = buf.levels.map(_.length).sum
    assert(stored <= 3 * 256, s"stored $stored items")
    assert(buf.n == 100000L)
  }

  test("distributed path: partitioned aggregate matches single-partition, exact regime") {
    val vs = stream(2000)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toSeq.toDF("id", "v")
    val dist = df.repartition(8, col("id"))
      .agg(GraftFunctions.kllQuantiles(col("v"), 4096, probs).as("q"))
      .head().getSeq[Double](0)
    assert(dist == exactQuantiles(vs, probs),
      "serialize/merge across partitions must stay exact while n <= k")
  }

  test("SQL registration: kll_quantiles(v, k) yields quartiles") {
    val vs = stream(100)
    vs.toSeq.toDF("v").createOrReplaceTempView("kll_in")
    val out = spark.sql("SELECT kll_quantiles(v, 512) AS q FROM kll_in")
      .head().getSeq[Double](0)
    assert(out == exactQuantiles(vs, Seq(0.25, 0.5, 0.75)))
  }

  test("state forms: persisted per-shard sketches re-merge to the whole, exact regime") {
    val vs = stream(1200)
    val df = vs.zipWithIndex.map { case (v, i) => (i % 3, v) }
      .toSeq.toDF("shard", "v")
    // shard-wise STATE sketches (what a 100 TB pipeline persists)...
    val shards = df.groupBy(col("shard"))
      .agg(GraftFunctions.kllSketchAgg(col("v"), 4096).as("sk"))
    // ...merged later without re-reading the data
    val merged = shards
      .agg(GraftFunctions.kllMergeAgg(col("sk")).as("sk"))
      .select(GraftFunctions.kllSketchQuantiles(col("sk"), probs).as("q"))
      .head().getSeq[Double](0)
    assert(merged == exactQuantiles(vs, probs))
  }

  test("streaming quantile sink: live merged state == batch quantiles; replay is fenced") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("kll_sink").toString
    val vs = stream(900)
    val rows = vs.zipWithIndex.map { case (v, i) => (s"k${i % 2}", v) }.toSeq
    val (h1, h2) = rows.splitAt(rows.length / 2)
    val in = MemoryStream[(String, Double)]
    val q = graft.streaming.Streaming.quantileSink(
      in.toDF().toDF("key", "v"), "key", "v",
      path = root, checkpoint = root + "_ckpt", k = 4096)
    try {
      in.addData(h1: _*); q.processAllAvailable()
      in.addData(h2: _*); q.processAllAvailable()
    } finally q.stop()
    val live = graft.streaming.Streaming.quantileEstimates(spark, root, probs)
      .select(col("key"), col("quantiles")).as[(String, Seq[Double])]
      .collect().toMap
    val expected = rows.groupBy(_._1).map { case (k, kv) =>
      k -> exactQuantiles(kv.map(_._2).toArray, probs).toSeq
    }
    assert(live == expected, s"live $live vs expected $expected")
    // KLL merge is NOT idempotent — the batch-id fence must drop a replay
    graft.streaming.Streaming.kllMergeBatch(
      h2.toDF("key", "v"), 1L, "key", "v", root, 4096)
    val replayed = graft.streaming.Streaming.quantileEstimates(spark, root, probs)
      .select(col("key"), col("quantiles")).as[(String, Seq[Double])]
      .collect().toMap
    assert(replayed == live, "replayed batch must be fenced, not re-merged")
    // a NEW batch id past the pointer does merge (the fence is not a wall)
    graft.streaming.Streaming.kllMergeBatch(
      Seq(("k0", 1.0)).toDF("key", "v"), 50L, "key", "v", root, 4096)
    val after = graft.streaming.Streaming.quantileEstimates(spark, root, probs)
      .select(col("key"), col("quantiles")).as[(String, Seq[Double])]
      .collect().toMap
    assert(after("k0") != live("k0"), "new batch past the fence must merge")
  }

  test("nulls are skipped, empty input yields NaNs") {
    val df = Seq[(Long, Option[Double])]((1L, Some(5.0)), (2L, None), (3L, Some(1.0)))
      .toDF("id", "v")
    val q = df.agg(GraftFunctions.kllQuantiles(col("v"), 64, Seq(0.5)).as("q"))
      .head().getSeq[Double](0)
    assert(q == Seq(1.0)) // median of {1,5} at ceil(.5*2)=1 -> first
    val empty = df.filter(col("id") < 0)
      .agg(GraftFunctions.kllQuantiles(col("v"), 64, Seq(0.5)).as("q"))
      .head().getSeq[Double](0)
    assert(q.length == 1 && empty.forall(_.isNaN))
  }
}
