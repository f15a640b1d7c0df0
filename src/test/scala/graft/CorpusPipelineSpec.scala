package graft

import org.apache.spark.sql.functions._
import graft.api.Graft
import graft.functions.{GraftFunctions => G}

/** End-to-end curation pipeline — the composed form of the verbs a
  * training-data engineer would chain: quality gate → exact dedup →
  * near-dup cluster collapse → stratified downsample → token budget
  * packing. Asserts the corpus shrinks at each stage for the right
  * reasons, the output is deterministic across runs, and no duplicate
  * survives.
  */
class CorpusPipelineSpec extends SparkSuite {
  import spark.implicits._

  private val stop = Seq("the", "and", "is", "of", "to", "in", "a", "for", "on", "with")

  private def corpus() = {
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    // plant exact dups (case/space) and a near-dup chain, as the d-family does
    val exact = d.filter(pmod($"doc_id", lit(7)) === 0)
      .select(($"doc_id" + 10000).as("doc_id"),
        concat(lit(" "), upper($"text"), lit(" ")).as("text"), $"lang")
    val near = d.filter(pmod($"doc_id", lit(11)) === 0)
      .select(($"doc_id" + 20000).as("doc_id"),
        concat($"text", lit(" graft appended marker tokens")).as("text"), $"lang")
    d.select($"doc_id", $"text", $"lang").unionByName(exact).unionByName(near)
  }

  test("quality -> exact dedup -> near-dup collapse -> sample -> pack, deterministic") {
    val raw = corpus().cache()
    val n0 = raw.count()

    // 1. quality gate: token count and stopword-bearing English docs kept lax
    val scored = raw
      .withColumn("nt", G.tokenCount($"text"))
      .withColumn("q", G.qualityScore($"text", stop))
    val quality = scored.filter($"nt" >= 5).cache()
    val n1 = quality.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. exact dedup: keep cluster minimum
    val exactClusters = Graft.dedupExact(quality, $"doc_id", $"text")
    val dropExact = exactClusters
      .select(explode(split($"doc_ids", ",")).as("m"))
      .select($"m".cast("long").as("doc_id"))
      .join(exactClusters.select($"keep_id".as("doc_id")), Seq("doc_id"), "left_anti")
    val afterExact = quality.join(dropExact, Seq("doc_id"), "left_anti").cache()
    val n2 = afterExact.count()
    // every planted exact dup (or its source) collapsed: one survivor per pair
    assert(n1 - n2 == exactClusters.agg(sum($"n_docs" - 1)).head().getLong(0))

    // 3. near-dup pairs -> clusters -> keep cluster minimum
    val pairs = Graft.nearDupPairs(afterExact, $"doc_id", $"text", tau = 0.6)
    val clusters = Graft.nearDupClusters(pairs)
    val dropNear = clusters
      .select(explode(split($"doc_ids", ",")).as("m"))
      .select($"m".cast("long").as("doc_id"))
      .join(clusters.select($"cluster_id".as("doc_id")), Seq("doc_id"), "left_anti")
    val deduped = afterExact.join(dropNear, Seq("doc_id"), "left_anti").cache()
    val n3 = deduped.count()
    assert(n3 < n2, "near-dup collapse must remove the planted chain copies")
    // no surviving near-dup pair
    assert(Graft.nearDupPairs(deduped, $"doc_id", $"text", tau = 0.6).count() == 0)

    // 4. deterministic stratified downsample
    val sampled = Graft.stratifiedSample(deduped, $"doc_id", $"lang",
      Map("en" -> 50L, "de" -> 80L, "es" -> 80L, "fr" -> 80L, "zh" -> 80L)).cache()
    val n4 = sampled.count()
    assert(n4 < n3 && n4 > 0)

    // 5. pack into 2048-token sequences per lang (t05's shape)
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy($"lang").orderBy($"doc_id")
    val packed = sampled
      .withColumn("cum", sum($"nt").over(byDoc))
      .withColumn("seq_id", floor(($"cum" - $"nt") / 2048L))
    val seqs = packed.groupBy($"lang", $"seq_id")
      .agg(sum($"nt").as("seq_tokens"), count(lit(1)).as("n_docs"))
    // bins respect the budget up to one overflowing doc (greedy prefix rule)
    val over = seqs.join(
      packed.groupBy($"lang", $"seq_id").agg(max($"nt").as("max_nt")),
      Seq("lang", "seq_id"))
      .filter($"seq_tokens" - $"max_nt" >= 2048L)
    assert(over.count() == 0)

    // determinism: the whole pipeline reruns to the identical corpus
    val rerun = Graft.stratifiedSample(deduped, $"doc_id", $"lang",
      Map("en" -> 50L, "de" -> 80L, "es" -> 80L, "fr" -> 80L, "zh" -> 80L))
    assert(sampled.select("doc_id").as[Long].collect().sorted.toSeq ==
      rerun.select("doc_id").as[Long].collect().sorted.toSeq)

    assert(n0 > n1 || n1 > n2 || n2 > n3) // the funnel actually funnels
  }

  test("day-2 incremental drop: observe -> dedup vs corpus -> transactional commit") {
    import graft.ingest.DataMetrics
    import graft.store.TxStore
    val root = java.nio.file.Files.createTempDirectory("graft_day2")
      .resolve("corpus").toString
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    TxStore.init(d, root)
    val nCorpus = d.count()

    // the day-2 drop: exact re-deliveries under new ids + genuinely new
    // docs (token order reversed -> shingle sets disjoint from day 1)
    val redelivered = d.filter(pmod($"doc_id", lit(10)) === 0)
      .select(($"doc_id" + 90000).as("doc_id"), $"text")
    val fresh = d.filter(pmod($"doc_id", lit(10)) === 5)
      .select(($"doc_id" + 95000).as("doc_id"),
        concat_ws(" ", reverse(split($"text", "\\s+"))).as("text"))
    val nRedelivered = redelivered.count()
    val nFresh = fresh.count()

    // ingest metrics ride the dedup job — no extra pass over the drop
    val (batch, obs) = DataMetrics.observed(
      redelivered.unionByName(fresh), "drop_stats",
      Map("n_rows" -> count(lit(1)),
        "n_empty" -> sum(when(length(trim($"text")) === 0, 1L).otherwise(0L))))

    val dups = Graft.incrementalDedup(TxStore.read(spark, root), batch,
      $"doc_id", $"text", k = 3, tau = 0.6)
    val dupIds = dups.select($"id2".as("doc_id")).distinct()
    val clean = batch.join(dupIds, Seq("doc_id"), "left_anti")
    TxStore.commitUpsert(spark, root, clean, Seq("doc_id"))

    // every re-delivery caught, every fresh doc admitted
    assert(dupIds.as[Long].collect().toSet
      == redelivered.select($"doc_id").as[Long].collect().toSet)
    assert(TxStore.read(spark, root).count() == nCorpus + nFresh)
    assert(nRedelivered > 0 && nFresh > 0)
    // the drop's metrics resolved from the SAME jobs
    val m = obs.get
    assert(m("n_rows") == nRedelivered + nFresh && m("n_empty") == 0L)
    // and the commit log tells the day-2 story
    assert(TxStore.history(spark, root).select("action").as[String]
      .collect().toSeq == Seq("init", "upsert"))
  }
}
