package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Frequency, VectorSearch => V}
import graft.store.{Store, TxStore}

/** Degenerate inputs for the late-round operators: empty frames, k
  * larger than the data, batches with nothing to match — the shapes a
  * scheduled pipeline hits on a quiet day and must pass through
  * silently, not crash on.
  */
class EdgeCasesSpec extends SparkSuite {
  import spark.implicits._

  test("heavy hitters: empty input and k beyond the distinct count") {
    val empty = spark.emptyDataset[String].toDF("token")
    assert(Frequency.heavyHitters(empty, "token", 9).count() == 0)
    // 3 distinct values, k = 1000: thresholds degenerate but stay exact
    val tiny = Seq("a", "a", "a", "b", "c").toDF("token")
    val got = Frequency.heavyHitters(tiny, "token", 999)
      .as[(String, Long)].collect().toMap
    // every value with freq*1000 > 5 qualifies — i.e. all of them
    assert(got == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    assert(Frequency.mgCandidates(tiny, "token", 1).count() <= tiny.rdd.getNumPartitions)
  }

  test("batchTopK: k beyond group size, and empty scored input") {
    val scored = Seq((1L, 10L, 0.5), (1L, 11L, 0.4)).toDF("qid", "id", "sim")
    assert(V.batchTopK(scored, "qid", "id", "sim", 100).count() == 2)
    val empty = spark.emptyDataset[(Long, Long, Double)]
      .toDF("qid", "id", "sim")
    assert(V.batchTopK(empty, "qid", "id", "sim", 5).count() == 0)
  }

  test("incremental dedup: empty batch, batch with nothing in common") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val empty = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.ngramJaccardJoin(corpus, empty, $"doc_id", $"text").count() == 0)
    val disjoint = Seq((9L, "one two three four five six")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardJoin(corpus, disjoint, $"doc_id", $"text").count() == 0)
  }

  test("SCD2 merge with an empty change batch leaves the dim untouched") {
    val dim = Seq((1L, 10.0)).toDF("k", "bal")
      .withColumn("valid_from", to_date(lit("2020-01-01")))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    val changes = spark.emptyDataset[(Long, Double)].toDF("k", "bal")
      .withColumn("change_date", to_date(lit("2021-01-01")))
    val out = Store.scd2Merge(dim, changes, Seq("k"), Seq("bal"))
    assert(out.collect().toSet == dim.collect().toSet)
  }

  test("retention beyond history and empty-history paths are no-ops") {
    val root = java.nio.file.Files.createTempDirectory("graft_edge")
      .resolve("t").toString
    assert(TxStore.expireVersions(root, 3).isEmpty) // uninitialized table
    TxStore.init(Seq((1L, 1.0)).toDF("k", "v"), root)
    assert(TxStore.expireVersions(root, 10).isEmpty) // nothing old enough
    assert(TxStore.read(spark, root).count() == 1)
  }
}
