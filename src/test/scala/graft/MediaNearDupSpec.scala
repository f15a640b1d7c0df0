package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal}

/** The ScalaTest oracle behind m05 (media near-dup has no SQL oracle —
  * byte-level hash math): the banded hamming join over perceptual
  * fingerprints equals the brute-force threshold join, and planted
  * one-byte-perturbed copies always land within the exactness bound.
  */
class MediaNearDupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val phashes = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val off = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val planted = docs.filter(pmod(col("doc_id"), lit(17)) === 0)
      .select((col("doc_id") + off).as("doc_id"),
        concat(col("text"), lit(" ")).as("text"))
    (off, Multimodal.perceptualHash(
      Multimodal.asMedia(docs.unionByName(planted), "doc_id", "text"))
      .toDF().cache())
  }

  test("banded hamming join == brute force at the pigeonhole-exact bound") {
    val (_, ph) = phashes
    val banded = Dedup.hammingPairsFromSketch(ph, col("doc_id"), col("phash"),
        bands = 4, maxHamming = 3)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
    val a = ph.select(col("doc_id").as("id1"), col("phash").as("p1"))
    val b = ph.select(col("doc_id").as("id2"), col("phash").as("p2"))
    val brute = a.crossJoin(b).filter(col("id1") < col("id2"))
      .filter(bit_count(col("p1").bitwiseXOR(col("p2"))) <= 3)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
    assert(banded == brute)
    assert(banded.nonEmpty)
  }

  test("a one-byte append moves <= 2 gradient bits: every planted copy pairs up") {
    val (off, ph) = phashes
    val byId = ph.select(col("doc_id"), col("phash")).as[(Long, Long)]
      .collect().toMap
    val plantedIds = byId.keySet.filter(_ >= off)
    assert(plantedIds.nonEmpty)
    plantedIds.foreach { pid =>
      val d = java.lang.Long.bitCount(byId(pid) ^ byId(pid - off))
      assert(d <= 2, s"planted $pid drifted $d bits from ${pid - off}")
    }
  }
}
