package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Binary-payload chunking: the shard plan must be exactly invertible —
  * reassembling a document's chunks in index order reproduces the
  * original payload byte for byte, including multi-byte UTF-8 payloads
  * whose chunk boundaries fall INSIDE a code point (chunks are octet
  * ranges, not character ranges).
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("chunk -> reassemble is byte-identical, boundaries mid-code-point included") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.asMedia(docs, "doc_id", "text").toDF().cache()
    val zh = docs.filter($"lang" === "zh").count()
    assert(zh > 0, "corpus must include multi-byte UTF-8 docs for this test to bite")

    val chunks = Multimodal.chunkPayload(media, chunkBytes = 64).cache()
    // shard plan sanity: 1-based contiguous offsets...
    assert(chunks.filter($"offset" =!= $"chunk_idx".cast("long") * 64 + 1).count() == 0)
    // ...chunks jointly cover the payload exactly, and only the final
    // chunk may be short
    val cover = chunks.groupBy($"doc_id")
      .agg(sum($"n_bytes").as("covered"),
        sum(when($"n_bytes" < 64, 1).otherwise(0)).as("n_short"))
      .join(media.select($"doc_id", length($"payload").as("total")), Seq("doc_id"))
    assert(cover.filter($"covered" =!= $"total" || $"n_short" > 1).count() == 0)

    val rebuilt = Multimodal.reassemble(chunks)
    val diff = media.alias("a").join(rebuilt.alias("b"), Seq("doc_id", "format"))
      .filter(sha2(col("a.payload"), 256) =!= sha2(col("b.payload"), 256) ||
        length(col("a.payload")) =!= length(col("b.payload")))
      .count()
    assert(diff == 0, "reassembled payloads must be byte-identical")
    assert(rebuilt.count() == media.count())
  }

  test("media_dims parses real PNG/GIF/BMP headers; truncation and garbage are null") {
    def png(w: Int, h: Int): Array[Byte] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
        0, 0, 0, 13, 'I', 'H', 'D', 'R').map(_.toByte)
      val be = (v: Int) => Array((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)
      sig ++ be(w) ++ be(h)
    }
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes ++ Array((w & 0xff).toByte, (w >> 8).toByte,
        (h & 0xff).toByte, (h >> 8).toByte)
    def bmp(w: Int, h: Int): Array[Byte] = {
      val le = (v: Int) => Array(v.toByte, (v >> 8).toByte,
        (v >> 16).toByte, (v >> 24).toByte)
      "BM".getBytes ++ Array.fill(16)(0.toByte) ++ le(w) ++ le(-h) // top-down BMP: negative height
    }
    val rows = Seq(
      ("png", png(640, 480)), ("gif", gif(320, 200)), ("bmp", bmp(64, 32)),
      ("trunc", png(640, 480).take(20)), ("garbage", "not an image".getBytes),
      ("empty", Array.empty[Byte]))
    graft.functions.GraftFunctions.register(spark)
    val got = rows.toDF("kind", "payload")
      .selectExpr("kind", "media_dims(payload) AS dims")
      .as[(String, Option[String])].collect().toMap
    assert(got("png").contains("png:640x480"))
    assert(got("gif").contains("gif:320x200"))
    assert(got("bmp").contains("bmp:64x32")) // |height| for top-down files
    assert(got("trunc").isEmpty && got("garbage").isEmpty && got("empty").isEmpty)
  }
}
