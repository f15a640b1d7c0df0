package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.T._
import graft.ops.Multimodal

/** Multimodal pipeline query: documents → binary payload + typed
  * metadata → partition-wise stub decode → features. The relational
  * plumbing (format routing, byte lengths, ok flags) is oracle-checked;
  * feature values are asserted in ScalaTest (not SQL-expressible).
  */
object MultimodalOps {

  val m01 = Q("m01_multimodal_features",
    (s, dir) => {
      val media = Multimodal.asMedia(load(s, dir, "documents"), "doc_id", "text")
      Multimodal.extractFeatures(media, dim = 8).toDF()
        .select(col("doc_id"), col("format"), col("n_bytes"), col("ok"),
          size(col("features")).as("n_features"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
        (['png','jpeg','wav'])[CAST(doc_id % 3 AS INT) + 1] AS format,
        CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        octet_length(encode(text)) > 0 AS ok,
        CAST(8 AS INT) AS n_features
      FROM documents ORDER BY doc_id"""))

  /** Frame sampling ([[graft.ops.Multimodal.sampleFrames]]): 256-byte
    * frames, every 4th decoded — one row per SAMPLED frame only. The
    * fan-out arithmetic (which frames, how many bytes each) is
    * oracle-checked; the stub decode's energy values are ScalaTest
    * territory (byte math isn't DuckDB-expressible).
    */
  val m02 = Q("m02_frame_sample",
    (s, dir) => {
      val media = Multimodal.asMedia(load(s, dir, "documents"), "doc_id", "text")
      Multimodal.sampleFrames(media, frameBytes = 256, stride = 4).toDF()
        .select(col("doc_id"), col("frame_idx"), col("n_bytes"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""
      SELECT doc_id, CAST(i AS INT) AS frame_idx,
        CAST(LEAST(256, octet_length(encode(text)) - i * 256) AS INT) AS n_bytes
      FROM documents,
        UNNEST(generate_series(0,
          CAST(CEIL(octet_length(encode(text)) / 256.0) AS BIGINT) - 1, 4)) t(i)
      ORDER BY doc_id, frame_idx"""))

  /** Modality inventory from METADATA only: per-format counts and byte
    * totals straight off the media table — the rollup a curation run
    * does before deciding what to decode. The payload column never
    * reaches the scan for queries like this (ReadSchema pruning proven
    * in StreamingSpec's media test); byte lengths here come through the
    * binary column to pin length(binary) = octet semantics against the
    * oracle.
    */
  val m03 = Q("m03_media_stats",
    (s, dir) => {
      val media = Multimodal.asMedia(load(s, dir, "documents"), "doc_id", "text")
      media.toDF()
        .groupBy(col("format"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("payload"))).cast("long").as("total_bytes"),
          max(length(col("payload"))).cast("long").as("max_bytes"))
        .orderBy(col("format"))
    },
    Some("""
      SELECT (['png','jpeg','wav'])[CAST(doc_id % 3 AS INT) + 1] AS format,
        COUNT(*) AS n,
        CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
      FROM documents GROUP BY 1 ORDER BY format"""))

  /** Contiguous payload chunking — the shard plan for parallel decode
    * of large media ([[graft.ops.Multimodal.chunkPayload]]: HOF
    * sequence→transform→binary substring, no mapPartitions). The
    * oracle checks the full shard plan arithmetic (index, 1-based byte
    * offset, short last chunk); chunk CONTENT is pinned by the
    * MultimodalSpec roundtrip — reassemble(chunk(x)) is byte-identical
    * to x, which is what makes chunked storage safe.
    */
  val m04 = Q("m04_payload_chunking",
    (s, dir) => {
      val media = Multimodal.asMedia(load(s, dir, "documents"), "doc_id", "text")
      Multimodal.chunkPayload(media.toDF(), chunkBytes = 512)
        .select(col("doc_id"), col("format"), col("chunk_idx"),
          col("offset").as("byte_offset"), col("n_bytes"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some("""
      SELECT doc_id,
        (['png','jpeg','wav'])[CAST(doc_id % 3 AS INT) + 1] AS format,
        CAST(i AS INT) AS chunk_idx,
        CAST(i * 512 + 1 AS BIGINT) AS byte_offset,
        CAST(LEAST(512, octet_length(encode(text)) - i * 512) AS INT) AS n_bytes
      FROM documents,
        UNNEST(generate_series(0,
          CAST(CEIL(octet_length(encode(text)) / 512.0) AS BIGINT) - 1)) t(i)
      ORDER BY doc_id, chunk_idx"""))

  /** Media near-duplicate pairs: perceptual dHash fingerprints
    * ([[graft.ops.Multimodal.perceptualHash]] — gradient bits over the
    * stub decoder's features, one 64-bit long per asset) through the
    * banded hamming self-join ([[graft.ops.Dedup
    * .hammingPairsFromSketch]], pigeonhole-EXACT at hamming ≤ 3 with
    * 4 bands). Every 17th document gets a planted one-byte-appended
    * copy (id = in-plan max+1 offset): a 1-byte edit moves ≤ 1 stub
    * feature ⇒ ≤ 2 gradient bits, so each copy MUST pair with its
    * original. Rows-only by design (byte-level hash math has no SQL
    * oracle); MediaNearDupSpec pins banded == brute-force hamming
    * equality and 100% planted recall. At 100 TB only (id, long)
    * pairs shuffle — payloads are read once and never again.
    */
  val m05 = Q("m05_media_neardup",
    (s, dir) => {
      val docs = load(s, dir, "documents").select(col("doc_id"), col("text"))
      val off = broadcast(docs.agg(
        (coalesce(max(col("doc_id")), lit(-1L)) + lit(1L)).as("_off")))
      val planted = docs.filter(pmod(col("doc_id"), lit(17)) === 0)
        .crossJoin(off)
        .select((col("doc_id") + col("_off")).as("doc_id"),
          concat(col("text"), lit(" ")).as("text"))
      val media = Multimodal.asMedia(docs.unionByName(planted), "doc_id", "text")
      val ph = Multimodal.perceptualHash(media).toDF()
      graft.ops.Dedup.hammingPairsFromSketch(ph, col("doc_id"), col("phash"),
          bands = 4, maxHamming = 3)
        .orderBy(col("id1"), col("id2"))
    },
    None)

  /** Binary header metadata extraction — REAL format parsing (PNG IHDR
    * big-endian, no codec library) as a codegen expression over raw
    * `binary` payloads. The query round-trips construct→parse: each
    * document gets a valid PNG header whose dimensions are doc_id
    * arithmetic (width/height packed big-endian via hex, the inverse
    * of what `media_dims` reads), and the oracle recomputes the same
    * dimensions from the arithmetic directly — parser ∘ constructor =
    * identity, per row, hash-checked. `n_unparsed = 0` asserts no
    * payload fell through to null. Real PNG/GIF/BMP bytes, truncation
    * and garbage are MultimodalSpec's cases.
    */
  val m06 = Q("m06_media_dims",
    (s, dir) => {
      val w = (lit(16) + pmod(col("doc_id"), lit(64))).cast("int")
      val h = (lit(16) + pmod(col("doc_id"), lit(48))).cast("int")
      val payload = concat(
        unhex(lit("89504E470D0A1A0A0000000D49484452")), // sig + IHDR
        unhex(lpad(hex(w), 8, "0")), unhex(lpad(hex(h), 8, "0")),
        encode(col("text"), "UTF-8"))
      load(s, dir, "documents")
        .select(col("lang"),
          graft.functions.GraftFunctions.mediaDims(payload).as("dims"))
        .select(col("lang"), col("dims"),
          regexp_extract(col("dims"), "png:(\\d+)x(\\d+)", 1)
            .cast("long").as("w"),
          regexp_extract(col("dims"), "png:(\\d+)x(\\d+)", 2)
            .cast("long").as("h"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("dims").isNull, 1L).otherwise(0L)).as("n_unparsed"),
          sum(col("w")).as("sum_w"), sum(col("h")).as("sum_h"),
          max(col("w")).as("max_w"))
        .orderBy(col("lang"))
    },
    Some("""
      SELECT lang, COUNT(*) AS n, CAST(0 AS BIGINT) AS n_unparsed,
        CAST(SUM(16 + doc_id % 64) AS BIGINT) AS sum_w,
        CAST(SUM(16 + doc_id % 48) AS BIGINT) AS sum_h,
        CAST(MAX(16 + doc_id % 64) AS BIGINT) AS max_w
      FROM documents GROUP BY lang ORDER BY lang"""))

  def qs: Seq[Q] = Seq(m01, m02, m03, m04, m05, m06)
}
