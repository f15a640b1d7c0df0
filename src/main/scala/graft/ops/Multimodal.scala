package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, processed partition-wise in batches (the
  * Scala analogue of a `mapInPandas` decode stage). The actual media
  * decode is STUBBED — this container has no image/audio codecs — with
  * a deterministic byte-level feature extractor; everything around it
  * (schema, batch iteration, partitioning, output shape) is the real
  * 100 TB pipeline: no driver collects, features computed
  * streaming-per-partition.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, format: String, payload: Array[Byte])
  case class FeatureRow(doc_id: Long, format: String, n_bytes: Int,
      ok: Boolean, features: Array[Float])

  /** Attach payload + metadata columns to a text table (test stand-in
    * for reading real media files: payload = utf-8 bytes).
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    df.select(col(idCol).as("doc_id"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          pmod(col(idCol), lit(3)).cast("int") + 1).as("format"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  case class FrameRow(doc_id: Long, frame_idx: Int, n_bytes: Int,
      energy: Float)

  /** Frame sampling — the video shape: the payload is treated as a
    * sequence of fixed-size frames, every `stride`-th frame is
    * decoded (stub: byte-energy), the rest are never touched. One
    * input row fans out to its sampled frames only, so downstream
    * work scales with the SAMPLED fraction — the property that makes
    * frame-level feature extraction tractable on petabyte video sets.
    * Partition-wise, no driver involvement, deterministic.
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 256,
      stride: Int = 4): Dataset[FrameRow] = {
    implicit val enc = Encoders.product[FrameRow]
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { fi =>
          val from = fi * frameBytes
          val until = math.min(from + frameBytes, bytes.length)
          var e = 0.0f
          var i = from
          while (i < until) { e += (bytes(i) & 0xff).toFloat / 255.0f; i += 1 }
          FrameRow(r.doc_id, fi, until - from, e)
        }
      }
    }
  }

  /** STUB decode: a real implementation would decode the payload with a
    * codec here (per batch, per partition). The stub derives `dim`
    * deterministic float features from payload bytes (chunked byte
    * sums), preserving the exact execution shape of the real thing.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[FeatureRow] = {
    implicit val enc = Encoders.product[FeatureRow]
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.payload
        val ok = bytes != null && bytes.nonEmpty
        val f = new Array[Float](dim)
        if (ok) {
          var i = 0
          while (i < bytes.length) {
            f(i % dim) += (bytes(i) & 0xff).toFloat / 255.0f
            i += 1
          }
        }
        FeatureRow(r.doc_id, r.format, if (ok) bytes.length else 0, ok, f)
      }
    }
  }

  case class PhashRow(doc_id: Long, format: String, phash: Long)

  /** Perceptual fingerprint of a media payload — the dHash gradient
    * scheme (bit i = feature(i) > feature(i+1)) over the stub
    * decoder's 65 chunked-byte-sum features, packed into one 64-bit
    * long. A real deployment swaps the stub features for decoded
    * pixel/spectrogram intensities and keeps EVERYTHING downstream:
    * the fingerprint is one long per asset, so media near-dup becomes
    * [[Dedup.hammingPairsFromSketch]]'s banded join — bits, not
    * payloads, ride the shuffle. Gradient hashing is what makes small
    * payload edits small hamming moves: a k-byte append touches ≤ k
    * feature buckets ⇒ ≤ 2k bits.
    */
  def perceptualHash(media: Dataset[MediaRow]): Dataset[PhashRow] = {
    implicit val enc = Encoders.product[PhashRow]
    extractFeatures(media, dim = 65).map { r =>
      var h = 0L
      var i = 0
      while (i < 64) {
        if (r.features(i) > r.features(i + 1)) h |= (1L << i)
        i += 1
      }
      PhashRow(r.doc_id, r.format, h)
    }
  }

  /** Contiguous fixed-size chunking of the binary payload — the shard
    * plan for parallel decode of LARGE media (one blob too big for one
    * task → its chunks decode on many): pure column HOFs (sequence →
    * transform → binary substring), no mapPartitions, so the fan-out
    * stays inside whole-stage codegen. 1-based chunk offsets; the last
    * chunk is short. [[reassemble]] inverts it exactly (spec-proven
    * byte-identity), which is what makes chunked storage safe.
    */
  def chunkPayload(media: DataFrame, chunkBytes: Int): DataFrame =
    media.select(col("doc_id"), col("format"),
        // empty-payload guard: sequence(0, -1) would yield a DESCENDING
        // [0, -1], not an empty list — same trap as the gram builders
        posexplode(when(length(col("payload")) === 0, array().cast("array<binary>"))
          .otherwise(expr(
            s"""transform(
                  sequence(0, cast(ceil(length(payload) / ${chunkBytes}.0d) as int) - 1),
                  i -> substring(payload, i * $chunkBytes + 1, $chunkBytes))""")))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("format"), col("chunk_idx").cast("int").as("chunk_idx"),
        (col("chunk_idx").cast("long") * chunkBytes + 1).as("offset"),
        length(col("chunk")).cast("int").as("n_bytes"), col("chunk"))

  /** Inverse of [[chunkPayload]]: order each document's chunks by index
    * and concatenate — one aggregation, array_sort on (idx, chunk)
    * structs so the rebuild is deterministic regardless of partitioning.
    */
  def reassemble(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("doc_id"), col("format"))
      .agg(aggregate(
        expr("array_sort(collect_list(struct(chunk_idx, chunk)))"),
        lit(Array.empty[Byte]),
        (acc, x) => concat(acc, x.getField("chunk"))).as("payload"))
}
