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

  def qs: Seq[Q] = Seq(m01)
}
