package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from the driver's testdata by
  * stamping out N key-shifted replicas of each fact table (dimensions
  * stay single-copy, as in TPC-H) — the measurement substrate for the
  * two-point scale proof in SCALE.md. The point is to grow VOLUME ×N
  * while preserving each query's workload SHAPE, which needs more care
  * than a blind union:
  *
  *   - every long surrogate key is shifted by `replica × 10M`, with
  *     referencing columns shifted identically, so intra-replica joins
  *     stay consistent and cross-replica keys never collide;
  *   - dimension foreign keys (nation/region) are NOT shifted —
  *     broadcast dims keep their cardinality, exactly like TPC-H scale
  *     factors;
  *   - document text is passed through a per-replica substitution
  *     cipher (Latin letters rotated, CJK block shifted; length-
  *     preserving so `n_chars` stays true). Within a replica every
  *     pairwise similarity is EXACTLY preserved (the cipher is a
  *     bijection on shingles), so planted near-dup structure scales
  *     ×N; across replicas shingles are disjoint, so similarity-join
  *     workloads grow linearly instead of quadratically (a naive ×N
  *     copy would put N identical docs in every LSH bucket and blow
  *     pair counts up ×N² — measuring THAT would flag the workload,
  *     not the plan);
  *   - embeddings get a per-replica deterministic sign mask: within a
  *     replica cosine is exactly preserved (diag(±1) is orthogonal),
  *     across replicas a mixed mask drives expected cosine to ~0, for
  *     the same linear-not-quadratic reason.
  *
  * Replica 0 is byte-identical to the source, so every sf0.1 result is
  * a subset of the scaled corpus. Deterministic: no RNG anywhere.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir] [dstDir] [factor]
  * (defaults /root/testdata/sf0.1 -> target/testdata/sf1.0 ×10).
  */
object ScaleUp {

  private val KeyOff = 10000000L // > every key in the source tables

  /** Length-preserving per-replica substitution cipher: rotates a-z /
    * A-Z by r and the CJK unified block (U+4E00..U+9FFF) by r·1009;
    * everything else (digits, punctuation, whitespace, accents) is
    * untouched. r=0 is the identity.
    */
  private[graft] def cipher(s: String, r: Int): String = {
    if (s == null || r == 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val n: Char =
        if (c >= 'a' && c <= 'z') (((c - 'a') + r) % 26 + 'a').toChar
        else if (c >= 'A' && c <= 'Z') (((c - 'A') + r) % 26 + 'A').toChar
        else if (c >= 0x4E00 && c <= 0x9FFF)
          (0x4E00 + ((c - 0x4E00) + r * 1009) % 0x5200).toChar
        else c
      sb.append(n)
      i += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "target/testdata/sf1.0"
    val factor = if (args.length > 2) args(2).toInt else 10
    // reuse a live session when invoked through the CLI verb inside a
    // running application; only a session this main created is stopped
    val preexisting =
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = preexisting.getOrElse {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    val cipherUdf = udf((s: String, r: Int) => cipher(s, r))
    val reps = spark.range(factor).select(col("id").cast("int").as("__r"))

    /** N replicas with `keys` shifted per replica; `extra` runs with
      * `__r` still in scope for content perturbation.
      */
    def scale(table: String, keys: Seq[String],
        extra: DataFrame => DataFrame = identity): Unit = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val fanned = df.crossJoin(broadcast(reps))
      val shifted = keys.foldLeft(fanned) { (d, k) =>
        d.withColumn(k, col(k) + col("__r").cast("long") * lit(KeyOff))
      }
      extra(shifted).drop("__r")
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"scaled $table ×$factor")
    }

    def copy(table: String): Unit = {
      spark.read.parquet(s"$src/$table.parquet")
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"copied $table (dimension, single copy)")
    }

    copy("region"); copy("nation")
    scale("customer", Seq("c_custkey"))
    scale("supplier", Seq("s_suppkey"))
    scale("part", Seq("p_partkey"))
    scale("orders", Seq("o_orderkey", "o_custkey"))
    scale("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    scale("events", Seq("event_id", "user_id"))
    scale("documents", Seq("doc_id"),
      _.withColumn("text", cipherUdf(col("text"), col("__r"))))
    // sign mask: flip dim i of replica r iff (i+1)·(2r+1)·2654435761 ≡
    // 0..2 (mod 7) — a different ~3/7 subset per replica, identity for
    // r=0 by the explicit branch
    scale("embeddings", Seq("vec_id"),
      _.withColumn("embedding", expr(
        """transform(embedding, (x, i) ->
           CASE WHEN __r = 0 THEN x
                WHEN pmod((cast(i as bigint) + 1) * (2*__r + 1) * 2654435761, 7) < 3
                THEN CAST(-x AS FLOAT) ELSE x END)""")))

    // verification: row counts are exactly ×factor (dims ×1)
    Seq("region", "nation").foreach { t =>
      val (s, d) = (spark.read.parquet(s"$src/$t.parquet").count(),
        spark.read.parquet(s"$dst/$t.parquet").count())
      require(s == d, s"$t: $s != $d")
    }
    Seq("customer", "supplier", "part", "orders", "lineitem", "events",
      "documents", "embeddings").foreach { t =>
      val (s, d) = (spark.read.parquet(s"$src/$t.parquet").count(),
        spark.read.parquet(s"$dst/$t.parquet").count())
      require(s * factor == d, s"$t: $s×$factor != $d")
    }
    println(s"wrote $dst (×$factor of $src)")
    if (preexisting.isEmpty) spark.stop()
  }
}
