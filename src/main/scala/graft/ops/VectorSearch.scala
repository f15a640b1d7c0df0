package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => G}

/** Approximate-nearest-neighbor search over an embedding column.
  * Two paths:
  *  - brute-force: broadcast the (tiny) query set, score every row,
  *    TakeOrdered top-k — the exactness baseline, one scan, no shuffle
  *    beyond the top-k reduction;
  *  - LSH-bucketed: hyperplane sign buckets across several hash tables,
  *    candidates = rows sharing a (table, bucket) with the query, then
  *    exact cosine re-rank of candidates only. At 100 TB the bucket join
  *    touches ~n/2^nbits × tables rows instead of n.
  */
object VectorSearch {

  /** Exact top-k by cosine against a broadcast 1-row query. */
  def bruteForceTopK(vectors: DataFrame, query: DataFrame, vecCol: String,
      k: Int): DataFrame = {
    val q = query.select(col(vecCol).as("q_vec"))
    vectors.crossJoin(broadcast(q))
      .withColumn("sim", round(G.cosineSim(col(vecCol), col("q_vec")), 6))
      .drop("q_vec")
  }

  /** Candidate set via multi-table hyperplane LSH bucket equality with
    * the query row, then exact cosine re-rank. Returns all candidates
    * with their similarity; caller takes top-k.
    */
  def lshCandidates(vectors: DataFrame, query: DataFrame, vecCol: String,
      nbits: Int, tables: Int, baseSeed: Long = 42L): DataFrame = {
    def bucketed(df: DataFrame, vc: String): DataFrame = {
      val tableCols = (0 until tables).map { t =>
        struct(lit(t).as("tbl"),
          G.hyperplaneLsh(col(vc), nbits, baseSeed + t).as("bucket"))
      }
      df.withColumn("e", explode(array(tableCols: _*)))
        .withColumn("tbl", col("e.tbl"))
        .withColumn("bucket", col("e.bucket"))
        .drop("e")
    }
    val qb = broadcast(bucketed(query.select(col(vecCol).as("q_vec")), "q_vec")
      .select(col("tbl"), col("bucket"), col("q_vec")))
    bucketed(vectors, vecCol)
      .join(qb, Seq("tbl", "bucket"))
      .drop("tbl", "bucket")
      .withColumn("sim", round(G.cosineSim(col(vecCol), col("q_vec")), 6))
      .drop("q_vec")
  }

  /** Cosine near-duplicate pairs via LSH bucket self-join (multi-table,
    * bucketed — never all-pairs), verified with exact cosine.
    */
  def nearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      nbits: Int, tables: Int, minCos: Double, baseSeed: Long = 42L): DataFrame = {
    val tableCols = (0 until tables).map { t =>
      struct(lit(t).as("tbl"),
        G.hyperplaneLsh(col("v"), nbits, baseSeed + t).as("bucket"))
    }
    val base = vectors.select(col(idCol).as("id"), col(vecCol).as("v")).cache()
    val b = base.select(col("id"), explode(array(tableCols: _*)).as("e"))
      .select(col("id"), col("e.tbl"), col("e.bucket"))
    // pair dedup on ids only; vectors rejoin after the distinct so the
    // embedding arrays never ride the pair shuffle
    val candidates = b.select(col("tbl"), col("bucket"), col("id").as("id1"))
      .join(b.select(col("tbl"), col("bucket"), col("id").as("id2")),
        Seq("tbl", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
    candidates
      .join(base.select(col("id").as("id1"), col("v").as("v1")), Seq("id1"))
      .join(base.select(col("id").as("id2"), col("v").as("v2")), Seq("id2"))
      .withColumn("cos", round(G.cosineSim(col("v1"), col("v2")), 6))
      .filter(col("cos") >= minCos)
      .select(col("id1"), col("id2"), col("cos"))
  }
}
