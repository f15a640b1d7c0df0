package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed EXACT heavy hitters without a full-cardinality shuffle.
  *
  * The naive plan — `groupBy(key).count.filter(freq > N/s)` — shuffles
  * one row per DISTINCT key; over corpus tokens at 100 TB that is
  * billions of shuffle rows to find a few hundred survivors. Instead:
  *
  *  1. each partition runs a Misra-Gries summary with k counters
  *     (Misra & Gries 1982). A partition of Np items under-counts any
  *     item by at most Np/(k+1), and the union of per-partition
  *     summaries inherits the bound additively (the mergeable-summaries
  *     property, Agarwal et al., PODS 2012) — so every item with GLOBAL
  *     frequency > N/(k+1) survives in at least one partition summary;
  *  2. the ≤ k·numPartitions surviving candidates are recounted
  *     exactly — a broadcast semi-join keeps the second scan's shuffle
  *     to candidate rows only — and thresholded at freq·(k+1) > N.
  *
  * The sketch therefore only bounds the SHUFFLE; the output is exact
  * (a DuckDB `HAVING COUNT(*)*(k+1) > total` oracle hash-matches it).
  * Threshold arithmetic stays in integers — no float comparison can
  * disagree between engines.
  *
  * Reference scope note: agrobr's frequency analysis is pandas
  * `value_counts` on a single node; this is its scale path.
  */
object Frequency {

  /** Per-partition Misra-Gries survivors for a single string column —
    * at most k rows per partition. mapPartitions is warranted here:
    * the decrement-all step is genuinely imperative per-partition
    * state (amortized O(1)/item — every decrement cancels a prior
    * increment).
    */
  def mgCandidates(items: DataFrame, c: String, k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val ds: Dataset[String] = items.select(col(c).cast("string")).as[String]
    ds.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        counters.get(x) match {
          case Some(n) => counters(x) = n + 1
          case None if counters.size < k => counters(x) = 1L
          case None =>
            val dead = List.newBuilder[String]
            counters.mapValuesInPlace((_, n) => n - 1)
            counters.foreach { case (key, n) => if (n == 0) dead += key }
            dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF(c)
  }

  /** All items with frequency strictly above total/(k+1), with their
    * EXACT counts: MG candidate pass + broadcast-semi-join recount.
    */
  def heavyHitters(items: DataFrame, c: String, k: Int): DataFrame = {
    val candidates = mgCandidates(items, c, k).distinct()
    val counts = items.join(broadcast(candidates), Seq(c), "left_semi")
      .groupBy(col(c)).agg(count(lit(1)).as("freq"))
    val total = items.agg(count(lit(1)).as("_total"))
    counts.crossJoin(broadcast(total))
      .filter(col("freq") * lit(k + 1L) > col("_total"))
      .select(col(c), col("freq"))
  }
}
