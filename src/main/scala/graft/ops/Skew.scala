package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys. Spark's AQE splits skewed SHUFFLE
  * partitions on its own; these helpers cover the cases AQE can't:
  * a single key too hot for one task in a two-sided join, and
  * high-cardinality-payload aggregations.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) computes partial
    * aggregates across `saltBuckets` tasks, then the tiny per-key
    * merge. Same result as a direct groupBy-sum for any distributive
    * aggregate; the hot key's work spreads over `saltBuckets` tasks.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val kc = keys.map(col)
    df.withColumn("__salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(kc :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(kc: _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted broadcast-replicated join for one known-hot build side: the
    * small side is replicated `saltBuckets` times with an explicit salt
    * column, the big side salts deterministically, and the join key
    * becomes (key, salt) — the hot key's rows land in `saltBuckets`
    * different tasks instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    val replicated = small.crossJoin(
      broadcast(spark(small).range(saltBuckets).select(col("id").as("__salt"))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  private def spark(df: DataFrame) = df.sparkSession
}
