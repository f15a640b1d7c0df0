package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-demonstrating query: a Spark implementation plus (when
  * exactly expressible) the equivalent DuckDB SQL oracle. Column names
  * and row ordering are deterministic and identical on both sides; all
  * float aggregates go through exact DECIMAL(18,4) sums and are cast to
  * DOUBLE at the end so the two engines produce bit-identical values
  * regardless of accumulation order.
  */
case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object QueryRegistry {
  def all: Seq[Q] =
    Relational.qs ++ Relational2.qs ++ Relational3.qs ++ Temporal.qs ++ AgFunctions.qs ++ Validation.qs ++ TextAnalysis.qs ++ TextAnalysis2.qs ++
      DedupOps.qs ++ VectorSearch.qs ++ StoreOps.qs ++ DimOps.qs ++
      MultimodalOps.qs ++ SkewOps.qs ++ Analytics.qs ++ SemiStructured.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}

/** Shared helpers for query definitions. */
object T {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.DecimalType

  /** Reads a driver table. `events.parquet` stores `ts` as parquet
    * TIMESTAMP(NANOS), which Spark 4 rejects outright
    * ([PARQUET_TYPE_ILLEGAL]); we read nanos as long via the legacy
    * conf and restore a microsecond timestamp (what DuckDB also sees —
    * its TIMESTAMP is µs), so oracle hashes line up.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") loadEventsRaw(spark, dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Events with `ts` still as raw nanosecond longs: predicates that
    * should reach the parquet scan (min/max pruning) must be applied on
    * this column BEFORE the timestamp conversion — a filter on the
    * derived `timestamp_micros(...)` expression cannot be pushed down.
    */
  def loadEventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  /** Epoch nanoseconds of a UTC date literal, for raw-ts pushdown. */
  def dateNanos(date: String): Long =
    java.time.LocalDate.parse(date).toEpochDay * 86400L * 1000000000L

  /** Exact decimal view of a double column (oracle-parity arithmetic). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** sum as exact decimal, surfaced as double — identical in any engine. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** average via exact decimal sum / count — engine-order independent. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(c)
}
